"""Mappability exclusion generation (refio/mapgen.py; SURVEY.md §2 row 4):
tile generation, and collection of exclusion zones from a simulated aligner
run where reads from a repeat region fail unique mapping."""

import io

import numpy as np
import pytest

from irfinder_tpu.io import bamwrite
from irfinder_tpu.refio.mapgen import (
    collect_exclusions,
    iter_tiles,
    read_fasta,
    write_tile_fastq,
)

READ_LEN, STRIDE = 20, 5


def _genome():
    rng = np.random.default_rng(0)
    uniq = bytes(rng.choice(list(b"ACGT"), 300))
    # repeat region: unmappable; N island: never tiled
    return {"chrA": uniq[:100] + b"AC" * 50 + uniq[100:200] + b"N" * 30 + uniq[200:]}


def test_fasta_roundtrip(tmp_path):
    g = _genome()
    p = tmp_path / "g.fa"
    with open(p, "w") as fh:
        fh.write(">chrA desc here\n")
        s = g["chrA"].decode()
        for i in range(0, len(s), 60):
            fh.write(s[i : i + 60] + "\n")
    back = read_fasta(str(p))
    assert back == g


def test_tiles_skip_n(tmp_path):
    g = _genome()
    tiles = list(iter_tiles(g, READ_LEN, STRIDE))
    assert all(b"N" not in t for _, _, t in tiles)
    assert all(p % STRIDE == 0 for _, p, _ in tiles)
    out = io.BytesIO()
    n = write_tile_fastq(g, out, READ_LEN, STRIDE)
    assert n == len(tiles)
    lines = out.getvalue().split(b"\n")
    assert lines[0].startswith(b"@mapgen|chrA|")


def test_collect_marks_repeat_and_n(tmp_path):
    g = _genome()
    ln = len(g["chrA"])
    repeat_lo, repeat_hi = 100, 200  # the AC*50 region
    n_lo, n_hi = 300, 330

    # simulated aligner: every tile read outside the repeat maps back
    # uniquely to its origin; repeat tiles map with MAPQ 0 (dropped by the
    # decoder's admission rule)
    records = []
    for i, (c, pos, _t) in enumerate(iter_tiles(g, READ_LEN, STRIDE)):
        in_repeat = pos + READ_LEN > repeat_lo and pos < repeat_hi
        mapq = 0 if in_repeat else 60
        records.append(
            bamwrite.make_single(f"t{i}", 0, pos, f"{READ_LEN}M", mapq=mapq)
        )
    buf = io.BytesIO()
    bamwrite.write_bam(buf, ["chrA"], [ln], records)
    buf.seek(0)

    rows = collect_exclusions(buf, {"chrA": ln}, READ_LEN, STRIDE)
    # exclusions must cover the full repeat region and the N island
    def covered(lo, hi):
        return any(c == "chrA" and s <= lo and hi <= e for c, s, e in rows)

    assert covered(repeat_lo, repeat_hi)
    assert covered(n_lo, n_hi)
    # and must NOT cover clean unique interior points (all tiles spanning
    # position 40 lie fully outside the repeat, so 40 stays mappable)
    assert not any(s <= 40 < e for _, s, e in rows)
