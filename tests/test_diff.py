"""Differential-IR path: Audic-Claverie math + pooled replicate analysis +
CLI smoke (SURVEY.md §2 rows 18-19, §3.5)."""

import io
import math

import numpy as np
import pytest

from irfinder_tpu.diff import differential_rows, read_ir_table, run_differential
from irfinder_tpu.winflat import ac_pvalue, log_p_y_given_x, tail_p


def test_ac_distribution_sums_to_one():
    for x in (0, 3, 17):
        for r in (1.0, 0.5, 2.0):
            tot = sum(math.exp(log_p_y_given_x(x, y, r)) for y in range(400))
            assert abs(tot - 1.0) < 1e-9, (x, r)


def test_ac_symmetry_and_tails():
    # equal counts, equal libraries -> p-value 1-ish (no signal)
    assert ac_pvalue(10, 10) > 0.5
    # strongly different counts -> small p
    assert ac_pvalue(50, 0) < 1e-9
    p_le, p_ge = tail_p(5, 2)
    assert 0 < p_le < 1 and 0 < p_ge < 1
    # cumulative consistency: p_le + p_ge = 1 + point mass
    point = math.exp(log_p_y_given_x(5, 2, 1.0))
    assert abs((p_le + p_ge) - (1.0 + point)) < 1e-12


def _write_table(path, rows):
    """rows: (chrom, start, end, name, strand, depth, sl, sr, ratio)"""
    cols = (
        "Chr\tStart\tEnd\tName\tNull\tStrand\tCoverage\tIntronDepth\t"
        "IntronDepth25thPercentile\tIntronDepth50thPercentile\t"
        "IntronDepth75thPercentile\tExonToIntronReadsLeft\t"
        "ExonToIntronReadsRight\tIntronDepthFirst50bp\tIntronDepthLast50bp\t"
        "SpliceLeft\tSpliceRight\tSpliceExact\tIRratio\tWarnings\n"
    )
    with open(path, "w") as fh:
        fh.write(cols)
        for (c, s, e, nm, st, d, sl, sr, r) in rows:
            fh.write(
                f"{c}\t{s}\t{e}\t{nm}\t0\t{st}\t0.5\t{d}\t0\t0\t0\t0\t0\t0\t0\t"
                f"{sl}\t{sr}\t{min(sl,sr)}\t{r}\t-\n"
            )


def test_differential_end_to_end(tmp_path):
    # condition A: retained intron (depth 20, splice 5); B: spliced (2, 40)
    for i, d in enumerate(["a1", "a2"]):
        p = tmp_path / d
        p.mkdir()
        _write_table(
            p / "IRFinder-IR-nondir.txt",
            [
                ("chr1", 100, 500, "G/g/clean", "+", 20 + i, 5, 4, 0.8),
                ("chr1", 900, 1300, "H/h/clean", "+", 1, 50, 50, 0.02),
            ],
        )
    for i, d in enumerate(["b1", "b2"]):
        p = tmp_path / d
        p.mkdir()
        _write_table(
            p / "IRFinder-IR-nondir.txt",
            [
                ("chr1", 100, 500, "G/g/clean", "+", 2, 40 + i, 39, 0.05),
                ("chr1", 900, 1300, "H/h/clean", "+", 1, 50, 50, 0.02),
            ],
        )
    out = tmp_path / "diff.txt"
    rc = run_differential(
        [str(tmp_path / "a1"), str(tmp_path / "a2")],
        [str(tmp_path / "b1"), str(tmp_path / "b2")],
        str(out),
    )
    assert rc == 0
    lines = out.read_text().splitlines()
    assert lines[0].startswith("Chr\tStart")
    body = {l.split("\t")[3]: l.split("\t") for l in lines[1:]}
    # the changed intron has a small p and consistent direction
    g = body["G/g/clean"]
    assert float(g[12]) < 0.01
    assert g[13] == "consistent"
    # the unchanged intron is not significant
    h = body["H/h/clean"]
    assert float(h[12]) > 0.1


def test_cli_diff_and_buildref(tmp_path):
    from irfinder_tpu.cli import main

    gtf = tmp_path / "toy.gtf"
    gtf.write_text(
        'chr1\tx\texon\t101\t200\t.\t+\t.\tgene_id "g"; transcript_id "t";\n'
        'chr1\tx\texon\t501\t600\t.\t+\t.\tgene_id "g"; transcript_id "t";\n'
    )
    refdir = tmp_path / "ref"
    assert main(["BuildRef", "-g", str(gtf), "-r", str(refdir)]) == 0
    from irfinder_tpu.refio.compile import CompiledRef

    ref = CompiledRef.load(str(refdir))
    assert ref.n_introns == 1
    assert ref.intron_start[0] == 200 and ref.intron_end[0] == 500


def test_native_winflat_matches_python():
    import numpy as np

    wn = pytest.importorskip("irfinder_tpu.native.winflat_native")
    try:
        wn.load_library()
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")
    rng = np.random.default_rng(0)
    xs = rng.integers(0, 200, 50)
    ys = rng.integers(0, 200, 50)
    nxs = rng.uniform(1, 400, 50)
    nys = rng.uniform(1, 400, 50)
    got = wn.pvalues(xs, ys, nxs, nys)
    want = [ac_pvalue(int(x), int(y), nx, ny) for x, y, nx, ny in zip(xs, ys, nxs, nys)]
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
