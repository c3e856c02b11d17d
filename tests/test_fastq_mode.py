"""FastQ mode: trim -> external aligner pipe -> counting engine.

The aligner is external (the reference piped trim | STAR | irfinder); here a
fake aligner script stands in for STAR and cats a premade unsorted BAM to
stdout, verifying the pipe wiring, the {r1}/{r2} template expansion, and that
counting off the aligner's stdout matches counting the same BAM from disk.
"""

import os
import stat
import sys

import numpy as np

from irfinder_tpu.cli import main
from irfinder_tpu.refio.compile import compile_reference

from test_oracle import CHROMS, ROIS, random_bam_bytes, toy_exons

TABLES = [
    "IRFinder-IR-nondir.txt",
    "IRFinder-IR-dir.txt",
    "IRFinder-JuncCount.txt",
    "IRFinder-SpansPoint.txt",
    "IRFinder-ROI.txt",
    "IRFinder-ChrCoverage.txt",
]


def _write_fastq(path, n=5):
    with open(path, "w") as fh:
        for i in range(n):
            fh.write(f"@r{i}\nACGTACGTAC\n+\nIIIIIIIIII\n")


def test_fastq_mode_matches_bam_mode(tmp_path):
    ref = compile_reference(toy_exons(), chrom_order=CHROMS, rois=ROIS)
    refdir = tmp_path / "REF"
    ref.save(str(refdir))

    bam = tmp_path / "aligned.bam"
    bam.write_bytes(random_bam_bytes(seed=17, n_frags=120))
    r1, r2 = tmp_path / "r_1.fq", tmp_path / "r_2.fq"
    _write_fastq(r1)
    _write_fastq(r2)

    # fake aligner: ignores the FASTQs but records them, cats the BAM
    fake = tmp_path / "fake_aligner.sh"
    fake.write_text(
        f"#!/bin/sh\necho \"$1 $2\" > {tmp_path}/aligner_args\ncat {bam}\n"
    )
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)

    out_fq = tmp_path / "out_fq"
    rc = main(
        [
            "FastQ", "-r", str(refdir), "-d", str(out_fq),
            str(r1), str(r2),
            "--aligner-cmd", f"{fake} {{r1}} {{r2}}",
        ]
    )
    assert rc == 0
    got_args = (tmp_path / "aligner_args").read_text().split()
    assert got_args == [str(r1), str(r2)]

    out_bam = tmp_path / "out_bam"
    rc = main(["BAM", "-r", str(refdir), "-d", str(out_bam), str(bam)])
    assert rc == 0

    for t in TABLES:
        a = (out_fq / t).read_text()
        b = (out_bam / t).read_text()
        assert a == b, f"{t} differs between FastQ and BAM modes"


def test_fastq_mode_requires_aligner_cmd(tmp_path, capsys):
    ref = compile_reference(toy_exons(), chrom_order=CHROMS, rois=ROIS)
    refdir = tmp_path / "REF"
    ref.save(str(refdir))
    r1 = tmp_path / "r.fq"
    _write_fastq(r1)
    rc = main(["FastQ", "-r", str(refdir), "-d", str(tmp_path / "o"), str(r1)])
    assert rc == 2


def test_fastq_mode_trim_filter(tmp_path):
    """--trim runs the native filter; trimmed files feed the aligner."""
    import shutil

    if shutil.which("g++") is None:
        import pytest

        pytest.skip("no toolchain")
    ref = compile_reference(toy_exons(), chrom_order=CHROMS, rois=ROIS)
    refdir = tmp_path / "REF"
    ref.save(str(refdir))
    bam = tmp_path / "aligned.bam"
    bam.write_bytes(random_bam_bytes(seed=19, n_frags=40))
    r1, r2 = tmp_path / "t_1.fq", tmp_path / "t_2.fq"
    # one read carries a full R1 adapter suffix: must be clipped in trimmed_1
    from irfinder_tpu.native.trim_native import ADAPTER_R1

    with open(r1, "w") as fh:
        seq = "ACGTACGTAC" + ADAPTER_R1.decode()
        fh.write(f"@a0\n{seq}\n+\n{'I' * len(seq)}\n")
    with open(r2, "w") as fh:
        fh.write(f"@a0\nTTTTGGGGCC\n+\nIIIIIIIIII\n")

    fake = tmp_path / "fake_aligner.sh"
    fake.write_text(f"#!/bin/sh\necho \"$1 $2\" > {tmp_path}/args2\ncat {bam}\n")
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    out = tmp_path / "o2"
    rc = main(
        [
            "FastQ", "-r", str(refdir), "-d", str(out),
            str(r1), str(r2), "--trim",
            "--aligner-cmd", f"{fake} {{r1}} {{r2}}",
        ]
    )
    assert rc == 0
    args2 = (tmp_path / "args2").read_text().split()
    assert args2 == [str(out / "trimmed_1.fastq"), str(out / "trimmed_2.fastq")]
    trimmed = (out / "trimmed_1.fastq").read_text().splitlines()[1]
    assert trimmed == "ACGTACGTAC", "adapter suffix not clipped"


def test_fastq_stream_keep_bam_tee(tmp_path):
    """--stream --keep-bam tees the live aligner pipe into Unsorted.bam while
    counting off it; the spooled BAM is byte-identical to the aligner output."""
    ref = compile_reference(toy_exons(), chrom_order=CHROMS, rois=ROIS)
    refdir = tmp_path / "REF"
    ref.save(str(refdir))
    bam = tmp_path / "aligned.bam"
    bam.write_bytes(random_bam_bytes(seed=23, n_frags=150))
    r1 = tmp_path / "r_1.fq"
    _write_fastq(r1)
    fake = tmp_path / "fake_aligner.sh"
    fake.write_text(f"#!/bin/sh\ncat {bam}\n")
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)

    out = tmp_path / "out_stream"
    rc = main(
        [
            "FastQ", "-r", str(refdir), "-d", str(out), str(r1),
            "--aligner-cmd", f"{fake} {{r1}}", "--stream", "--keep-bam",
        ]
    )
    assert rc == 0
    spooled = out / "Unsorted.bam"
    assert spooled.exists()
    assert spooled.read_bytes() == bam.read_bytes()
    assert (out / "IRFinder-IR-nondir.txt").exists()
