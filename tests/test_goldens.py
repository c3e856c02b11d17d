"""Golden-pinning harness (irfinder_tpu/goldens.py): localization of a table
mismatch to (line, column, suspect constants)."""

import os

from irfinder_tpu.goldens import check, compare_table


def _write(p, text):
    with open(p, "w") as fh:
        fh.write(text)


HDR = "Chr\tStart\tEnd\tName\tNull\tStrand\tCoverage\tIntronDepth\tIRratio\tWarnings\n"


def test_match(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    _write(a / "IRFinder-IR-nondir.txt", HDR + "chr1\t1\t2\tg\t0\t+\t0.5\t3\t0.1\t-\n")
    _write(b / "IRFinder-IR-nondir.txt", HDR + "chr1\t1\t2\tg\t0\t+\t0.5\t3\t0.1\t-\n")
    assert check(str(a), str(b)) == 0


def test_mismatch_localized(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    _write(a / "IRFinder-IR-nondir.txt", HDR + "chr1\t1\t2\tg\t0\t+\t0.5\t3\t0.1\t-\n")
    _write(b / "IRFinder-IR-nondir.txt", HDR + "chr1\t1\t2\tg\t0\t+\t0.7\t3\t0.1\t-\n")
    r = compare_table(
        str(a / "IRFinder-IR-nondir.txt"), str(b / "IRFinder-IR-nondir.txt")
    )
    assert not r["match"]
    assert r["line"] == 2 and r["column"] == "Coverage"
    assert "ANTI_NEAR_DIST" in r["suspect_constants"]
    assert check(str(a), str(b)) == 1


def test_row_count_divergence(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    _write(a / "IRFinder-IR-nondir.txt", HDR)
    _write(b / "IRFinder-IR-nondir.txt", HDR + "chr1\t1\t2\tg\t0\t+\t0.5\t3\t0.1\t-\n")
    r = compare_table(
        str(a / "IRFinder-IR-nondir.txt"), str(b / "IRFinder-IR-nondir.txt")
    )
    assert r["column"] == "(row count)"
