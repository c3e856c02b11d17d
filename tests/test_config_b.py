"""Config B end-to-end: a strand-specific realistic library must trip the
directionality detector, gate the dir table on the called polarity, and a
flipped library must be detected with the opposite polarity (SURVEY.md §2
row 15)."""

import json
import os

import pytest

from irfinder_tpu.engine import run_bam
from irfinder_tpu.io.bamgen import write_realistic_bam
from irfinder_tpu.synth import synth_ref


@pytest.fixture(scope="module")
def ref():
    return synth_ref(n_genes=80)


def test_stranded_library_detected(ref, tmp_path):
    bam = str(tmp_path / "stranded.bam")
    write_realistic_bam(bam, ref, n_pairs=20_000, seed=2, stranded=True)
    out = str(tmp_path / "out")
    m = run_bam(ref, bam, out)
    assert m.is_stranded, "strand-specific library not detected"
    assert m.dir_informative >= 1000
    assert m.dir_concordance > 0.85
    meta = json.load(open(os.path.join(out, "metrics.json")))
    assert meta["is_stranded"] is True
    # both tables cover every intron; the dir table uses strand-split depth
    nd = open(os.path.join(out, "IRFinder-IR-nondir.txt")).read().splitlines()
    dr = open(os.path.join(out, "IRFinder-IR-dir.txt")).read().splitlines()
    assert len(nd) == len(dr)


def test_unstranded_library_not_detected(ref, tmp_path):
    bam = str(tmp_path / "unstranded.bam")
    write_realistic_bam(bam, ref, n_pairs=20_000, seed=2, stranded=False)
    out = str(tmp_path / "out")
    m = run_bam(ref, bam, out)
    assert not m.is_stranded
    assert m.dir_concordance < 0.85
