"""ExportGLM (SURVEY.md §2 row 20): the DESeq2 count-matrix exporter is
executable code, round-trips against the IR tables, plus the Unsorted.bam
pass-through and BuildRefDownload --manifest validation surfaces."""

import json
import os
import subprocess
import sys

import pytest

from irfinder_tpu.cli import main as cli_main
from irfinder_tpu.engine import run_bam
from irfinder_tpu.io.bamgen import write_realistic_bam
from irfinder_tpu.synth import synth_ref


@pytest.fixture(scope="module")
def samples(tmp_path_factory):
    root = tmp_path_factory.mktemp("glm")
    ref = synth_ref(n_genes=40)
    dirs = []
    for i in range(3):
        bam = str(root / f"s{i}.bam")
        write_realistic_bam(bam, ref, n_pairs=3_000, seed=100 + i)
        out = str(root / f"sample{i}")
        run_bam(ref, bam, out)
        dirs.append(out)
    return ref, str(root), dirs


def test_export_glm_roundtrip(samples):
    from irfinder_tpu.glm import export_glm, read_ir_table

    _, root, dirs = samples
    counts, coldata = export_glm(
        dirs, os.path.join(root, "glm"), conditions=["A", "A", "B"]
    )
    with open(counts) as fh:
        header = fh.readline().rstrip("\n").split("\t")
        rows = [ln.rstrip("\n").split("\t") for ln in fh]
    assert header == [
        "intron",
        "sample0.IR", "sample1.IR", "sample2.IR",
        "sample0.Splice", "sample1.Splice", "sample2.Splice",
    ]
    # round-trip: every column must equal the source IR table
    for j, d in enumerate(dirs):
        ids, intronic, spliced = read_ir_table(
            os.path.join(d, "IRFinder-IR-nondir.txt")
        )
        assert len(rows) == len(ids)
        assert [r[0] for r in rows] == ids
        assert [int(r[1 + j]) for r in rows] == intronic
        assert [int(r[4 + j]) for r in rows] == spliced

    with open(coldata) as fh:
        lines = fh.read().splitlines()
    assert lines[0] == "column\tsample\tIRFinder\tcondition"
    assert "sample0.IR\tsample0\tIR\tA" in lines
    assert "sample2.Splice\tsample2\tSplice\tB" in lines


def test_export_glm_cli(samples):
    _, root, dirs = samples
    rc = cli_main(
        ["ExportGLM", "-d", os.path.join(root, "glm_cli"), *dirs,
         "--conditions", "A,B,B"]
    )
    assert rc == 0
    assert os.path.exists(os.path.join(root, "glm_cli", "GLM-counts.tsv"))


def test_export_glm_rejects_mismatched_refs(samples, tmp_path):
    from irfinder_tpu.glm import export_glm

    _, root, dirs = samples
    other_ref = synth_ref(n_genes=10)
    bam = str(tmp_path / "o.bam")
    write_realistic_bam(bam, other_ref, n_pairs=500, seed=1)
    out = str(tmp_path / "other")
    run_bam(other_ref, bam, out)
    with pytest.raises(ValueError, match="intron rows differ"):
        export_glm([dirs[0], out], str(tmp_path / "glm"))


def test_unsorted_bam_passthrough(samples, tmp_path):
    """BAM mode --keep-bam emits a byte-identical Unsorted.bam."""
    ref, root, _ = samples
    bam = os.path.join(root, "s0.bam")
    out = str(tmp_path / "keep")
    ref.save(str(tmp_path / "REF"))
    rc = cli_main(
        ["BAM", "-r", str(tmp_path / "REF"), "-d", out, bam, "--keep-bam"]
    )
    assert rc == 0
    dst = os.path.join(out, "Unsorted.bam")
    assert os.path.exists(dst)
    assert open(dst, "rb").read() == open(bam, "rb").read()


def test_manifest_validation(tmp_path):
    gtf = tmp_path / "a.gtf"
    gtf.write_text(
        'chr1\tx\texon\t11\t20\t.\t+\t.\tgene_id "g1"; transcript_id "t1";\n'
        'chr1\tx\texon\t31\t40\t.\t+\t.\tgene_id "g1"; transcript_id "t1";\n'
    )
    fasta = tmp_path / "g.fa"
    fasta.write_text(">chr1\nACGT\n")
    man = tmp_path / "m.json"
    man.write_text(json.dumps({"gtf": str(gtf), "fasta": str(fasta)}))
    assert cli_main(["BuildRefDownload", "--manifest", str(man)]) == 0

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"gtf": str(tmp_path / "missing.gtf")}))
    assert cli_main(["BuildRefDownload", "--manifest", str(bad)]) == 1
