"""Checkpoint / resume (irfinder_tpu/checkpoint.py; SURVEY.md §5.4): an
interrupted run resumed from a snapshot must reproduce the uninterrupted
outputs byte-for-byte."""

import os

import numpy as np
import pytest

from irfinder_tpu.checkpoint import load_checkpoint, restore_state, save_checkpoint
from irfinder_tpu.engine import Engine, open_decoder, run_bam, write_outputs
from irfinder_tpu.refio.compile import compile_reference

from test_oracle import CHROMS, CHROM_INDEX, ROIS, random_bam_bytes, toy_exons

TABLES = (
    "IRFinder-IR-nondir.txt",
    "IRFinder-IR-dir.txt",
    "IRFinder-JuncCount.txt",
    "IRFinder-SpansPoint.txt",
    "IRFinder-ROI.txt",
    "IRFinder-ChrCoverage.txt",
)


@pytest.fixture(scope="module")
def ref():
    return compile_reference(toy_exons(), chrom_order=CHROMS, rois=ROIS)


def test_resume_matches_uninterrupted(tmp_path, ref):
    bam = tmp_path / "in.bam"
    # small cap -> many batches
    bam.write_bytes(random_bam_bytes(seed=5, n_frags=400))
    cap = 64

    solo = str(tmp_path / "solo")
    run_bam(ref, str(bam), solo, cap_frags=cap)

    # interrupted run: process only the first 3 batches, snapshot, abandon
    ckpt = str(tmp_path / "state.npz")
    engine = Engine(ref, cap_frags=cap)
    header, batches, stats = open_decoder(ref, str(bam), cap)
    engine.reset(n_refids=len(header.ref_names))
    for i, b in enumerate(batches):
        engine.process_batch(b)
        if i == 2:
            break
    save_checkpoint(ckpt, engine._st)
    assert os.path.exists(ckpt)
    ck = load_checkpoint(ckpt)
    assert ck is not None and ck[2] == 3

    # resumed run through the public API
    resumed = str(tmp_path / "resumed")
    m = run_bam(ref, str(bam), resumed, cap_frags=cap, checkpoint=ckpt)
    assert m.fragments > 0
    assert not os.path.exists(ckpt), "checkpoint should be removed on success"

    for t in TABLES:
        a = open(os.path.join(solo, t)).read()
        b = open(os.path.join(resumed, t)).read()
        assert a == b, f"{t} differs after resume"


def test_restore_rejects_shape_mismatch(tmp_path, ref):
    bam = tmp_path / "in.bam"
    bam.write_bytes(random_bam_bytes(seed=6, n_frags=50))
    ckpt = str(tmp_path / "bad.npz")
    engine = Engine(ref, cap_frags=64)
    header, batches, _ = open_decoder(ref, str(bam), 64)
    engine.reset(n_refids=len(header.ref_names))
    for b in batches:
        engine.process_batch(b)
        break
    st = engine._st
    st.counters = {"cnt": np.zeros(7, np.int32), "chr": st.counters["chr"]}  # corrupt shape
    save_checkpoint(ckpt, st)
    with pytest.raises(ValueError, match="shape mismatch"):
        restore_state(engine, load_checkpoint(ckpt))


def test_mesh_resume_matches_uninterrupted(tmp_path, ref):
    """Checkpoint/resume through the sharded mesh pipeline (run_bam_mesh):
    snapshot mid-run under a dp x genome mesh, resume, tables byte-identical
    to the uninterrupted unsharded run."""
    from irfinder_tpu.engine_mesh import MeshEngine, MeshSpec, run_bam_mesh

    bam = tmp_path / "in.bam"
    bam.write_bytes(random_bam_bytes(seed=9, n_frags=400))
    cap = 64
    spec = MeshSpec(dp=2, genome=4, routed=True)

    solo = str(tmp_path / "solo")
    run_bam(ref, str(bam), solo, cap_frags=cap)

    # interrupted mesh run: 3 batches, snapshot, abandon
    ckpt = str(tmp_path / "mesh.npz")
    eng = MeshEngine(ref, spec, cap_frags=cap)
    header, batches, stats = open_decoder(ref, str(bam), cap, use_native=False)
    st = eng.new_state(n_refids=len(header.ref_names))
    for i, b in enumerate(batches):
        eng.process_batch(b, st)
        if i == 2:
            break
    assert st.resume_token is not None
    save_checkpoint(ckpt, st)
    ck = load_checkpoint(ckpt)
    assert ck is not None and ck[2] == 3

    resumed = str(tmp_path / "resumed")
    m = run_bam_mesh(
        ref, str(bam), resumed, spec, cap_frags=cap, use_native=False,
        checkpoint=ckpt, checkpoint_every=2,
    )
    assert m.fragments > 0
    assert not os.path.exists(ckpt)
    for t in TABLES:
        a = open(os.path.join(solo, t)).read()
        b = open(os.path.join(resumed, t)).read()
        assert a == b, f"{t} differs after mesh resume"


def test_mesh_restore_rejects_other_spec(tmp_path, ref):
    """A snapshot written under one --mesh shape must not resume under
    another (the stacked counter shapes encode the spec)."""
    from irfinder_tpu.engine_mesh import MeshEngine, MeshSpec

    bam = tmp_path / "in.bam"
    bam.write_bytes(random_bam_bytes(seed=10, n_frags=80))
    eng = MeshEngine(ref, MeshSpec(dp=2, genome=4), cap_frags=64)
    header, batches, _ = open_decoder(ref, str(bam), 64, use_native=False)
    st = eng.new_state(n_refids=len(header.ref_names))
    for b in batches:
        eng.process_batch(b, st)
        break
    ckpt = str(tmp_path / "mesh.npz")
    save_checkpoint(ckpt, st)
    other = MeshEngine(ref, MeshSpec(dp=4, genome=2), cap_frags=64)
    with pytest.raises(ValueError, match="shape mismatch"):
        other.restore_state(load_checkpoint(ckpt))
