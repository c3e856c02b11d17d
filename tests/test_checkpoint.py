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


def test_packed_snapshot_roundtrip_with_overflow(tmp_path):
    """The int8-packed snapshot must reconstruct counters EXACTLY, including
    values beyond int8 range (the overflow escape list) and negative deltas."""
    import numpy as np

    from irfinder_tpu import checkpoint as ck

    rng = np.random.default_rng(0)
    cnt = np.zeros(200_000, np.int32)
    idx = rng.integers(0, cnt.size, 30_000)
    cnt[idx] = rng.integers(-5, 6, idx.size)
    big = rng.integers(0, cnt.size, 500)
    cnt[big] = rng.integers(-100_000, 100_000, big.size)
    words, oidx, ovals = ck._pull_packed_i8(cnt)
    assert words.dtype == np.uint32 and words.size == -(-cnt.size // 4)
    rec = ck._unpack_words(words, cnt.shape, oidx, ovals)
    np.testing.assert_array_equal(rec, cnt)
    # 2D (mesh-stacked) counters too
    cnt2 = cnt.reshape(4, -1)
    words, oidx, ovals = ck._pull_packed_i8(cnt2)
    rec = ck._unpack_words(words, cnt2.shape, oidx, ovals)
    np.testing.assert_array_equal(rec, cnt2)
    # non-multiple-of-4 size exercises the pad lane
    cnt3 = cnt[:-3]
    words, oidx, ovals = ck._pull_packed_i8(cnt3)
    rec = ck._unpack_words(words, cnt3.shape, oidx, ovals)
    np.testing.assert_array_equal(rec, cnt3)
    # device path (single-device jax array) must match the host path
    import jax.numpy as jnp

    wd, od, vd = ck._pull_packed_i8(jnp.asarray(cnt))
    wh, oh, vh = ck._pack_host(cnt)
    np.testing.assert_array_equal(np.asarray(wd), wh)
    np.testing.assert_array_equal(np.asarray(od), oh)
    np.testing.assert_array_equal(np.asarray(vd), vh)


def test_packed_snapshot_save_load_exact(tmp_path):
    """save_checkpoint/load_checkpoint with packing on vs off: identical."""
    import dataclasses

    import numpy as np

    from irfinder_tpu import checkpoint as ck

    rng = np.random.default_rng(1)

    @dataclasses.dataclass
    class FakeMetrics:
        batches: int = 7

    @dataclasses.dataclass
    class FakeState:
        counters: dict
        junc_tally: dict
        metrics: FakeMetrics
        n_refids: int = 3
        resume_token: bytes = b"tok"

    cnt = rng.integers(-300, 300, 50_000).astype(np.int32)
    chrn = rng.integers(0, 99, 4).astype(np.int32)
    st = FakeState(
        counters={"cnt": cnt, "chr": chrn},
        junc_tally={(0, 10, 20): [3, 4]},
        metrics=FakeMetrics(),
    )
    outs = {}
    for packed in (True, False):
        import os

        os.environ["IRTPU_CKPT_PACK"] = "1" if packed else "0"
        try:
            p = str(tmp_path / f"snap_{packed}.ckpt")
            ck.save_checkpoint(p, st)
            outs[packed] = ck.load_checkpoint(p)
        finally:
            os.environ.pop("IRTPU_CKPT_PACK", None)
    (ca, cha), _, ba, na, ta = outs[True]
    (cb, chb), _, bb, nb, tb = outs[False]
    np.testing.assert_array_equal(ca, cb)
    np.testing.assert_array_equal(cha, chb)
    assert (ba, na, ta) == (bb, nb, tb)
    np.testing.assert_array_equal(ca, cnt)
