"""Device engine vs NumPy oracle: bit-exact counter equivalence.

The contract from SURVEY.md §7.2 step 4: every device counter must equal the
oracle's on identical PackedBatch streams, for random reads, any batch
capacity, and any interleaving.  Also unit-fuzzes the lexicographic binary
search and the device MBS rank against NumPy ground truth.
"""

import io

import numpy as np
import pytest

from irfinder_tpu.engine import Engine, run_bam
from irfinder_tpu.io.bampy import decode_bam
from irfinder_tpu.oracle import OracleCounters, intron_rows, mbs_rank
from irfinder_tpu.ops.device_ref import build_device_ref, mbs_rank as dev_mbs_rank
from irfinder_tpu.ops.search import searchsorted_lex
from irfinder_tpu.refio.compile import compile_reference

from test_oracle import CHROM_INDEX, CHROMS, ROIS, random_bam_bytes, toy_exons


@pytest.fixture(scope="module")
def ref():
    return compile_reference(toy_exons(), chrom_order=CHROMS, rois=ROIS)


def test_searchsorted_lex_fuzz():
    rng = np.random.default_rng(0)
    for trial in range(20):
        n = int(rng.integers(0, 200))
        q = int(rng.integers(1, 300))
        hi = np.sort(rng.integers(0, 5, n)).astype(np.int32)
        lo = np.zeros(n, dtype=np.int32)
        for c in np.unique(hi):
            m = hi == c
            lo[m] = np.sort(rng.integers(0, 50, m.sum()))
        qhi = rng.integers(-1, 6, q).astype(np.int32)
        qlo = rng.integers(-5, 55, q).astype(np.int32)
        key = hi.astype(np.int64) * 1000 + lo
        qk = qhi.astype(np.int64) * 1000 + qlo
        for side in ("left", "right"):
            got = np.asarray(searchsorted_lex((hi, lo), (qhi, qlo), side=side))
            want = np.searchsorted(key, qk, side=side)
            np.testing.assert_array_equal(got, want, err_msg=f"trial={trial} side={side}")


def test_device_mbs_rank_matches_oracle(ref):
    dref = build_device_ref(ref)
    rng = np.random.default_rng(1)
    chrom = rng.integers(-1, len(CHROMS), 500).astype(np.int32)
    pos = rng.integers(0, 3000, 500).astype(np.int32)
    got = np.asarray(dev_mbs_rank(dref, chrom, pos))
    want = mbs_rank(ref, chrom, pos)
    np.testing.assert_array_equal(got, want)


def _oracle_counters(ref, bam, cap=1 << 15):
    _, batches, _ = decode_bam(io.BytesIO(bam), CHROM_INDEX, cap_frags=cap)
    c = OracleCounters.create(ref)
    for b in batches:
        c.add_batch(b)
    return c


def _engine_counters(ref, bam, cap=1 << 15):
    hdr, batches, _ = decode_bam(io.BytesIO(bam), CHROM_INDEX, cap_frags=cap)
    eng = Engine(ref, cap_frags=cap)
    eng.reset(n_refids=len(hdr.ref_names))
    eng.run_stream(batches)
    return eng, eng.counters_host()


@pytest.mark.parametrize("seed", [0, 7])
def test_engine_counters_match_oracle(ref, seed):
    bam = random_bam_bytes(seed=seed, n_frags=250)
    orc = _oracle_counters(ref, bam)
    eng, fc = _engine_counters(ref, bam)
    np.testing.assert_array_equal(fc["depth"], orc.depth)
    np.testing.assert_array_equal(fc["start_cnt"], orc.start_cnt)
    np.testing.assert_array_equal(fc["end_cnt"], orc.end_cnt)
    np.testing.assert_array_equal(fc["exact_cnt"], orc.exact_cnt)
    np.testing.assert_array_equal(fc["span_hits"], orc.span_hits)
    np.testing.assert_array_equal(fc["roi_cnt"], orc.roi_cnt)
    assert int(fc["n_frags"]) == orc.n_frags
    for rid, n in orc.chr_frag.items():
        assert int(fc["chr_frag"][rid]) == n


def test_engine_rows_match_oracle(ref):
    bam = random_bam_bytes(seed=2, n_frags=250)
    orc = _oracle_counters(ref, bam)
    eng, fc = _engine_counters(ref, bam)
    res = eng.results(fc)
    for mode, flip in (("nondir", False), ("dir", False), ("dir", True)):
        want = intron_rows(orc, mode=mode, flip_strand=flip)
        got = eng.results(fc)[f"rows_{mode}"] if not flip else None
        # compare via the shared finalize directly for the flip case
        from irfinder_tpu.finalize import intron_rows as fin_rows

        got = fin_rows(
            ref, fc["depth"], fc["start_cnt"], fc["end_cnt"], fc["exact_cnt"],
            fc["span_hits"], mode=mode, flip_strand=flip,
        )
        assert got == want


def test_engine_batch_capacity_invariance(ref):
    bam = random_bam_bytes(seed=5, n_frags=120)
    _, a = _engine_counters(ref, bam, cap=1 << 15)
    _, b = _engine_counters(ref, bam, cap=9)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_run_bam_end_to_end(ref, tmp_path):
    bam = random_bam_bytes(seed=6, n_frags=150)
    metrics = run_bam(ref, io.BytesIO(bam), str(tmp_path))
    produced = sorted(p.name for p in tmp_path.iterdir())
    assert produced == [
        "IRFinder-ChrCoverage.txt",
        "IRFinder-IR-dir.txt",
        "IRFinder-IR-nondir.txt",
        "IRFinder-JuncCount.txt",
        "IRFinder-ROI.txt",
        "IRFinder-SpansPoint.txt",
        "WARNINGS",
        "metrics.json",
    ]
    ir = (tmp_path / "IRFinder-IR-nondir.txt").read_text().splitlines()
    assert ir[0].startswith("Chr\tStart\tEnd\tName\tNull\tStrand")
    assert len(ir) == 1 + ref.n_introns
    assert metrics.fragments > 0 and metrics.batches >= 1
    # JuncCount totals equal oracle junction-boundary hits where annotated
    orc = _oracle_counters(ref, bam)
    jc = (tmp_path / "IRFinder-JuncCount.txt").read_text().splitlines()[1:]
    tally = {}
    for line in jc:
        c, s, e, fwd, rev, tot = line.split("\t")
        tally[(CHROM_INDEX[c], int(s), int(e))] = int(tot)
    for i in range(ref.upair_start.size):
        c = int(np.searchsorted(ref.upair_seg, i, side="right")) - 1
        key = (c, int(ref.upair_start[i]), int(ref.upair_end[i]))
        assert tally.get(key, 0) == int(orc.exact_cnt[:, i].sum())


def test_deferred_exec_equality(tmp_path, monkeypatch):
    """IRTPU_DEFER=force (the tunneled-TPU burst schedule) must produce the
    byte-identical table set as eager dispatch, including with a mid-stream
    window flush (tiny window) and checkpoint snapshots."""
    import importlib
    import os as _os

    from irfinder_tpu import engine as E
    from irfinder_tpu.io.bamgen import write_realistic_bam
    from irfinder_tpu.synth import synth_ref

    ref = synth_ref(n_genes=30)
    bam = str(tmp_path / "d.bam")
    write_realistic_bam(bam, ref, n_pairs=8000, seed=9)
    m0 = E.run_bam(ref, bam, str(tmp_path / "eager"))

    monkeypatch.setenv("IRTPU_DEFER", "force")
    monkeypatch.setattr(E, "DEFER_WINDOW_BYTES", 1 << 20)  # force mid-flushes
    m1 = E.run_bam(ref, bam, str(tmp_path / "defer"))
    m2 = E.run_bam(
        ref, bam, str(tmp_path / "defer_ck"),
        checkpoint=str(tmp_path / "ck.snap"), checkpoint_every=2,
    )
    for t in (
        "IRFinder-IR-nondir.txt", "IRFinder-IR-dir.txt",
        "IRFinder-JuncCount.txt", "IRFinder-SpansPoint.txt",
        "IRFinder-ROI.txt", "IRFinder-ChrCoverage.txt",
    ):
        a = (tmp_path / "eager" / t).read_bytes()
        assert a == (tmp_path / "defer" / t).read_bytes(), t
        assert a == (tmp_path / "defer_ck" / t).read_bytes(), t
    assert m1.batches == m0.batches


def test_wire_pack_unpack_roundtrip():
    """pack_wire -> unpack_wire reproduces the nine device-bound columns
    exactly (frag_chrom via the refid LUT), incl. pad-lane sentinels."""
    import numpy as np

    from irfinder_tpu.io.batch import pack_wire, unpack_wire
    from irfinder_tpu.io.bamgen import write_realistic_bam
    from irfinder_tpu.engine import open_decoder
    from irfinder_tpu.synth import synth_ref

    ref = synth_ref(n_genes=20)
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        bam = os.path.join(td, "w.bam")
        write_realistic_bam(bam, ref, n_pairs=4000, seed=4)
        hdr, batches, _ = open_decoder(ref, bam, use_native=True)
        lut = np.asarray(hdr.chrom_lut, np.int32)
        n_checked = 0
        for b in batches:
            wire = b.wire if b.wire is not None else pack_wire(b)
            got = unpack_wire(wire, b.cap_blocks, b.cap_frags, lut)
            want = b.device_arrays()
            for k in want:
                np.testing.assert_array_equal(
                    np.asarray(got[k]), want[k], err_msg=k
                )
            n_checked += 1
        assert n_checked > 0


def test_consumer_error_propagates_without_hanging(tmp_path, monkeypatch):
    """A consumer-side failure mid-stream must propagate promptly (the
    three-stage pipeline's feeders must never block forever on a queue once
    the consumer is gone — stop-aware puts/gets everywhere)."""
    import time as _time

    from irfinder_tpu import engine as E
    from irfinder_tpu.io.bamgen import write_realistic_bam
    from irfinder_tpu.synth import synth_ref

    ref = synth_ref(n_genes=30)
    bam = str(tmp_path / "h.bam")
    write_realistic_bam(bam, ref, n_pairs=20000, seed=13)
    eng = E.Engine(ref)
    hdr, batches, _ = E.open_decoder(ref, bam, cap_frags=256)
    eng.reset(n_refids=len(hdr.ref_names))

    class Boom(Exception):
        pass

    calls = {"n": 0}

    def on_batch(done):
        calls["n"] += 1
        if calls["n"] == 3:
            raise Boom()

    t0 = _time.monotonic()
    with pytest.raises(Boom):
        eng.run_stream(batches, on_batch=on_batch, lut=hdr.chrom_lut)
    assert _time.monotonic() - t0 < 30, "run_stream hung after consumer error"
