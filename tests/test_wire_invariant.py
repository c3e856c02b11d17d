"""Wire-eligibility invariant (round-4 verdict #5): a decoder batch whose
block/frag columns were skipped on the wire_ok promise (columns_full=False)
must NEVER silently feed the fused column step — that would ship never-filled
zero columns and emit plausible-but-empty tables.  The engine raises instead.
"""

from __future__ import annotations

import numpy as np
import pytest

from irfinder_tpu.engine import Engine
from irfinder_tpu.io.batch import PackedBatch, pack_wire
from irfinder_tpu.synth import synth_ref


def _wire_only_batch(cap_frags: int = 256) -> PackedBatch:
    b = PackedBatch.empty(3 * cap_frags, cap_frags, cap_frags)
    b.n_frags = b.n_blocks = 0
    b.wire = pack_wire(b)
    b.columns_full = False
    return b


def test_run_stream_without_lut_raises():
    ref = synth_ref(n_genes=20)
    eng = Engine(ref)
    eng.reset(n_refids=len(ref.chroms))
    with pytest.raises(RuntimeError, match="columns_full"):
        eng.run_stream([_wire_only_batch()])  # no lut: fused fallback is illegal


def test_run_multi_stream_without_lut_raises():
    ref = synth_ref(n_genes=20)
    eng = Engine(ref)
    st = eng.new_state(n_refids=len(ref.chroms))
    with pytest.raises(RuntimeError, match="columns_full"):
        eng.run_multi_stream([([_wire_only_batch()], st, None)])


def test_process_batch_guard():
    ref = synth_ref(n_genes=20)
    eng = Engine(ref)
    eng.reset(n_refids=len(ref.chroms))
    with pytest.raises(RuntimeError, match="columns_full"):
        eng.process_batch(_wire_only_batch())


def test_full_column_batch_still_flows():
    """The invariant must not reject legitimate full-column batches."""
    ref = synth_ref(n_genes=20)
    eng = Engine(ref)
    eng.reset(n_refids=len(ref.chroms))
    b = PackedBatch.empty(96, 32, 32)
    b.n_frags = b.n_blocks = 0
    eng.run_stream([b])
    assert eng.metrics.batches == 1


def test_trim_wire_counters_identical():
    """Trimmed ship shapes (used-prefix wire slices) must produce counters
    identical to the full-cap buffer: pad lanes beyond the used counts are
    pad-encoded, so any quantized prefix >= used is equivalent."""
    import os
    import tempfile

    from irfinder_tpu.engine import open_decoder
    from irfinder_tpu.io.bamgen import write_realistic_bam
    from irfinder_tpu.io.batch import pack_wire, trim_wire
    from irfinder_tpu.ops.device_ref import build_device_ref
    from irfinder_tpu.ops.step import init_counters, make_wire_step

    ref = synth_ref(n_genes=20)
    dref = build_device_ref(ref)
    with tempfile.TemporaryDirectory() as td:
        bam = os.path.join(td, "w.bam")
        write_realistic_bam(bam, ref, n_pairs=3000, seed=9)
        hdr, batches, _ = open_decoder(ref, bam, use_native=True)
        lut = np.asarray(hdr.chrom_lut, np.int32)
        import jax

        lut_dev = jax.device_put(lut)
        c_full = init_counters(dref, n_refids=len(hdr.ref_names))
        c_trim = init_counters(dref, n_refids=len(hdr.ref_names))
        n = 0
        for b in batches:
            w = b.wire if b.wire is not None else pack_wire(b)
            stp = make_wire_step(b.cap_blocks, b.cap_frags)
            c_full = stp(dref, c_full, jax.device_put(w), lut_dev)
            wt, bs, fs = trim_wire(
                w, b.cap_blocks, b.cap_frags, b.n_blocks, b.n_frags,
                quantum=1024,  # small quantum: actually trims at test scale
            )
            assert bs <= b.cap_blocks and fs <= b.cap_frags
            stp_t = make_wire_step(bs, fs)
            c_trim = stp_t(dref, c_trim, jax.device_put(wt), lut_dev)
            n += 1
        assert n > 0
        n_refids = len(hdr.ref_names)
        for k in c_full:
            a, b_ = np.asarray(c_full[k]), np.asarray(c_trim[k])
            if k == "chr":
                # the trailing trash lane counts PAD rows, which trimming
                # legitimately removes; it is excluded from every output
                a, b_ = a[:n_refids], b_[:n_refids]
            np.testing.assert_array_equal(a, b_, err_msg=k)
