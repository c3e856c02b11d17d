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
