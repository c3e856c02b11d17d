"""Vectorized finalize (finalize.intron_rows) must reproduce the scalar
reference loop (intron_rows_loop) field-for-field, including float division
order, nearest-rank percentiles, and dir-mode strand selection."""

import numpy as np
import pytest

from irfinder_tpu.finalize import intron_rows, intron_rows_loop
from irfinder_tpu.synth import synth_ref


@pytest.mark.parametrize("mode,flip", [("nondir", False), ("dir", False), ("dir", True)])
def test_vectorized_matches_loop(mode, flip):
    ref = synth_ref(n_genes=60, chrom_len=2_000_000, n_chroms=3)
    rng = np.random.default_rng(42)
    mbs = ref.mbs_size
    depth = rng.integers(0, 20, (2, mbs)).astype(np.int32)
    # sparse coverage: zero out most of it so coverage fractions vary
    depth[:, rng.random(mbs) < 0.6] = 0
    sz = lambda a: a.size

    start_cnt = rng.integers(0, 50, (2, sz(ref.bstart_coord))).astype(np.int32)
    end_cnt = rng.integers(0, 50, (2, sz(ref.bend_coord))).astype(np.int32)
    exact_cnt = rng.integers(0, 50, (2, sz(ref.upair_start))).astype(np.int32)
    span_hits = rng.integers(0, 50, (2, sz(ref.point_coord))).astype(np.int32)

    args = (ref, depth, start_cnt, end_cnt, exact_cnt, span_hits)
    a = intron_rows(*args, mode=mode, flip_strand=flip)
    b = intron_rows_loop(*args, mode=mode, flip_strand=flip)
    assert len(a) == len(b) == ref.n_introns
    for ra, rb in zip(a, b):
        assert ra == rb, (ra, rb)


def test_vectorized_chunk_boundaries():
    # chunk smaller than intron count exercises the chunked path
    from irfinder_tpu.finalize import _depth_stats_vectorized

    ref = synth_ref(n_genes=30, chrom_len=1_500_000)
    rng = np.random.default_rng(1)
    dsum = rng.integers(0, 9, ref.mbs_size).astype(np.int64)
    full = _depth_stats_vectorized(ref, dsum, chunk=1 << 30)
    small = _depth_stats_vectorized(ref, dsum, chunk=7)
    for x, y in zip(full, small):
        np.testing.assert_array_equal(x, y)


def test_saturated_depth_fallback():
    # depths beyond the histogram cap (256) must still give exact percentiles
    ref = synth_ref(n_genes=10, chrom_len=600_000)
    rng = np.random.default_rng(3)
    depth = rng.integers(200, 900, (2, ref.mbs_size)).astype(np.int32)
    z = lambda a: rng.integers(0, 5, (2, a.size)).astype(np.int32)
    args = (ref, depth, z(ref.bstart_coord), z(ref.bend_coord), z(ref.upair_start), z(ref.point_coord))
    a = intron_rows(*args)
    b = intron_rows_loop(*args)
    assert a == b
