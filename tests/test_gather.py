"""Windowed Pallas gather (ops/gather.py) vs jnp.take, and the host-side
band metadata (_gather_meta) that feeds it."""

import types

import jax.numpy as jnp
import numpy as np
import pytest

from irfinder_tpu.ops.finalize_stats import _gather_meta
from irfinder_tpu.ops.gather import GW, SPAN, gather_window


def _runs_to_src(starts, lens):
    """Flat src vector of the piecewise-sequential expansion."""
    total = int(lens.sum())
    off = np.cumsum(lens) - lens
    rep = np.repeat(off, lens)
    pos = np.arange(total, dtype=np.int64) - rep
    return (np.repeat(starts, lens) + pos).astype(np.int32)


def _check(starts, lens, mbs, seed=0):
    rng = np.random.default_rng(seed)
    tbl = rng.integers(0, 2048, size=mbs).astype(np.int32)
    src = _runs_to_src(starts, lens)
    F = src.size
    ref = types.SimpleNamespace(mbs_size=mbs)
    F_pad, bad_pos, use_gk = _gather_meta(
        ref, lens.astype(np.int64), starts.astype(np.int64), F
    )
    srcp = np.full(F_pad, src[-1], np.int32)  # pad tail pinned like _hist_jit
    srcp[:F] = src
    got = np.asarray(
        gather_window(jnp.asarray(tbl), jnp.asarray(srcp), interpret=True)
    )[:F]
    want = tbl[src]
    bad = np.zeros(F, bool)
    bad[np.asarray(bad_pos)[np.asarray(bad_pos) < F]] = True
    assert np.array_equal(got[~bad], want[~bad])
    return use_gk, int(bad.sum())


def test_sequential_runs_exact():
    # adjacent runs walking forward: always in-band
    starts = np.array([0, 500, 1200, 4000, 4100], dtype=np.int64)
    lens = np.array([500, 700, 300, 100, 900], dtype=np.int64)
    use_gk, n_bad = _check(starts, lens, mbs=50_000)
    assert use_gk and n_bad == 0


def test_overlapping_introns_backtrack():
    # backtracks smaller than the window stay in-band
    starts = np.array([0, 100, 50, 3000, 2500], dtype=np.int64)
    lens = np.array([2000, 1500, 800, 2000, 4000], dtype=np.int64)
    use_gk, n_bad = _check(starts, lens, mbs=20_000)
    assert use_gk and n_bad == 0


def test_band_overflow_flagged():
    # two runs further apart than SPAN inside one block: flagged bad, the
    # good remainder still exact
    starts = np.array([0, 10 * SPAN], dtype=np.int64)
    lens = np.array([64, 64], dtype=np.int64)
    _, n_bad = _check(starts, lens, mbs=11 * SPAN)
    assert n_bad == 128  # the whole (single real) block is patched


def test_zero_length_runs_and_big_block():
    rng = np.random.default_rng(3)
    lens = rng.integers(0, 400, size=200).astype(np.int64)
    starts = np.cumsum(lens) - lens + rng.integers(0, 50, size=200)
    use_gk, n_bad = _check(starts, lens, mbs=int(starts[-1] + lens[-1] + 64))
    assert use_gk and n_bad == 0


def test_multiblock():
    # > GW total bases so several grid steps run
    lens = np.full(40, 700, dtype=np.int64)
    starts = (np.cumsum(lens) - lens) + 13
    use_gk, n_bad = _check(starts, lens, mbs=int(starts[-1] + 800))
    assert use_gk and n_bad == 0
