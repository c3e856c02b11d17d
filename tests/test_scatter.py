"""Pallas scatter-add kernel vs NumPy ground truth (interpret mode on CPU).

The TPU hot path (ops/scatter.py) replaces XLA's near-serial scatter with
sort + tiled one-hot int8 MXU matmuls; these tests pin its semantics to
np.add.at exactly — every update applied once, any duplicate multiplicity,
sentinel-padded lanes ignored.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from irfinder_tpu.ops.scatter import TILE, W, pad_len, scatter_add, scatter_add_pallas


def _truth(m, idx, val):
    out = np.zeros(m, np.int64)
    np.add.at(out, idx, val)
    return out


@pytest.mark.parametrize(
    "m_raw,n,seed",
    [
        (TILE, 1000, 0),  # single tile
        (3 * TILE + 17, 5000, 1),  # several tiles, unpadded raw length
        (2 * TILE, 3 * W + 5, 2),  # window remainder
        (5 * TILE, 1, 3),  # single update
    ],
)
def test_matches_numpy(m_raw, n, seed):
    rng = np.random.default_rng(seed)
    m = pad_len(m_raw)
    idx = rng.integers(0, m_raw, size=n).astype(np.int32)
    val = np.where(rng.random(n) < 0.5, 1, -1).astype(np.int32)
    got = scatter_add_pallas(
        jnp.zeros(m, jnp.int32), jnp.asarray(idx), jnp.asarray(val), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), _truth(m, idx, val))


def test_duplicates_and_hotspots():
    rng = np.random.default_rng(7)
    m = pad_len(2 * TILE)
    # all updates hammer a handful of slots (duplicate-heavy), crossing a
    # tile boundary
    slots = np.array([0, 5, TILE - 1, TILE, TILE + 1, m - 1], np.int32)
    idx = rng.choice(slots, size=4 * W).astype(np.int32)
    val = np.where(rng.random(idx.size) < 0.5, 1, -1).astype(np.int32)
    got = scatter_add_pallas(
        jnp.zeros(m, jnp.int32), jnp.asarray(idx), jnp.asarray(val), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), _truth(m, idx, val))


def test_accumulates_onto_existing():
    rng = np.random.default_rng(9)
    m = pad_len(TILE + 3)
    base = rng.integers(-50, 50, size=m).astype(np.int32)
    idx = rng.integers(0, m, size=777).astype(np.int32)
    val = np.where(rng.random(777) < 0.5, 1, -1).astype(np.int32)
    got = scatter_add_pallas(
        jnp.asarray(base), jnp.asarray(idx), jnp.asarray(val), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), base.astype(np.int64) + _truth(m, idx, val))


def test_dispatch_cpu_fallback():
    # on the CPU test backend scatter_add must route to the XLA path and
    # agree with NumPy
    rng = np.random.default_rng(11)
    m = pad_len(TILE)
    idx = rng.integers(0, m, size=500).astype(np.int32)
    val = np.where(rng.random(500) < 0.5, 1, -1).astype(np.int32)
    got = scatter_add(jnp.zeros(m, jnp.int32), jnp.asarray(idx), jnp.asarray(val))
    np.testing.assert_array_equal(np.asarray(got), _truth(m, idx, val))
