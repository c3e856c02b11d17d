"""BucketTable (ops/bucket.py) vs NumPy searchsorted oracles.

Covers: multi-level descent, duplicate keys, sentinel padding, both sides,
2- and 3-column lex keys, payload entry select, exact-match lookup.
"""

import numpy as np
import pytest

from irfinder_tpu.ops.bucket import BucketTable


def _np_rank(key_cols, q_cols, side):
    # lex rank via int64 packing (coords < 2^31, chroms small)
    k = key_cols[0].astype(np.int64)
    q = q_cols[0].astype(np.int64)
    for kc, qc in zip(key_cols[1:], q_cols[1:]):
        k = k * (1 << 31) + kc
        q = q * (1 << 31) + qc
    return np.searchsorted(k, q, side=side).astype(np.int32)


def _random_table(rng, n, n_chroms=5, dup_frac=0.3):
    chrom = np.sort(rng.integers(0, n_chroms, n)).astype(np.int32)
    coords = []
    for c in np.bincount(chrom, minlength=n_chroms):
        v = np.sort(rng.integers(0, 10_000, c)).astype(np.int32)
        coords.append(v)
    coord = np.concatenate(coords) if coords else np.zeros(0, np.int32)
    return chrom, coord


@pytest.mark.parametrize("n", [0, 1, 7, 128, 129, 1000, 5000])
@pytest.mark.parametrize("side", ["left", "right"])
def test_rank_two_col(n, side):
    rng = np.random.default_rng(n + (side == "right"))
    kc, kv = _random_table(rng, n)
    bt = BucketTable.build((kc, kv), bucket=32, top_max=8)
    Q = 500
    qc = rng.integers(-1, 6, Q).astype(np.int32)
    qv = rng.integers(-5, 10_005, Q).astype(np.int32)
    got = np.asarray(bt.rank((qc, qv), side=side))
    want = _np_rank((kc, kv), (qc, qv), side)
    np.testing.assert_array_equal(got, want)


def test_rank_exact_keys_present():
    rng = np.random.default_rng(7)
    kc, kv = _random_table(rng, 2000)
    bt = BucketTable.build((kc, kv), bucket=16, top_max=16)
    # query every key itself: rank_left < rank_right and entries match
    for side in ("left", "right"):
        got = np.asarray(bt.rank((kc, kv), side=side))
        want = _np_rank((kc, kv), (kc, kv), side)
        np.testing.assert_array_equal(got, want)


def test_three_col_rank():
    rng = np.random.default_rng(3)
    n = 777
    kc = np.sort(rng.integers(0, 3, n)).astype(np.int32)
    ks = rng.integers(0, 1000, n).astype(np.int32)
    ke = rng.integers(0, 1000, n).astype(np.int32)
    order = np.lexsort((ke, ks, kc))
    kc, ks, ke = kc[order], ks[order], ke[order]
    bt = BucketTable.build((kc, ks, ke), bucket=32, top_max=8)
    Q = 400
    qc = rng.integers(0, 3, Q).astype(np.int32)
    qs = rng.integers(0, 1000, Q).astype(np.int32)
    qe = rng.integers(0, 1000, Q).astype(np.int32)
    for side in ("left", "right"):
        got = np.asarray(bt.rank((qc, qs, qe), side=side))
        k = (kc.astype(np.int64) * (1 << 20) + ks) * (1 << 20) + ke
        q = (qc.astype(np.int64) * (1 << 20) + qs) * (1 << 20) + qe
        np.testing.assert_array_equal(got, np.searchsorted(k, q, side=side))


def test_entry_payload_select():
    rng = np.random.default_rng(11)
    n = 1500
    kc, kv = _random_table(rng, n)
    pay = rng.integers(0, 1 << 20, n).astype(np.int32)
    bt = BucketTable.build((kc, kv), payload_cols=(kc, kv, pay), bucket=32, top_max=8)
    idx = rng.integers(0, n, 300).astype(np.int32)
    ec, ev, ep = (np.asarray(x) for x in bt.entry(idx))
    np.testing.assert_array_equal(ec, kc[idx])
    np.testing.assert_array_equal(ev, kv[idx])
    np.testing.assert_array_equal(ep, pay[idx])


def test_match_hits_and_misses():
    rng = np.random.default_rng(13)
    n = 900
    kc, kv = _random_table(rng, n, dup_frac=0.0)
    bt = BucketTable.build((kc, kv), payload_cols=(kc, kv), bucket=32, top_max=8)
    # present queries
    sel = rng.integers(0, n, 200)
    j, hit = bt.match((kc[sel], kv[sel]))
    assert bool(np.asarray(hit).all())
    np.testing.assert_array_equal(np.asarray(bt.entry(np.asarray(j))[1]), kv[sel])
    # absent queries (coords out of range)
    qa = np.full(50, 3, np.int32)
    qb = np.arange(50, dtype=np.int32) + 20_000
    _, hit2 = bt.match((qa, qb))
    assert not bool(np.asarray(hit2).any())
    # pad-lane queries (chrom -1) must miss
    _, hit3 = bt.match((np.full(8, -1, np.int32), np.zeros(8, np.int32)))
    assert not bool(np.asarray(hit3).any())


def test_single_level_dense_table():
    # n small enough that there is only the dense top + one bottom level
    rng = np.random.default_rng(17)
    kc, kv = _random_table(rng, 64)
    bt = BucketTable.build((kc, kv), bucket=128, top_max=1024)
    qc = rng.integers(0, 6, 100).astype(np.int32)
    qv = rng.integers(0, 10_000, 100).astype(np.int32)
    for side in ("left", "right"):
        np.testing.assert_array_equal(
            np.asarray(bt.rank((qc, qv), side=side)),
            _np_rank((kc, kv), (qc, qv), side),
        )
