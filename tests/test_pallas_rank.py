"""Fused Pallas rank kernel vs the XLA bucket path, bit-for-bit.

The kernel (ops/pallas_rank.py) reformulates the bucketed searches as
prefix-constant + in-bucket contribution sums gathered by one-hot int8
matmuls; these tests pin it to ops/bucket.py's rank() / ops/device_ref.py's
mbs_rank() on adversarial inputs: query == span start (bucket-boundary
partial spans), query inside and between spans, chromosome edges, pad lanes.
Interpret mode on the CPU test backend.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from irfinder_tpu.ops.bucket import BucketTable
from irfinder_tpu.ops.device_ref import PAD_CHROM
from irfinder_tpu.ops.pallas_rank import block_ranks_pallas, build_rank_tables

OH = 5


def _make_spans(rng, n_chroms=3, n_spans=300):
    """Random disjoint sorted spans across chromosomes + global MBS offsets."""
    chroms, starts, lens = [], [], []
    for c in range(n_chroms):
        pos = 0
        for _ in range(rng.integers(n_spans // 2, n_spans)):
            pos += int(rng.integers(1, 50))
            ln = int(rng.integers(1, 40))
            chroms.append(c)
            starts.append(pos)
            lens.append(ln)
            pos += ln
    chrom = np.array(chroms, np.int32)
    start = np.array(starts, np.int32)
    ln = np.array(lens, np.int32)
    off = np.concatenate([[0], np.cumsum(ln)]).astype(np.int32)
    return chrom, start, ln, off[:-1]


def _xla_truth(chrom, start, ln, off, pts_c, pts_v, qc, qs, qe):
    """The existing device path run on CPU."""
    uspan_bt = BucketTable.build(
        (chrom, start), payload_cols=(chrom, start, ln, off), bucket=128
    )
    point_bt = BucketTable.build((pts_c, pts_v), bucket=128)
    mbs = int(off[-1] + ln[-1]) if len(ln) else 0

    def mbs_rank(c, p):
        j = uspan_bt.rank((c, p), side="right") - 1
        pc, ps, pl, po = uspan_bt.entry(j)
        same = (j >= 0) & (pc == c)
        within = jnp.clip(p - ps, 0, pl)
        # per-chrom base: offset of the chrom's first span
        base = np.zeros(16, np.int32)
        for cc in range(16):
            m = chrom >= cc
            base[cc] = off[np.argmax(m)] if m.any() else mbs
        b = jnp.asarray(base)[jnp.clip(c, 0, 15)]
        return jnp.where(same, po + within, b)

    lo = mbs_rank(jnp.asarray(qc), jnp.asarray(qs))
    hi = mbs_rank(jnp.asarray(qc), jnp.asarray(qe))
    plo = point_bt.rank((jnp.asarray(qc), jnp.asarray(qs + OH)), side="left")
    phi = point_bt.rank((jnp.asarray(qc), jnp.asarray(qe - OH)), side="right")
    return np.asarray(lo), np.asarray(hi), np.asarray(plo), np.asarray(phi)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kernel_matches_xla(seed):
    rng = np.random.default_rng(seed)
    chrom, start, ln, off = _make_spans(rng)
    # boundary points table: random sorted coords per chrom (with duplicates)
    pts_c, pts_v = [], []
    for c in range(3):
        vs = np.sort(rng.integers(0, 4000, size=200))
        vs[10] = vs[11]  # force a duplicate key
        pts_c.append(np.full(len(vs), c, np.int32))
        pts_v.append(vs.astype(np.int32))
    pts_c = np.concatenate(pts_c)
    pts_v = np.concatenate(pts_v)

    nq = 600
    qc = rng.integers(-1, 4, size=nq).astype(np.int32)  # incl pad & absent chrom
    qs = rng.integers(0, 4200, size=nq).astype(np.int32)
    qe = qs + rng.integers(2 * OH, 200, size=nq).astype(np.int32)
    # adversarial: many queries exactly at span starts / ends (the
    # bucket-boundary partial-span cases)
    k = min(nq // 3, len(start))
    qc[:k] = chrom[:k]
    qs[:k] = start[:k]
    qe[:k] = start[:k] + ln[:k]

    want = _xla_truth(chrom, start, ln, off, pts_c, pts_v, qc, qs, qe)

    mbs_t = build_rank_tables(chrom, start, "mbs", len_col=ln, off_col=off)
    pt_t = build_rank_tables(pts_c, pts_v, "point")
    strand = rng.integers(0, 2, size=nq).astype(np.int32)
    P = int(pts_c.size)
    lo_g, hi_g, spans = block_ranks_pallas(
        mbs_t, pt_t,
        jnp.asarray(qc), jnp.asarray(qs), jnp.asarray(qe), jnp.asarray(strand),
        OH, P, interpret=True,
    )
    # pad lanes (qc < 0) are masked by the step wrapper on both paths
    # (coverage -> trash rank mbs); compare real lanes
    m = qc >= 0
    for name, g, w in zip(["lo", "hi"], (lo_g, hi_g), want[:2]):
        np.testing.assert_array_equal(np.asarray(g)[m], w[m], err_msg=name)

    # spans section: the kernel accumulates the full (2, P+1) diff exactly as
    # the XLA step scatters it (+1 at plo, -1 at phi, trash slot P on miss)
    plo_t, phi_t = want[2], want[3]
    ok = (qc >= 0) & (qe - qs >= 2 * OH)
    want_sp = np.zeros(2 * (P + 1), np.int64)
    np.add.at(want_sp, strand * (P + 1) + np.where(ok, plo_t, P), 1)
    np.add.at(want_sp, strand * (P + 1) + np.where(ok, phi_t, P), -1)
    np.testing.assert_array_equal(np.asarray(spans), want_sp, err_msg="spans")


def test_shard_padded_tables(seed=7):
    """Genome-sharded refs pad tables with lex-+inf (PAD_CHROM, 0) rows to a
    uniform size before the kernel tables are built (device_ref.build with
    pads); padded rows must act as +inf sentinels for every rank kind."""
    rng = np.random.default_rng(seed)
    chrom, start, ln, off = _make_spans(rng)
    pts_c = np.repeat(np.arange(3, dtype=np.int32), 50)
    pts_v = np.concatenate(
        [np.sort(rng.integers(0, 4000, 50)).astype(np.int32) for _ in range(3)]
    )

    def padded(cols, extra):
        out = [np.concatenate([cols[0], np.full(extra, PAD_CHROM, np.int32)])]
        for c in cols[1:]:
            out.append(np.concatenate([c, np.zeros(extra, np.int32)]))
        return out

    nq = 300
    qc = rng.integers(-1, 4, size=nq).astype(np.int32)
    qs = rng.integers(0, 4200, size=nq).astype(np.int32)
    qe = qs + rng.integers(2 * OH, 150, size=nq).astype(np.int32)
    strand = rng.integers(0, 2, size=nq).astype(np.int32)

    want = _xla_truth(chrom, start, ln, off, pts_c, pts_v, qc, qs, qe)

    pc, ps, pl_, po = padded((chrom, start, ln, off), 77)
    # padded off rows are zeros — never selected (descent stops at the last
    # real bucket), mirroring device_ref._pad_rows
    xc, xv = padded((pts_c, pts_v), 33)
    mbs_t = build_rank_tables(pc, ps, "mbs", len_col=pl_, off_col=po)
    pt_t = build_rank_tables(xc, xv, "point")
    P = int(xc.shape[0])
    lo_g, hi_g, spans = block_ranks_pallas(
        mbs_t, pt_t,
        jnp.asarray(qc), jnp.asarray(qs), jnp.asarray(qe), jnp.asarray(strand),
        OH, P, interpret=True,
    )
    m = qc >= 0
    np.testing.assert_array_equal(np.asarray(lo_g)[m], want[0][m], err_msg="lo")
    np.testing.assert_array_equal(np.asarray(hi_g)[m], want[1][m], err_msg="hi")
    # point ranks over the padded table equal the unpadded ones (sentinels
    # sort last and never compare below any real query)
    ok = (qc >= 0) & (qe - qs >= 2 * OH)
    want_sp = np.zeros(2 * (P + 1), np.int64)
    np.add.at(want_sp, strand * (P + 1) + np.where(ok, want[2], P), 1)
    np.add.at(want_sp, strand * (P + 1) + np.where(ok, want[3], P), -1)
    np.testing.assert_array_equal(np.asarray(spans), want_sp, err_msg="spans")


def test_mbs_descent_past_last_mid_row():
    """Regression: when every real mid-row first-key <= q, the descent gathers
    the mid PAD row — whose planes must decode as +inf, not (0,0).  Triggered
    whenever nb2pp > nb2 and the query lies at/after the last bucket's first
    key (e.g. reads mapping to the reference's final region)."""
    n = 16300  # nb = 128 (one mid row), last bucket mixes real + sentinel keys
    chrom = np.zeros(n, np.int32)
    start = (np.arange(n, dtype=np.int32) * 10).astype(np.int32)
    ln = np.full(n, 4, np.int32)
    off = (np.arange(n, dtype=np.int64) * 4).astype(np.int32)
    mbs_t = build_rank_tables(chrom, start, "mbs", len_col=ln, off_col=off)
    pts_c = np.zeros(4, np.int32)
    pts_v = np.array([10, 20, 30, 40], np.int32)
    pt_t = build_rank_tables(pts_c, pts_v, "point")

    qs = np.array([start[-1], start[-1] + 2, start[-1] + 1000], np.int32)
    qe = qs + 100
    qc = np.zeros_like(qs)
    strand = np.zeros_like(qs)
    lo, hi, _ = block_ranks_pallas(
        mbs_t, pt_t, jnp.asarray(qc), jnp.asarray(qs), jnp.asarray(qe),
        jnp.asarray(strand), OH, 4, interpret=True,
    )
    total = int(off[-1] + ln[-1])
    np.testing.assert_array_equal(
        np.asarray(lo), [int(off[-1]), int(off[-1]) + 2, total]
    )
    np.testing.assert_array_equal(np.asarray(hi), [total, total, total])
