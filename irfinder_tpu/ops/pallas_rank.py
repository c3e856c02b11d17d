"""Pallas TPU rank kernel — fused measured-base-space + boundary-point ranks.

The XLA bucketed-rank path (ops/bucket.py) spends most of the counting step
shuffling (Q,128) row-gather intermediates through HBM (~5.7 ms/batch for the
four rank passes).  This kernel keeps the search tables resident in VMEM and
computes all four ranks per aligned block (MBS rank of both edges + spans
rank of both overhang points) in one pass over the block stream, so the only
HBM traffic is the query columns in and four rank columns out.

Two TPU-native reformulations make this fast:

1. **Gather = one-hot int8 matmul.**  Mosaic has no vectorized VMEM gather,
   but selecting bucket rows is a contraction: rows = onehot(b) @ table.
   int32 columns are split into int8 planes, biased by -128 so they fit the
   signed int8 MXU, and recombined exactly after the matmul (int8 x int8 ->
   int32 accumulate is exact).

2. **Rank = prefix constant + in-bucket contribution sum.**  Because MBS
   spans are disjoint and sorted, every span entirely before the descent
   bucket contributes its full length, so
       mbs_rank(q) = cumlen[b] + sum_{k in bucket b} clip(qp - start_k, 0, len_k)
   with the sum masked by chromosome compare — no entry() select, no
   rank-1 boundary cases at all.  Point ranks are the counting special case:
       point_rank(q) = 128*b + #{k in bucket b : key_k (< or <=) q}.

Tables use a fixed 3-level structure (top <=128 dense keys -> mid (nb2,128)
-> bottom (nb,128)); the host packs them once per DeviceRef
(build_rank_tables).  The kernel is engaged when the packed tables fit a
VMEM budget (always true for per-chromosome-sharded maps); otherwise the
step falls back to the XLA bucket path.

Semantics are pinned to ops/bucket.py's rank() bit-for-bit in
tests/test_pallas_rank.py.  Reference parity: replaces the sorted-map lookups
of the historical ReadBlockProcessor*.cpp (SURVEY.md §2 rows 10-12).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bucket import PAD_KEY

#: queries per grid step.  Per-query scalars are (QCHUNK, 1) in VMEM and get
#: lane-padded 128x by the (8,128) tiling, so QCHUNK is bounded by the 16MB
#: scoped-vmem limit (1024 fits with ~40% headroom; 2048 does not)
QCHUNK = 1024
#: bottom buckets above which the step keeps the XLA bucket path.  The
#: one-hot matmul-gather scans the whole bottom table per query chunk, so its
#: cost grows linearly with table size: measured on v5e it beats XLA up to
#: ~1-1.5k buckets (every per-chromosome/genome-sharded map) and loses at
#: whole-genome-unsharded scale (~3.4k buckets, 27 vs 19 ms/batch) — the
#: block-split gathers (NBB) keep VMEM bounded either way, the crossover is
#: pure compute
MAX_NB = 1536


def _planes(col: np.ndarray, n: int) -> list:
    """int32 column -> n unsigned 8-bit planes, biased to signed int8."""
    out = []
    for s in range(n):
        p = (col.astype(np.int64) >> (8 * s)) & 0xFF
        out.append((p - 128).astype(np.int8))
    return out


def _pack_rows(cols_planes: list, nb: int) -> np.ndarray:
    """Stack plane columns (each (nb*128,)) into the (nb, n_groups*128) int8
    concatenated table the kernel matmuls against."""
    mats = [p.reshape(nb, 128) for p in cols_planes]
    return np.concatenate(mats, axis=1)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RankTables:
    """VMEM-resident 3-level search structure for one key table.

    kind 'mbs':   keys (chrom, start) + payload (len, cumlen-prefix)
    kind 'point': keys (chrom, coord), count-only
    """

    top_chrom: jnp.ndarray  # (1, nb2p) int32 — last key of each mid bucket
    top_key: jnp.ndarray
    mid_cat: jnp.ndarray  # (nb2p, 6*128) int8 — chrom(2)+key(4) planes
    bot_cat: jnp.ndarray  # (nbp, G*128) int8
    nb: int  # real bottom buckets (descent can never exceed nb-1)
    nbp: int  # padded rows of bot_cat
    nb2p: int  # padded rows of mid_cat / lanes of top
    kind: str

    def tree_flatten(self):
        return (
            (self.top_chrom, self.top_key, self.mid_cat, self.bot_cat),
            (self.nb, self.nbp, self.nb2p, self.kind),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def _round_up(n, m):
    return -(-n // m) * m


def build_rank_tables(chrom, key, kind: str, len_col=None, off_col=None):
    """Host-side packing.  chrom/key sorted lex ascending, int32.

    kind='point': descent counts buckets whose LAST key satisfies the side
    predicate, so earlier buckets contribute exactly 128 each (pure
    searchsorted counting).

    kind='mbs': the in-row sum must run over the bucket holding the LAST KEY
    <= q (a span that only partially precedes q can be a bucket's last key,
    so last-key descent would wrongly bank its full length into the prefix).
    The mid/top levels therefore hold bucket FIRST keys: the prefix count of
    first-keys <= q, minus one, is that bucket's index.  len_col is the span
    length and off_col the global MBS offset of each span; cumlen per bucket
    (= off of the bucket's first span) is exact because every span in an
    earlier bucket lies entirely before the partial span."""
    chrom = np.asarray(chrom, np.int32)
    key = np.asarray(key, np.int32)
    n = chrom.shape[0]
    # always >= 1 sentinel entry so descent can never select a bucket past
    # the last one containing a real key
    nb = _round_up(n + 1, 128) // 128
    pad = nb * 128 - n
    # sentinel padding: lex +inf keys, zero payload
    chrom_p = np.concatenate([chrom, np.full(pad, PAD_KEY, np.int32)])
    key_p = np.concatenate([key, np.zeros(pad, np.int32)])
    groups = _planes(chrom_p, 2) + _planes(key_p, 4)
    if kind == "mbs":
        ln = np.concatenate([np.asarray(len_col, np.int32), np.zeros(pad, np.int32)])
        off = np.asarray(off_col, np.int64)
        total = int(off[-1] + len_col[-1]) if n else 0
        cuml = np.zeros(nb, np.int64)
        for b in range(nb):
            i = b * 128
            cuml[b] = off[i] if i < n else total
        groups += _planes(ln, 3)
        # cumlen rides in lanes 0..3 of one extra group (4 biased planes)
        cgroup = np.full((nb, 128), -128, np.int8)
        cp = _planes(cuml.astype(np.int64), 4)
        for s in range(4):
            cgroup[:, s] = cp[s].astype(np.int8)
        mats = [p.reshape(nb, 128) for p in groups]
        bot = np.concatenate(mats + [cgroup], axis=1)
    else:
        bot = _pack_rows(groups, nb)

    # mid level: one key per bottom bucket (first for mbs, last for point)
    lane = 0 if kind == "mbs" else 127
    m_chrom = chrom_p.reshape(nb, 128)[:, lane]
    m_key = key_p.reshape(nb, 128)[:, lane]
    nb2 = _round_up(nb, 128) // 128
    pad2 = nb2 * 128 - nb
    m_chrom = np.concatenate([m_chrom, np.full(pad2, PAD_KEY, np.int32)])
    m_key = np.concatenate([m_key, np.zeros(pad2, np.int32)])
    mid = _pack_rows(_planes(m_chrom, 2) + _planes(m_key, 4), nb2)

    # top level: last entry of each mid row (prefix-dense for both kinds
    # because the mid array itself is sorted), dense-compared in the kernel
    t_chrom = m_chrom.reshape(nb2, 128)[:, -1]
    t_key = m_key.reshape(nb2, 128)[:, -1]
    nb2p = _round_up(nb2, 128)
    t_chrom = np.concatenate([t_chrom, np.full(nb2p - nb2, PAD_KEY, np.int32)])
    t_key = np.concatenate([t_key, np.zeros(nb2p - nb2, np.int32)])

    # pad bottom/mid rows to a sublane multiple for clean VMEM layout.  Pad
    # rows MUST decode as lex-+inf keys: for kind='mbs' the descent count can
    # legitimately reach nb2 (all real first-keys <= q when the last real
    # bucket mixes real and sentinel keys), so the gathered pad row's chrom
    # must compare greater than every query.  Biased plane byte 127 decodes
    # to 0xFF per plane (chrom 65535), which is +inf for real chrom ids.
    nbp = _round_up(nb, 8)
    if nbp != nb:
        botp = np.full((nbp, bot.shape[1]), 127, np.int8)
        botp[:nb] = bot
        bot = botp
    nb2pp = _round_up(nb2, 8)
    if nb2pp != nb2:
        midp = np.full((nb2pp, mid.shape[1]), 127, np.int8)
        midp[:nb2] = mid
        mid = midp

    j = jnp.asarray
    return RankTables(
        top_chrom=j(t_chrom.reshape(1, nb2p)),
        top_key=j(t_key.reshape(1, nb2p)),
        mid_cat=j(mid),
        bot_cat=j(bot),
        nb=nb,
        nbp=bot.shape[0],
        nb2p=nb2p,
        kind=kind,
    )


# ---------------------------------------------------------------------------
# kernel helpers (traced inside the pallas kernel)
# ---------------------------------------------------------------------------


#: bucket-block width for the one-hot gather (caps the one-hot matrix at
#: (QCHUNK, NBB) int8 regardless of table size)
NBB = 1024


def _gather_cols(cat_ref, b, base, n):
    """One-hot gather + plane recombination, processed one 128-lane group and
    one NBB-bucket block at a time — neither the (Q, width) gather output nor
    a (Q, nbp) one-hot ever materializes, so VMEM stays capped for tables of
    any size.  Exactly one block contributes (the one holding bucket b); the
    others one-hot to all-zero rows."""
    nbp = cat_ref.shape[0]
    Q = b.shape[0]
    out = None
    for b0 in range(0, nbp, NBB):
        bc = min(NBB, nbp - b0)
        oh = (
            b0 + jax.lax.broadcasted_iota(jnp.int32, (Q, bc), 1) == b
        ).astype(jnp.int8)
        blk = None
        for s in range(n):
            g = jax.lax.dot_general(
                oh,
                cat_ref[b0 : b0 + bc, (base + s) * 128 : (base + s + 1) * 128],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            blk = g if s == 0 else blk + (g << (8 * s))
        out = blk if out is None else out + blk
    # bias correction: each of the n planes carried -128; only the selected
    # block's one-hot row sums to 1, so add the bias back once per plane.
    # The 4-plane bias exceeds int32 as a Python int; int32 wraparound
    # addition is exact because the true value fits int32.
    bias = sum(128 << (8 * s) for s in range(n)) & 0xFFFFFFFF
    if bias >= 1 << 31:
        bias -= 1 << 32
    return out + jnp.int32(bias)


def _lex_le(c, k, qc, qk, or_equal):
    lt = (c < qc) | ((c == qc) & (k < qk))
    if or_equal:
        return lt | ((c == qc) & (k == qk))
    return lt


def _gather_group_raw(cat_ref, b, g_idx):
    """Block-split one-hot gather of ONE raw (still biased) plane group."""
    nbp = cat_ref.shape[0]
    Q = b.shape[0]
    out = None
    for b0 in range(0, nbp, NBB):
        bc = min(NBB, nbp - b0)
        oh = (
            b0 + jax.lax.broadcasted_iota(jnp.int32, (Q, bc), 1) == b
        ).astype(jnp.int8)
        g = jax.lax.dot_general(
            oh,
            cat_ref[b0 : b0 + bc, g_idx * 128 : (g_idx + 1) * 128],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = g if out is None else out + g
    return out


def _descend(tt_c, tt_k, mid_ref, t: RankTables, qc, qk, or_equal):
    """3-level descent -> bottom bucket index b (Q,1)."""
    b2 = jnp.sum(
        _lex_le(tt_c, tt_k, qc, qk, or_equal), axis=1, keepdims=True
    ).astype(jnp.int32)
    mc = _gather_cols(mid_ref, b2, 0, 2)
    mk = _gather_cols(mid_ref, b2, 2, 4)
    c2 = jnp.sum(
        _lex_le(mc, mk, qc, qk, or_equal), axis=1, keepdims=True
    ).astype(jnp.int32)
    return b2 * 128 + c2


def _make_kernel(mbs_t: RankTables, pt_t: RankTables, overhang: int, pw: int, sp_rows: int):
    OH = overhang

    def kernel(
        qc_ref, qs_ref, qe_ref, qt_ref,
        m_top_c, m_top_k, m_mid, m_bot,
        p_top_c, p_top_k, p_mid, p_bot,
        lo_ref, hi_ref, sp_ref,
    ):
        # the spans diff section (2, pw) stays resident across the whole grid
        # (constant-index output block); zero it on the first chunk
        @pl.when(pl.program_id(0) == 0)
        def _():
            sp_ref[:] = jnp.zeros_like(sp_ref)

        # query blocks arrive dense (Q/128, 128) — a (Q, 1) block layout
        # would be lane-padded 128x in VMEM — and are transposed to the
        # sublane-per-query shape all kernel math uses
        Qn = qc_ref.shape[0] * 128

        def col(ref):
            return jnp.transpose(ref[:].reshape(1, Qn), (1, 0))

        qc = col(qc_ref)  # (Q,1)

        def mbs_rank(qk):
            # first-key prefix count - 1 = bucket of the last key <= q
            cnt = _descend(m_top_c[:], m_top_k[:], m_mid, mbs_t, qc, qk, True)
            b = jnp.maximum(cnt - 1, 0)
            bc = _gather_cols(m_bot, b, 0, 2)
            bs = _gather_cols(m_bot, b, 2, 4)
            bl = _gather_cols(m_bot, b, 6, 3)
            # cumlen planes sit in lanes 0..3 of group 9 (other lanes are
            # biased zeros); extract by masked row-sum — single-lane slices
            # at unaligned offsets miscompile on real hardware
            cg = _gather_group_raw(m_bot, b, 9) + 128
            lane = jax.lax.broadcasted_iota(jnp.int32, cg.shape, 1)
            cuml = jnp.zeros((cg.shape[0], 1), jnp.int32)
            for s in range(4):
                p = jnp.sum(jnp.where(lane == s, cg, 0), axis=1, keepdims=True)
                cuml = cuml + (p << (8 * s))
            within = jnp.clip(qk - bs, 0, bl)
            contrib = jnp.where(bc == qc, within, jnp.where(bc < qc, bl, 0))
            return cuml + jnp.sum(contrib, axis=1, keepdims=True).astype(jnp.int32)

        def point_rank(qk, or_equal):
            b = _descend(p_top_c[:], p_top_k[:], p_mid, pt_t, qc, qk, or_equal)
            bc = _gather_cols(p_bot, b, 0, 2)
            bk = _gather_cols(p_bot, b, 2, 4)
            cnt = jnp.sum(
                _lex_le(bc, bk, qc, qk, or_equal), axis=1, keepdims=True
            ).astype(jnp.int32)
            return b * 128 + cnt

        def row(v):  # (Q,1) -> dense (Q/128, 128) output block
            return jnp.transpose(v, (1, 0)).reshape(Qn // 128, 128)

        qs = col(qs_ref)
        qe = col(qe_ref)
        lo_ref[:] = row(mbs_rank(qs))
        hi_ref[:] = row(mbs_rank(qe))
        plo = point_rank(qs + OH, False)  # side='left'
        phi = point_rank(qe - OH, True)  # side='right'

        # --- SpansPoint diff accumulated in place: +1 at plo, -1 at phi,
        # strand-based row, misses routed to the in-section trash slot pw-1
        # (identical to the XLA step's scatter targets) -------------------
        qt = col(qt_ref)
        ok = (qc >= 0) & ((qe - qs) >= 2 * OH)
        s_lo = qt * pw + jnp.where(ok, plo, pw - 1)
        s_hi = qt * pw + jnp.where(ok, phi, pw - 1)
        Q = qc.shape[0]
        col_l = jax.lax.broadcasted_iota(jnp.int32, (Q, 128), 1)
        b_lo = (col_l == (s_lo & 127)).astype(jnp.int8)
        b_hi = (col_l == (s_hi & 127)).astype(jnp.int8)
        r_lo = s_lo >> 7
        r_hi = s_hi >> 7
        # accumulate in row blocks: a full (Q, sp_rows) int32 iota would be
        # the kernel's largest VMEM tenant by far
        RB = 512
        for r0 in range(0, sp_rows, RB):
            rc = min(RB, sp_rows - r0)
            col_r = r0 + jax.lax.broadcasted_iota(jnp.int32, (Q, rc), 1)

            def part(rq, b):
                return jax.lax.dot_general(
                    (col_r == rq).astype(jnp.int8), b,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )

            sp_ref[r0 : r0 + rc, :] += part(r_lo, b_lo) - part(r_hi, b_hi)

    return kernel


def block_ranks_pallas(
    mbs_t: RankTables,
    pt_t: RankTables,
    blk_chrom,
    blk_start,
    blk_end,
    blk_strand,
    overhang: int,
    point_count: int,
    interpret: bool = False,
):
    """MBS ranks of both block edges + the complete SpansPoint diff section,
    in one fused kernel.

    Returns (lo, hi, spans) — lo/hi int32 (B,) raw MBS ranks (caller masks
    pad lanes exactly as with the XLA path); spans int32 (2*(point_count+1),)
    the fully-accumulated per-batch spans diff (+1 at plo, -1 at phi, strand
    rows, trash slot point_count), ready for a dense add into the counter
    section — spans never touch the sorted scatter path.
    """
    pw = point_count + 1
    sp_rows = _round_up(_round_up(2 * pw, 128) // 128, 8)
    # the kernel's scoped usage sits at ~16MB for mid-size tables (one-hot
    # gather intermediates) and the default 16MB cap is hair-trigger — some
    # table shapes (observed: 36k-intron 24-chrom maps) overflow it by a few
    # hundred KB.  Raise the cap for this kernel unconditionally: v5e has
    # 128MB VMEM and an unused allowance costs nothing.
    params = pltpu.CompilerParams(vmem_limit_bytes=32 << 20)
    qchunk = QCHUNK

    B = blk_chrom.shape[0]
    Bp = _round_up(B, qchunk)
    if Bp != B:
        padc = jnp.full(Bp - B, -1, jnp.int32)
        pad0 = jnp.zeros(Bp - B, jnp.int32)
        blk_chrom = jnp.concatenate([blk_chrom, padc])
        blk_start = jnp.concatenate([blk_start, pad0])
        blk_end = jnp.concatenate([blk_end, pad0])
        blk_strand = jnp.concatenate([blk_strand, pad0])
    n_chunks = Bp // qchunk
    QR = qchunk // 128  # dense query block rows

    qspec = pl.BlockSpec((QR, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    spspec = pl.BlockSpec((sp_rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    lo, hi, spans = pl.pallas_call(
        _make_kernel(mbs_t, pt_t, overhang, pw, sp_rows),
        grid=(n_chunks,),
        in_specs=[qspec] * 4 + [tspec] * 8,
        out_specs=(qspec, qspec, spspec),
        out_shape=(
            jax.ShapeDtypeStruct((Bp // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((Bp // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((sp_rows, 128), jnp.int32),
        ),
        compiler_params=params,
        interpret=interpret,
    )(
        blk_chrom.reshape(Bp // 128, 128),
        blk_start.reshape(Bp // 128, 128),
        blk_end.reshape(Bp // 128, 128),
        blk_strand.reshape(Bp // 128, 128),
        mbs_t.top_chrom, mbs_t.top_key, mbs_t.mid_cat, mbs_t.bot_cat,
        pt_t.top_chrom, pt_t.top_key, pt_t.mid_cat, pt_t.bot_cat,
    )
    return (
        lo.reshape(Bp)[:B],
        hi.reshape(Bp)[:B],
        spans.reshape(sp_rows * 128)[: 2 * pw],
    )
