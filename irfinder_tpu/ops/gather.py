"""Pallas TPU windowed gather — `table[idx]` for nearly-sorted index streams.

Why: XLA lowers a large dynamic gather on TPU to a near-serial lookup loop —
measured ~20 ns/element regardless of locality, which made the single
`depth[src]` gather the dominant cost of the device finalize-statistics
expansion at whole-genome scale (~380M lookups ≈ 8 s/sample; see
ops/finalize_stats._hist_jit).

The finalize flat-base list is *piecewise-sequential*: src is a
concatenation of per-run consecutive MBS ranges in intron-major order, so
any GW consecutive flat positions read from a narrow band of the table.
That locality turns the gather into a TPU-native two-stage one-hot matmul:

1. per grid step, DMA the 128x128 table window covering the block's band
   into VMEM (the window base per block is a static function of the run
   tables — the host precomputes it in ops/finalize_stats._build_subset);
2. split the window into two int8 planes (values are pre-clipped to
   [0, 2047], so lo7 = v & 127 and hi = v >> 7 both fit signed int8
   unbiased) and gather each query's row with a one-hot int8 MXU matmul,
   then select its lane with a masked row-sum — the same gather-by-
   contraction pattern as ops/pallas_rank, at window scale.

Blocks whose index band exceeds the window (possible when many distantly-
overlapping introns meet in one block) are computed with garbage here and
patched afterwards by the caller with a small XLA gather over just those
positions — the host knows the bad block list statically.

Bit-exactness: the one-hot contraction touches each selected int8 plane
value exactly once with weight 1, and int8 x int8 -> int32 MXU accumulation
is exact, so the result equals `table[idx]` exactly (tested against
jnp.take in tests/test_gather.py).

Reference parity: this is pure TPU plumbing with no reference analog — the
historical CoverageBlocksIRFinder (SURVEY.md §2 row 12 [R]) walks per-base
depth arrays directly on the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: flat positions per grid step
GW = 4096
#: table window rows (SROWS*128 entries) DMA'd per grid step
SROWS = 128
#: maximum (max(src) - row_aligned_base*128) a block may span and still be
#: gathered in-window
SPAN = SROWS * 128


def _gather_kernel(cur_ref, nxt_ref, src_ref, tbl_hbm, out_ref, win, sem):
    b = pl.program_id(0)
    nblk = pl.num_programs(0)
    slot = b % 2
    nslot = 1 - slot

    # double-buffered window stream across grid steps: step b+1's table
    # window DMA (base from nxt_ref) overlaps step b's matmuls
    @pl.when(b == 0)
    def _first():
        pltpu.make_async_copy(
            tbl_hbm.at[pl.ds(cur_ref[0, 0], SROWS)], win.at[slot], sem.at[slot]
        ).start()

    @pl.when(b + 1 < nblk)
    def _next():
        pltpu.make_async_copy(
            tbl_hbm.at[pl.ds(nxt_ref[0, 0], SROWS)], win.at[nslot], sem.at[nslot]
        ).start()

    pltpu.make_async_copy(
        tbl_hbm.at[pl.ds(cur_ref[0, 0], SROWS)], win.at[slot], sem.at[slot]
    ).wait()

    # dense (GW/128, 128) src block -> sublane-per-query (GW, 1)
    src = jnp.transpose(src_ref[:].reshape(1, GW), (1, 0))
    il = jnp.clip(src - cur_ref[0, 0] * 128, 0, SROWS * 128 - 1)
    q = il >> 7  # (GW, 1) window row
    rem = il & 127  # (GW, 1) window lane

    w = win[slot]  # (SROWS, 128) int32, values in [0, 2047]
    lo7 = (w & 127).astype(jnp.int8)
    hi = (w >> 7).astype(jnp.int8)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (GW, SROWS), 1)
    oh = (row_iota == q).astype(jnp.int8)  # exactly one 1 per query row

    def mm(plane):
        return jax.lax.dot_general(
            oh, plane,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    m = mm(lo7) + (mm(hi) << 7)  # (GW, 128) gathered rows
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (GW, 128), 1)
    vals = jnp.sum(jnp.where(lane_iota == rem, m, 0), axis=1, keepdims=True)
    out_ref[:] = jnp.transpose(vals, (1, 0)).reshape(GW // 128, 128)


def gather_window(tbl, src, blk_base, interpret: bool = False):
    """tbl[src] where src is block-bandlimited.

    tbl: int32 (M,) values in [0, 2047] (two unbiased int8 planes).
    src: int32 (F_pad,), F_pad a GW multiple; every in-bounds position of
         block b must satisfy blk_base[b]*128 <= src < blk_base[b]*128+SPAN.
         Positions violating the band produce garbage (caller patches).
    blk_base: int32 (nblk+1, 1) row-aligned window base per block, clamped
         to [0, Mrows-SROWS] by the host; one trailing pad row (the kernel
         prefetches block b+1's base during block b).
    Returns int32 (F_pad,).
    """
    F_pad = src.shape[0]
    assert F_pad % GW == 0
    nblk = F_pad // GW
    M = tbl.shape[0]
    mrows = max(-(-M // 128), SROWS)
    tblp = jnp.pad(tbl, (0, mrows * 128 - M)).reshape(mrows, 128)

    out = pl.pallas_call(
        _gather_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda b: (b + 1, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((GW // 128, 128), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((GW // 128, 128), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F_pad // 128, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, SROWS, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 << 20),
        interpret=interpret,
    )(blk_base, blk_base, src.reshape(F_pad // 128, 128), tblp)
    return out.reshape(F_pad)
