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

1. per grid step, derive the block's window base from min(src_block) and
   DMA the SROWS x 128 table window covering its band into VMEM (the DMA
   overlaps the one-hot mask construction, which does not need the window);
2. split the window into two int8 planes (values are pre-clipped to
   [0, 2047], so lo7 = v & 127 and hi = v >> 7 both fit signed int8
   unbiased) and gather each query's row with a one-hot int8 MXU matmul,
   then select its lane with a masked row-sum — the same gather-by-
   contraction pattern as ops/pallas_rank, at window scale.

Blocks whose index band exceeds the window (possible when many distantly-
overlapping introns meet in one block) produce garbage here and are patched
afterwards by the caller with a small XLA gather over just those positions —
the bad-block list is a static property of the run tables, computed by the
host in ops/finalize_stats._gather_meta with the same base formula
(clip(min_src >> 7, 0, mrows - SROWS)) this kernel derives.

Bit-exactness: the one-hot contraction touches each selected int8 plane
value exactly once with weight 1, and int8 x int8 -> int32 MXU accumulation
is exact, so the result equals `table[idx]` exactly (tested against
jnp.take in tests/test_gather.py).

Reference parity: pure TPU plumbing with no reference analog — the
historical CoverageBlocksIRFinder (SURVEY.md §2 row 12 [R]) walks per-base
depth arrays directly on the host.
"""

from __future__ import annotations

import functools

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


def _make_kernel(mrows: int):
    def kernel(src_ref, tbl_hbm, out_ref, win, sem):
        # dense (GW/128, 128) src block -> sublane-per-query (GW, 1)
        src = jnp.transpose(src_ref[:].reshape(1, GW), (1, 0))
        base = jnp.clip(jnp.min(src) >> 7, 0, mrows - SROWS)
        cp = pltpu.make_async_copy(tbl_hbm.at[pl.ds(base, SROWS)], win, sem)
        cp.start()

        # window-independent work overlaps the DMA
        il = jnp.clip(src - base * 128, 0, SROWS * 128 - 1)
        q = il >> 7  # (GW, 1) window row
        rem = il & 127  # (GW, 1) window lane
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (GW, SROWS), 1)
        oh = (row_iota == q).astype(jnp.int8)  # exactly one 1 per query row
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (GW, 128), 1)
        lane_oh = lane_iota == rem

        cp.wait()
        w = win[...]  # (SROWS, 128) int32, values in [0, 2047]
        lo7 = (w & 127).astype(jnp.int8)
        hi = (w >> 7).astype(jnp.int8)

        def mm(plane):
            return jax.lax.dot_general(
                oh, plane,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        m = mm(lo7) + (mm(hi) << 7)  # (GW, 128) gathered rows
        vals = jnp.sum(jnp.where(lane_oh, m, 0), axis=1, keepdims=True)
        out_ref[:] = jnp.transpose(vals, (1, 0)).reshape(GW // 128, 128)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_window(tbl, src, interpret: bool = False):
    """tbl[src] where src is block-bandlimited.

    tbl: int32 (M,) values in [0, 2047] (two unbiased int8 planes).
    src: int32 (F_pad,), F_pad a GW multiple; in-bounds entries must lie in
         [0, M).  Every position of block b must satisfy
         base_b*128 <= src < base_b*128 + SPAN with
         base_b = clip(min(src_block) >> 7, 0, mrows - SROWS); positions
         violating the band produce garbage (the caller patches them — the
         bad-block list is static, see finalize_stats._gather_meta).
    Returns int32 (F_pad,).
    """
    F_pad = src.shape[0]
    assert F_pad % GW == 0
    nblk = F_pad // GW
    M = tbl.shape[0]
    mrows = max(-(-M // 128), SROWS)
    tblp = jnp.pad(tbl, (0, mrows * 128 - M)).reshape(mrows, 128)

    out = pl.pallas_call(
        _make_kernel(mrows),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((GW // 128, 128), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((GW // 128, 128), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F_pad // 128, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((SROWS, 128), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 << 20),
        interpret=interpret,
    )(src.reshape(F_pad // 128, 128), tblp)
    return out.reshape(F_pad)
