"""The jitted per-batch counting step — the engine's "processor chain".

The reference invoked four virtual processors serially per fragment
(SURVEY.md §2 row 9, historical ReadBlockProcessor::ProcessBlocks [R]); here
all of them are one XLA program over a whole PackedBatch:

* CoverageBlocks  -> two scatter-adds per block into a depth *diff* array over
  measured-base space (exclusion masking is pure rank arithmetic, see
  refio/compile.py); depth itself is recovered by one cumsum at finalize.
* JunctionCount   -> lexicographic binary search of each splice gap against
  the unique intron start / end / (start,end) tables + scatter-add.
* SpansPoint      -> rank-range of each block against the boundary-point table
  as another diff array (+1 at the first spanned point, -1 past the last).
* FragmentsInROI / FragmentsInChr -> broadcast overlap / refid scatter.

Everything is integer, every scatter is add-associative, and padding lanes are
routed to a trash slot — so counters are invariant under batch order, batch
size, and shard count (the determinism contract of SURVEY.md §5.8).

Counters live in device memory across batches; the step donates its counter
argument so XLA updates them in place (no HBM round-trip per batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import semantics as S
from .device_ref import DeviceRef, mbs_rank
from .search import searchsorted_lex


def init_counters(dref: DeviceRef, n_refids: int) -> dict:
    """Zero counters shaped by the device ref.  The +1 on every axis is the
    trash slot (dropped at finalize)."""
    sz = dref.sizes()
    z = lambda *shape: jnp.zeros(shape, dtype=jnp.int32)
    return {
        "ddiff": z(2, dref.mbs_size + 1),
        "start_cnt": z(2, sz["S"] + 1),
        "end_cnt": z(2, sz["E"] + 1),
        "exact_cnt": z(2, sz["X"] + 1),
        "sdiff": z(2, sz["P"] + 1),
        "roi_cnt": z(2, sz["R"] + 1),
        "chr_frag": z(n_refids + 1),
        "n_frags": jnp.zeros((), dtype=jnp.int32),
    }


def _match_index(chrom_col, *coord_cols, query_chrom, query_coords, trash):
    """Exact-match lookup into a sentinel-padded sorted table: the matching
    row index, or `trash` for misses / pad lanes."""
    j = searchsorted_lex(
        (chrom_col, *coord_cols), (query_chrom, *query_coords), side="left"
    )
    hit = jnp.take(chrom_col, j, mode="clip") == query_chrom
    for col, q in zip(coord_cols, query_coords):
        hit = hit & (jnp.take(col, j, mode="clip") == q)
    return jnp.where(hit, j, trash)


def count_step(dref: DeviceRef, counters: dict, batch: dict) -> dict:
    """One PackedBatch through every counter.  Pure function; jit with
    donate_argnums=(1,) via make_count_step()."""
    sz = dref.sizes()
    one = jnp.int32(1)

    # --- CoverageBlocks: depth diff over MBS ------------------------------
    blk_c, blk_s, blk_e = batch["blk_chrom"], batch["blk_start"], batch["blk_end"]
    blk_st = batch["blk_strand"]
    lo = mbs_rank(dref, blk_c, blk_s)
    hi = mbs_rank(dref, blk_c, blk_e)
    ddiff = counters["ddiff"].at[blk_st, lo].add(one).at[blk_st, hi].add(-one)

    # --- JunctionCount: gap boundary / exact matching ----------------------
    gap_c, gap_s, gap_e = batch["gap_chrom"], batch["gap_start"], batch["gap_end"]
    gap_st = batch["gap_strand"]
    si = _match_index(
        dref.bstart_chrom, dref.bstart_coord,
        query_chrom=gap_c, query_coords=(gap_s,), trash=sz["S"],
    )
    ei = _match_index(
        dref.bend_chrom, dref.bend_coord,
        query_chrom=gap_c, query_coords=(gap_e,), trash=sz["E"],
    )
    xi = _match_index(
        dref.pair_chrom, dref.pair_start, dref.pair_end,
        query_chrom=gap_c, query_coords=(gap_s, gap_e), trash=sz["X"],
    )
    start_cnt = counters["start_cnt"].at[gap_st, si].add(one)
    end_cnt = counters["end_cnt"].at[gap_st, ei].add(one)
    exact_cnt = counters["exact_cnt"].at[gap_st, xi].add(one)

    # --- SpansPoint: rank-range diff over the boundary-point table ---------
    OH = jnp.int32(S.SPANS_OVERHANG)
    keys = (dref.point_chrom, dref.point_coord)
    plo = searchsorted_lex(keys, (blk_c, blk_s + OH), side="left")
    phi = searchsorted_lex(keys, (blk_c, blk_e - OH), side="right")
    ok = (blk_c >= 0) & (blk_e - blk_s >= 2 * OH)
    plo = jnp.where(ok, plo, sz["P"])
    phi = jnp.where(ok, phi, sz["P"])
    sdiff = counters["sdiff"].at[blk_st, plo].add(one).at[blk_st, phi].add(-one)

    # --- FragmentsInROI: broadcast interval overlap -------------------------
    f_c, f_s, f_e = batch["frag_chrom"], batch["frag_start"], batch["frag_end"]
    f_st, f_rid = batch["frag_strand"], batch["frag_refid"]
    overlap = (
        (f_c[:, None] == dref.roi_chrom[None, :-1])
        & (dref.roi_start[None, :-1] < f_e[:, None])
        & (f_s[:, None] < dref.roi_end[None, :-1])
    )
    hits0 = jnp.sum(overlap & (f_st == 0)[:, None], axis=0, dtype=jnp.int32)
    hits1 = jnp.sum(overlap & (f_st == 1)[:, None], axis=0, dtype=jnp.int32)
    roi_cnt = counters["roi_cnt"].at[0, : sz["R"]].add(hits0).at[1, : sz["R"]].add(hits1)

    # --- FragmentsInChr + totals -------------------------------------------
    n_refids = counters["chr_frag"].shape[0] - 1
    rid = jnp.where((f_rid >= 0) & (f_rid < n_refids), f_rid, n_refids)
    chr_frag = counters["chr_frag"].at[rid].add(one)
    n_frags = counters["n_frags"] + jnp.sum(f_rid >= 0, dtype=jnp.int32)

    return {
        "ddiff": ddiff,
        "start_cnt": start_cnt,
        "end_cnt": end_cnt,
        "exact_cnt": exact_cnt,
        "sdiff": sdiff,
        "roi_cnt": roi_cnt,
        "chr_frag": chr_frag,
        "n_frags": n_frags,
    }


def make_count_step():
    """Jitted step with in-place counter donation."""
    return jax.jit(count_step, donate_argnums=(1,))


def finalize_device(counters: dict) -> dict:
    """Diff arrays -> dense counters (one cumsum each), trash slots dropped.
    Jittable; cheap enough to run once at end-of-stream."""
    depth = jnp.cumsum(counters["ddiff"], axis=1)[:, :-1]
    span_hits = jnp.cumsum(counters["sdiff"], axis=1)[:, :-1]
    return {
        "depth": depth,
        "start_cnt": counters["start_cnt"][:, :-1],
        "end_cnt": counters["end_cnt"][:, :-1],
        "exact_cnt": counters["exact_cnt"][:, :-1],
        "span_hits": span_hits,
        "roi_cnt": counters["roi_cnt"][:, :-1],
        "chr_frag": counters["chr_frag"][:-1],
        "n_frags": counters["n_frags"],
    }
