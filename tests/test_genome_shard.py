"""Genome-axis map sharding (parallel/genome.py): a chrom-sharded run over
the virtual CPU mesh must reproduce the unsharded counters integer-exactly
(SURVEY.md §5.7; BASELINE configs C/E)."""

import io

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from irfinder_tpu.engine import Engine, tally_junctions
from irfinder_tpu.junctions import JuncTally
from irfinder_tpu.finalize import junction_counters
from irfinder_tpu.io.bampy import decode_bam
from irfinder_tpu.parallel.genome import (
    build_stacked_dref,
    init_stacked_counters,
    make_genome_sharded_step,
    plan_shards,
    reassemble_counters,
    slice_ref,
)
from irfinder_tpu.refio.compile import compile_reference
from irfinder_tpu.synth import synth_ref

from test_oracle import CHROMS, CHROM_INDEX, ROIS, random_bam_bytes, toy_exons


@pytest.fixture(scope="module")
def ref():
    return compile_reference(toy_exons(), chrom_order=CHROMS, rois=ROIS)


def test_plan_and_slice_roundtrip():
    ref = synth_ref(n_genes=40, n_chroms=5)
    plan = plan_shards(ref, 3)
    assert plan.bounds[0] == 0 and plan.bounds[-1] == ref.n_chroms
    assert len(plan.bounds) == 4
    # slices tile the tables exactly
    tot_introns = sum(
        slice_ref(ref, plan.bounds[i], plan.bounds[i + 1]).n_introns for i in range(3)
    )
    assert tot_introns == ref.n_introns
    tot_mbs = sum(r["mbs"] for r in plan.real)
    assert tot_mbs == ref.mbs_size


@pytest.mark.parametrize("n_shards", [2, 4])
def test_genome_sharded_equals_unsharded(ref, n_shards):
    bam = random_bam_bytes(seed=21, n_frags=250)

    # unsharded truth
    hdr, batches, _ = decode_bam(io.BytesIO(bam), CHROM_INDEX)
    eng = Engine(ref)
    eng.reset(n_refids=len(hdr.ref_names))
    eng.run_stream(batches)
    want = eng.counters_host()

    # genome-sharded
    plan = plan_shards(ref, n_shards)
    sdref = build_stacked_dref(ref, plan)
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("genome",))
    step, place = make_genome_sharded_step(mesh)
    counters = place(init_stacked_counters(sdref, len(hdr.ref_names), n_shards))
    sdref = place(sdref)
    _, batches, _ = decode_bam(io.BytesIO(bam), CHROM_INDEX)
    tally = JuncTally()
    for b in batches:
        tally_junctions(tally, b)
        counters = step(sdref, counters, b.device_arrays())
    got = reassemble_counters(ref, plan, counters, len(hdr.ref_names))
    got["start_cnt"], got["end_cnt"], got["exact_cnt"] = junction_counters(ref, tally)

    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), want[k], err_msg=k)


def test_dp_x_genome_composed_equals_unsharded(ref):
    from irfinder_tpu.parallel.genome import (
        init_dp_genome_counters,
        make_dp_genome_step,
        merge_dp,
    )
    from irfinder_tpu.parallel.shard import pad_batch_to_multiple

    bam = random_bam_bytes(seed=23, n_frags=300)
    hdr, batches, _ = decode_bam(io.BytesIO(bam), CHROM_INDEX)
    eng = Engine(ref)
    eng.reset(n_refids=len(hdr.ref_names))
    eng.run_stream(batches)
    want = eng.counters_host()

    n_dp, n_g = 2, 4
    plan = plan_shards(ref, n_g)
    sdref = build_stacked_dref(ref, plan)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(n_dp, n_g), ("dp", "genome"))
    step, place_dref, place_c, place_b = make_dp_genome_step(mesh)
    counters = place_c(init_dp_genome_counters(sdref, len(hdr.ref_names), n_dp, n_g))
    sdref = place_dref(sdref)
    _, batches, _ = decode_bam(io.BytesIO(bam), CHROM_INDEX)
    tally = JuncTally()
    for b in batches:
        tally_junctions(tally, b)
        counters = step(sdref, counters, place_b(pad_batch_to_multiple(b.device_arrays(), n_dp)))
    per_shard = merge_dp(counters)
    got = reassemble_counters(ref, plan, per_shard, len(hdr.ref_names))
    got["start_cnt"], got["end_cnt"], got["exact_cnt"] = junction_counters(ref, tally)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), want[k], err_msg=k)


def test_dp_x_genome_routed_equals_unsharded(ref):
    """Host-routed batches (each genome shard only sees its own chroms'
    reads) produce integer-identical counters to the replicated path and the
    unsharded engine (VERDICT round 1, next-round #5)."""
    from irfinder_tpu.parallel.genome import (
        init_dp_genome_counters,
        make_dp_genome_step,
        merge_dp,
        route_flat_batch,
    )
    from irfinder_tpu.parallel.shard import pad_batch_to_multiple

    bam = random_bam_bytes(seed=29, n_frags=300)
    hdr, batches, _ = decode_bam(io.BytesIO(bam), CHROM_INDEX)
    eng = Engine(ref)
    eng.reset(n_refids=len(hdr.ref_names))
    eng.run_stream(batches)
    want = eng.counters_host()

    n_dp, n_g = 2, 4
    plan = plan_shards(ref, n_g)
    sdref = build_stacked_dref(ref, plan)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(n_dp, n_g), ("dp", "genome"))
    step, place_dref, place_c, place_b = make_dp_genome_step(mesh, routed=True)
    counters = place_c(init_dp_genome_counters(sdref, len(hdr.ref_names), n_dp, n_g))
    sdref = place_dref(sdref)
    _, batches, _ = decode_bam(io.BytesIO(bam), CHROM_INDEX)
    tally = JuncTally()
    total_cells = 0
    for b in batches:
        tally_junctions(tally, b)
        routed, cellcnt = route_flat_batch(
            plan, pad_batch_to_multiple(b.device_arrays(), n_dp), n_dp, n_g
        )
        total_cells += int(cellcnt.sum())
        counters = step(sdref, counters, place_b(routed))
    per_shard = merge_dp(counters)
    got = reassemble_counters(ref, plan, per_shard, len(hdr.ref_names), routed=True)
    got["start_cnt"], got["end_cnt"], got["exact_cnt"] = junction_counters(ref, tally)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), want[k], err_msg=k)
    assert total_cells == int(np.asarray(want["n_frags"]))
