"""Shard-count invariance: 1 device ≡ 8 devices, bit-exactly (SURVEY.md §4
item 3-4).  Runs on the virtual 8-device CPU mesh from conftest."""

import io

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from irfinder_tpu.engine import Engine
from irfinder_tpu.io.bampy import decode_bam
from irfinder_tpu.ops.device_ref import build_device_ref
from irfinder_tpu.ops.step import finalize_device
from irfinder_tpu.parallel.shard import (
    make_sharded_step,
    merge_stacked,
    stacked_counters,
)
from irfinder_tpu.refio.compile import compile_reference

from test_oracle import CHROM_INDEX, CHROMS, ROIS, random_bam_bytes, toy_exons


@pytest.fixture(scope="module")
def ref():
    return compile_reference(toy_exons(), chrom_order=CHROMS, rois=ROIS)


def test_dp8_matches_single_device(ref):
    bam = random_bam_bytes(seed=11, n_frags=200)

    # single-device engine
    hdr, batches, _ = decode_bam(io.BytesIO(bam), CHROM_INDEX)
    eng = Engine(ref)
    eng.reset(n_refids=len(hdr.ref_names))
    eng.run_stream(batches)
    want = eng.counters_host()

    # 8-way data-parallel; junction counting is host-side (ops/step.py), so
    # the sharded path tallies identically before device dispatch
    from irfinder_tpu.engine import tally_junctions
    from irfinder_tpu.junctions import JuncTally
    from irfinder_tpu.finalize import junction_counters

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("dp",))
    dref = build_device_ref(ref)
    step, place_batch, place_counters = make_sharded_step(mesh)
    counters = place_counters(stacked_counters(dref, len(hdr.ref_names), 8))
    _, batches, _ = decode_bam(io.BytesIO(bam), CHROM_INDEX)
    tally = JuncTally()
    for b in batches:
        tally_junctions(tally, b)
        counters = step(dref, counters, place_batch(b.device_arrays()))
    merged = merge_stacked(counters)
    got = {k: np.asarray(v) for k, v in jax.jit(finalize_device)(dref, merged).items()}
    got["start_cnt"], got["end_cnt"], got["exact_cnt"] = junction_counters(ref, tally)

    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)
