"""Cross-process determinism smoke (parallel/multihost.py; SURVEY.md §5.8):
two coordinated CPU processes, each with 4 virtual devices, build one global
(dp=2, genome=4) mesh, count disjoint halves of the same read stream, and the
reassembled counters must equal the single-process run integer-exactly."""

import io
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, pickle, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
sys.path.insert(0, sys.argv[4])
sys.path.insert(0, os.path.join(sys.argv[4], "tests"))
import numpy as np

from irfinder_tpu.io.bampy import decode_bam
from irfinder_tpu.parallel.genome import (
    build_stacked_dref, init_dp_genome_counters, plan_shards,
)
from irfinder_tpu.parallel.multihost import global_mesh, host_local_batches, make_global_batch
from irfinder_tpu.parallel.shard import pad_batch_to_multiple
from irfinder_tpu.ops.step import count_step
from irfinder_tpu.refio.compile import compile_reference
from jax.sharding import NamedSharding, PartitionSpec as P
import jax.numpy as jnp
from test_oracle import CHROMS, CHROM_INDEX, ROIS, random_bam_bytes, toy_exons

ref = compile_reference(toy_exons(), chrom_order=CHROMS, rois=ROIS)
bam = random_bam_bytes(seed=31, n_frags=200)
n_dp, n_g = 2, 4
mesh = global_mesh(n_dp, n_g)
plan = plan_shards(ref, n_g)
sdref = build_stacked_dref(ref, plan)
sdref = jax.tree_util.tree_map(
    lambda v: jax.make_array_from_callback(
        v.shape, NamedSharding(mesh, P("genome")), lambda idx: np.asarray(v)[idx]
    ),
    sdref,
)
import numpy as np
counters = init_dp_genome_counters(sdref, len(CHROMS), n_dp, n_g)
counters = {
    k: jax.make_array_from_callback(
        v.shape, NamedSharding(mesh, P("dp", "genome")), lambda idx, v=v: np.asarray(v)[idx]
    )
    for k, v in counters.items()
}

def local(dref, c, batch):
    d = jax.tree_util.tree_map(lambda v: v[0], dref)
    cc = {k: v[0, 0] for k, v in c.items()}
    cc = count_step(d, cc, batch)
    return {k: v[None, None] for k, v in cc.items()}

def step(dref, c, batch):
    drspec = jax.tree_util.tree_map(lambda _: P("genome"), dref)
    cspec = {k: P("dp", "genome") for k in c}
    bspec = {k: P("dp") for k in batch}
    return jax.shard_map(local, mesh=mesh, in_specs=(drspec, cspec, bspec), out_specs=cspec, check_vma=False)(dref, c, batch)

jstep = jax.jit(step, donate_argnums=(1,))

import io as _io
hdr, batches, _ = decode_bam(_io.BytesIO(bam), CHROM_INDEX, cap_frags=64)
# every process feeds the SAME global batch (columns replicated row-block per
# dp shard half); host p supplies its half of the dp axis
from irfinder_tpu.engine import tally_junctions
from irfinder_tpu.junctions import JuncTally
tally = JuncTally()
for b in batches:
    tally_junctions(tally, b)
    arrs = pad_batch_to_multiple(b.device_arrays(), n_dp)
    halves = {k: np.array_split(v, 2)[jax.process_index()] for k, v in arrs.items()}
    gb = make_global_batch(mesh, halves)
    counters = jstep(sdref, counters, gb)

gather = jax.jit(lambda c: c, out_shardings=NamedSharding(mesh, P()))
res = {k: np.asarray(jax.device_get(gather(v))).sum(axis=0) for k, v in counters.items()}
if jax.process_index() == 0:
    with open(sys.argv[3], "wb") as fh:
        pickle.dump((res, tally), fh)
print("proc", jax.process_index(), "done", flush=True)
"""

import io as _io


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.mark.slow
def test_two_process_equals_single(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    out = tmp_path / "res.pkl"
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(i), str(out), repo],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]
    import pickle

    with open(out, "rb") as fh:
        got, tally = pickle.load(fh)

    # single-process truth over the virtual mesh in THIS process
    from irfinder_tpu.engine import Engine
    from irfinder_tpu.io.bampy import decode_bam
    from irfinder_tpu.parallel.genome import plan_shards, reassemble_counters
    from irfinder_tpu.refio.compile import compile_reference
    from test_oracle import CHROMS, CHROM_INDEX, ROIS, random_bam_bytes, toy_exons

    ref = compile_reference(toy_exons(), chrom_order=CHROMS, rois=ROIS)
    bam = random_bam_bytes(seed=31, n_frags=200)
    hdr, batches, _ = decode_bam(_io.BytesIO(bam), CHROM_INDEX, cap_frags=64)
    eng = Engine(ref)
    eng.reset(n_refids=len(hdr.ref_names))
    eng.run_stream(batches)
    want = eng.counters_host()

    from irfinder_tpu.finalize import junction_counters

    plan = plan_shards(ref, 4)
    got_fc = reassemble_counters(ref, plan, got, len(hdr.ref_names))
    sc, ec, xc = junction_counters(ref, tally)
    got_fc["start_cnt"], got_fc["end_cnt"], got_fc["exact_cnt"] = sc, ec, xc
    for k in want:
        np.testing.assert_array_equal(np.asarray(got_fc[k]), want[k], err_msg=k)
