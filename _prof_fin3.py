import os, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from irfinder_tpu.synth import synth_ref, synth_batch_arrays
from irfinder_tpu.ops.device_ref import build_device_ref
from irfinder_tpu.ops.step import init_counters, make_count_step, finalize_device
from irfinder_tpu.ops import finalize_stats as FS

ref = synth_ref(n_genes=800)
dref = build_device_ref(ref)
step = make_count_step()
from irfinder_tpu.io.batch import device_batch
arrs, n_reads = synth_batch_arrays(ref, n_frags=1<<15, seed=1)
b = {k: jax.device_put(v) for k, v in device_batch(arrs).items()}
counters = init_counters(dref, n_refids=len(ref.chroms))
counters = step(dref, counters, b)
finj = jax.jit(finalize_device)
fin = finj(dref, counters)
finref = FS.build_finalize_ref(ref)
fn = FS._all_stats_fn(finref, False)
tabs = FS._stats_tables_dev(finref)
packed = fn(fin["depth"], jnp.int32(0), tabs)
_ = np.asarray(packed)
print("packed size:", packed.shape, packed.dtype, packed.nbytes/1e6, "MB")
for rep in range(3):
    t0 = time.perf_counter()
    packed = fn(fin["depth"], jnp.int32(0), tabs)
    t1 = time.perf_counter()
    head = np.asarray(packed[0:1])   # waits for compute, tiny transfer
    t2 = time.perf_counter()
    full = np.asarray(packed)        # transfer-only (already computed)
    t3 = time.perf_counter()
    print({"dispatch": t1-t0, "compute+rt": t2-t1, "full_d2h": t3-t2})
# round-trip latency probe
x = jax.device_put(np.zeros(1, np.int32))
for rep in range(3):
    t0=time.perf_counter(); np.asarray(x); t1=time.perf_counter()
    print("tiny D2H round trip:", t1-t0)
