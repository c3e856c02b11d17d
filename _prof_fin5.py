import os, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from irfinder_tpu.synth import synth_ref
from irfinder_tpu.ops import finalize_stats as FS
from irfinder_tpu.ops.scatter import hist_scatter_pallas

ref = synth_ref(n_genes=800)
finref = FS.build_finalize_ref(ref)
mbs = int(finref.run_hi.max())
rng = np.random.default_rng(0)
dsum = jax.device_put(rng.integers(0, 50, mbs).astype(np.int32))
tabs = FS._stats_tables_dev(finref)
sub = finref.subsets["both"]; t = tabs["both"]

take_j = jax.jit(lambda d, s: jnp.take(d, s))
hidx_j = jax.jit(lambda d, s, b: b + jnp.clip(jnp.take(d, s), 0, FS.CAP-1))
hist_j = jax.jit(lambda h, i, o: hist_scatter_pallas(h, i, o))
xla_hist_j = jax.jit(lambda h, i: h.at[i].add(1))

def timeit(f, n=3):
    out = f(); np.asarray(out.ravel()[0:1])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); out = f(); np.asarray(out.ravel()[0:1]); ts.append(time.perf_counter()-t0)
    return min(ts)

print("CAP", FS.CAP, "N", t["flat_src"].shape, "hist_len", sub.hist_len)
print("take:", timeit(lambda: take_j(dsum, t["flat_src"])))
hidx = hidx_j(dsum, t["flat_src"], t["flat_base"]); np.asarray(hidx[0:1])
print("hidx (take+clip+add):", timeit(lambda: hidx_j(dsum, t["flat_src"], t["flat_base"])))
h0 = jnp.zeros(sub.hist_len, jnp.int32)
print("pallas hist:", timeit(lambda: hist_j(h0, hidx, t["tile_offs"])))
print("xla hist:", timeit(lambda: xla_hist_j(h0, hidx)))
