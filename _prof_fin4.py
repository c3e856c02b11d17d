import os, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from irfinder_tpu.synth import synth_ref
from irfinder_tpu.ops import finalize_stats as FS

ref = synth_ref(n_genes=800)
finref = FS.build_finalize_ref(ref)
mbs = int(finref.run_hi.max())
print("MBS", mbs, "runs", finref.run_lo.shape, "subsets", {k: (finref.subsets[k].introns.size, finref.subsets[k].flat_src.shape, finref.subsets[k].hist_len) for k in FS._SUBSET_ORDER})
rng = np.random.default_rng(0)
depth = jax.device_put(rng.integers(0, 50, (2, mbs)).astype(np.int32))
tabs = FS._stats_tables_dev(finref)

def timeit(f, n=3):
    out = f(); np.asarray(jax.tree_util.tree_leaves(out)[0][...])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); out = f()
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
        ts.append(time.perf_counter()-t0)
    return min(ts)

dsum = depth[0] + depth[1]
print("device_sums:", timeit(lambda: FS._device_sums(dsum, tabs["run_lo"], tabs["run_hi"], tabs["fw_lo"], tabs["fw_hi"], tabs["lw_lo"], tabs["lw_hi"])))
for k in FS._SUBSET_ORDER:
    sub = finref.subsets[k]
    if not sub.introns.size: continue
    t = tabs[k]
    print(k, "hist:", timeit(lambda: FS._hist_jit(dsum, t["flat_src"], t["flat_base"], t["tile_offs"], t["ridx"], n_sub=sub.introns.size, hist_len=sub.hist_len, cap=FS.CAP, interpret=False)))
fn = FS._all_stats_fn(finref, False)
print("full fused:", timeit(lambda: fn(depth, jnp.int32(0), tabs)))
