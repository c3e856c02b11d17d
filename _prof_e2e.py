import os, time, tempfile, json
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from irfinder_tpu.engine import run_bam
from irfinder_tpu.io import bamwrite
from irfinder_tpu.synth import synth_ref

n_pairs = 500_000
ref = synth_ref(n_genes=800)
rng = np.random.default_rng(0)
tmp = tempfile.mkdtemp(prefix="irprof_")
bam = os.path.join(tmp, "bench.bam")
t0 = time.perf_counter()
with open(bam, "wb") as fh:
    recs = []
    starts = rng.integers(0, 45_000_000, n_pairs)
    for i in range(n_pairs):
        p1 = int(starts[i])
        recs.extend(bamwrite.make_pair(f"r{i}", 0, p1, "100M", p1 + 250, "100M"))
    bamwrite.write_bam(fh, ["chr21"], [46_000_000], recs)
print("bam write", time.perf_counter()-t0)
run_bam(ref, bam, os.path.join(tmp, "warm"))
t0 = time.perf_counter()
m = run_bam(ref, bam, os.path.join(tmp, "out"))
dt = time.perf_counter()-t0
print(json.dumps({"total_s": dt, "decode_s": m.decode_s, "device_s": m.device_s,
                  "finalize_s": m.finalize_s, "batches": m.batches,
                  "reads": m.reads_total, "rps": m.reads_total/dt}))
