import os, time, tempfile, cProfile, pstats
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from irfinder_tpu.engine import Engine, open_decoder
from irfinder_tpu.io import bamwrite
from irfinder_tpu.synth import synth_ref

n_pairs = 500_000
ref = synth_ref(n_genes=800)
rng = np.random.default_rng(0)
tmp = tempfile.mkdtemp(prefix="irprof_")
bam = os.path.join(tmp, "bench.bam")
with open(bam, "wb") as fh:
    recs = []
    starts = rng.integers(0, 45_000_000, n_pairs)
    for i in range(n_pairs):
        p1 = int(starts[i])
        recs.extend(bamwrite.make_pair(f"r{i}", 0, p1, "100M", p1 + 250, "100M"))
    bamwrite.write_bam(fh, ["chr21"], [46_000_000], recs)

eng = Engine(ref)
header, batches, stats = open_decoder(ref, bam, 1<<15, True, 4)
eng.reset(n_refids=len(header.ref_names))
eng.run_stream(batches)
# warm compile of finalize paths
res = eng.results()
# timed pass
t0 = time.perf_counter(); fc = eng.counters_host(); t1 = time.perf_counter()
pr = cProfile.Profile(); pr.enable()
res = eng.results(fc)
pr.disable()
t2 = time.perf_counter()
print("counters_host", t1-t0, "results", t2-t1)
pstats.Stats(pr).sort_stats("cumulative").print_stats(18)
