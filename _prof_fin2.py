import os, time, tempfile
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from irfinder_tpu.engine import Engine, open_decoder
from irfinder_tpu.finalize import intron_rows, junction_counters, detect_directionality
from irfinder_tpu.io import bamwrite
from irfinder_tpu.synth import synth_ref
from irfinder_tpu.ops import finalize_stats as FS

n_pairs = 250_000
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
eng.results()  # warm
for rep in range(2):
    st = eng._st
    t0 = time.perf_counter()
    fin = eng._finalize(eng.dref, st.counters)
    t1 = time.perf_counter()
    sc, ec, xc = junction_counters(eng.ref, st.junc_tally)
    stranded, flip, frac, n_inf = detect_directionality(eng.ref, xc)
    t2 = time.perf_counter()
    pend = FS.device_all_stats_async(eng.ref, eng._finref, fin["depth"], bool(flip))
    t3 = time.perf_counter()
    fc = {k: (None if k == "depth" else np.asarray(v)) for k, v in fin.items()}
    fc["start_cnt"], fc["end_cnt"], fc["exact_cnt"] = sc, ec, xc
    t4 = time.perf_counter()
    cache = pend()
    t5 = time.perf_counter()
    args = (eng.ref, None, sc, ec, xc, fc["span_hits"])
    rn = intron_rows(*args, mode="nondir", stats_cache=cache)
    rd = intron_rows(*args, mode="dir", flip_strand=flip, stats_cache=cache)
    t6 = time.perf_counter()
    print({"fin_dispatch": t1-t0, "junc": t2-t1, "stats_dispatch": t3-t2,
           "fin_pulls": t4-t3, "stats_block": t5-t4, "rows": t6-t5, "total": t6-t0})
