"""FastQ --stream throughput (round-2 verdict next-round #6): the streaming
pure-Python decoder counting off a PIPE (the `FastQ --stream` path, which
overlaps counting with alignment) vs the native-decoder file path, on the
same realistic-mix BAM.  Quantifies the mode's contract: --stream only
overlaps alignment usefully when the aligner emits records slower than the
streaming decoder consumes them — this prints that ceiling.

  python bench/stream_throughput.py            # 1M pairs (~2M records)
  STREAM_PAIRS=250000 python bench/stream_throughput.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = os.environ.get("BENCH_CACHE", os.path.expanduser("~/.cache/irfinder_bench"))


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))

    from irfinder_tpu.engine import run_bam
    from irfinder_tpu.io.bamgen import write_realistic_bam
    from irfinder_tpu.io.bampy import decode_bam
    from irfinder_tpu.synth import synth_ref

    n_pairs = int(os.environ.get("STREAM_PAIRS", 1_000_000))
    ref = synth_ref(n_genes=1200, n_chroms=8, chrom_len=40_000_000, seed=5)
    os.makedirs(CACHE, exist_ok=True)
    bam = os.path.join(CACHE, f"stream_p{n_pairs}_v1.bam")
    if not os.path.exists(bam):
        st = write_realistic_bam(bam + ".tmp", ref, n_pairs=n_pairs, seed=8)
        os.replace(bam + ".tmp", bam)
        print(f"[stream] generated {st.n_records} records", file=sys.stderr)

    out = {}

    # 1) decode-only ceiling of the streaming Python decoder off a pipe
    cat = subprocess.Popen(["cat", bam], stdout=subprocess.PIPE)
    ci = {c: i for i, c in enumerate(ref.chroms)}
    t0 = time.perf_counter()
    _, batches, stats = decode_bam(cat.stdout, ci)
    for _ in batches:
        pass
    dt = time.perf_counter() - t0
    cat.stdout.close()
    cat.wait()
    out["stream_decode_only_reads_per_s"] = round(stats.reads_total / dt, 1)
    out["n_reads"] = stats.reads_total

    # 2) the full --stream path: pipe -> streaming decoder -> count -> tables
    cat = subprocess.Popen(["cat", bam], stdout=subprocess.PIPE)
    t0 = time.perf_counter()
    m = run_bam(ref, cat.stdout, os.path.join(CACHE, "stream_out"))
    dt = time.perf_counter() - t0
    cat.stdout.close()
    cat.wait()
    out["stream_e2e_reads_per_s"] = round(m.reads_total / dt, 1)

    # 3) the native file path on the same BAM (the non-stream FastQ spool)
    t0 = time.perf_counter()
    m = run_bam(ref, bam, os.path.join(CACHE, "native_out"))
    dt = time.perf_counter() - t0
    out["native_file_e2e_reads_per_s"] = round(m.reads_total / dt, 1)

    out["metric"] = "fastq_stream_throughput"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
