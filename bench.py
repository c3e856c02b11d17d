"""Benchmark: BAM-fragment counting throughput through the device step.

Primary metric (BASELINE.json:2): reads/s/chip through the intron-intersection
kernel on a chr21-scale map.  Prints ONE JSON line.

vs_baseline: ratio against the single-thread scalar C++ conformance counter
(native/oracle) on identical batches — the stand-in for the reference's
single-thread C++ counter (BASELINE.md; the reference snapshot publishes no
numbers).  0.0 until the native oracle is built.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    import jax

    # persistent compile cache: first-compile on the tunneled TPU is slow
    # (tens of seconds); cache across bench runs
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from irfinder_tpu.ops.device_ref import build_device_ref
    from irfinder_tpu.ops.step import init_counters, make_count_step
    from irfinder_tpu.synth import synth_batch_arrays, synth_ref

    n_frags = int(os.environ.get("BENCH_FRAGS", 1 << 15))
    n_batches = int(os.environ.get("BENCH_BATCHES", 16))
    reps = int(os.environ.get("BENCH_REPS", 3))

    ref = synth_ref(n_genes=800)  # chr21-scale: ~40k intron rows
    dref = build_device_ref(ref)
    step = make_count_step()

    from irfinder_tpu.io.batch import device_batch

    batches = []
    total_reads = 0
    for i in range(n_batches):
        arrs, n_reads = synth_batch_arrays(ref, n_frags=n_frags, seed=i + 1)
        batches.append({k: jax.device_put(v) for k, v in device_batch(arrs).items()})
        total_reads += n_reads

    counters = init_counters(dref, n_refids=len(ref.chroms))

    def sync(c):
        # block_until_ready is NOT a reliable completion barrier through the
        # axon tunnel (observed returning before execution); a real D2H read
        # of one element cannot lie.  Steps are data-chained through the
        # donated counters, so one end-of-run sync bounds the whole stream.
        return np.asarray(c["cnt"][0:1])

    # warmup / compile
    counters = step(dref, counters, batches[0])
    sync(counters)

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for b in batches:
            counters = step(dref, counters, b)
        sync(counters)
        best = min(best, time.perf_counter() - t0)
    reads_per_s = total_reads / best

    baseline = _native_oracle_reads_per_s(ref, n_frags)
    vs = reads_per_s / baseline if baseline else 0.0
    print(
        json.dumps(
            {
                "metric": "count_step_reads_per_s_per_chip",
                "value": round(reads_per_s, 1),
                "unit": "reads/s",
                "vs_baseline": round(vs, 2),
            }
        )
    )


def bench_e2e() -> None:
    """BENCH_MODE=e2e: full pipeline reads/s — native decode -> H2D -> device
    step -> finalize — on a synthetic chr21-scale ~1M-read BAM (config A
    shape).  Prints the same one-line JSON format."""
    import tempfile

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from irfinder_tpu.engine import run_bam
    from irfinder_tpu.io import bamwrite
    from irfinder_tpu.synth import synth_ref

    n_pairs = int(os.environ.get("BENCH_PAIRS", 500_000))
    ref = synth_ref(n_genes=800)
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="irbench_")
    bam = os.path.join(tmp, "bench.bam")
    with open(bam, "wb") as fh:
        recs = []
        starts = rng.integers(0, 45_000_000, n_pairs)
        for i in range(n_pairs):
            p1 = int(starts[i])
            recs.extend(bamwrite.make_pair(f"r{i}", 0, p1, "100M", p1 + 250, "100M"))
        bamwrite.write_bam(fh, ["chr21"], [46_000_000], recs)

    # warm (compile) on a first pass, then measure
    run_bam(ref, bam, os.path.join(tmp, "warm"))
    t0 = time.perf_counter()
    metrics = run_bam(ref, bam, os.path.join(tmp, "out"))
    dt = time.perf_counter() - t0
    reads_per_s = metrics.reads_total / dt
    baseline = _native_oracle_reads_per_s(ref, 1 << 15)
    print(
        json.dumps(
            {
                "metric": "end_to_end_bam_reads_per_s",
                "value": round(reads_per_s, 1),
                "unit": "reads/s",
                "vs_baseline": round(reads_per_s / baseline, 2) if baseline else 0.0,
            }
        )
    )


def _native_oracle_reads_per_s(ref, n_frags) -> float:
    """Single-thread C++ scalar counter throughput on one identical batch
    (the measured stand-in baseline, BASELINE.md).  0.0 if not built."""
    try:
        from irfinder_tpu.native import oracle_native
    except Exception:
        return 0.0
    try:
        from irfinder_tpu.synth import synth_batch_arrays

        arrs, n_reads = synth_batch_arrays(ref, n_frags=n_frags, seed=99)
        t0 = time.perf_counter()
        oracle_native.count_batch(ref, arrs)
        dt = time.perf_counter() - t0
        return n_reads / dt if dt > 0 else 0.0
    except Exception:
        return 0.0


if __name__ == "__main__":
    if os.environ.get("BENCH_MODE") == "e2e":
        bench_e2e()
    else:
        main()
