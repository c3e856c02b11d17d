"""Engine driver: BAM stream -> device counting -> output tables.

The TPU-native replacement for the reference's `irfinder` binary main loop
(SURVEY.md §2 row 6, §3.3, historical src/irfinder/main.cpp +
BAM2blocks::processAll [R]): instead of a single-threaded per-fragment
callback chain, the engine streams PackedBatches (host decoder) through one
jitted XLA counting step holding integer counters in device memory, then
finalizes (two cumsums on device + per-intron join on host) and writes the
output table set byte-exactly (irfinder_tpu.format).

Observed splice junctions (sparse dynamic keys, for IRFinder-JuncCount.txt)
are tallied host-side with vectorized np.unique per batch — the one counter
that does not map to dense device scatter targets.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import BinaryIO, Iterable

import jax
import numpy as np

from . import format as fmt
from .finalize import detect_directionality, intron_rows
from .io.bampy import BamHeader, decode_bam
from .io.batch import PackedBatch
from .ops.device_ref import DeviceRef, build_device_ref
from .ops.step import finalize_device, init_counters, make_count_step
from .refio.compile import CompiledRef


@dataclasses.dataclass
class RunMetrics:
    """Structured run metrics written next to the outputs (SURVEY.md §5.5)."""

    reads_total: int = 0
    reads_admitted: int = 0
    fragments: int = 0
    batches: int = 0
    decode_s: float = 0.0
    device_s: float = 0.0
    finalize_s: float = 0.0
    is_stranded: bool = False
    flip_strand: bool = False
    dir_concordance: float = 0.0
    dir_informative: int = 0

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


class Engine:
    """One reference map + device counter state; reusable across samples via
    reset().  Counting is add-associative, so results are invariant to batch
    size and processing order (tested in tests/test_engine.py)."""

    def __init__(self, ref: CompiledRef, cap_frags: int = 1 << 15):
        self.ref = ref
        self.cap_frags = cap_frags
        self.dref: DeviceRef = build_device_ref(ref)
        self._step = make_count_step()
        self.counters = None
        self.junc_tally: dict = {}
        self.metrics = RunMetrics()
        self._n_refids = 0

    # -- lifecycle -----------------------------------------------------------
    def reset(self, n_refids: int) -> None:
        self._n_refids = n_refids
        self.counters = init_counters(self.dref, n_refids)
        self.junc_tally = {}
        self.metrics = RunMetrics()

    # -- accumulation --------------------------------------------------------
    def process_batch(self, batch: PackedBatch) -> None:
        t0 = time.perf_counter()
        self.counters = self._step(self.dref, self.counters, batch.device_arrays())
        self.metrics.device_s += time.perf_counter() - t0
        self.metrics.batches += 1
        self._tally_junctions(batch)

    def _tally_junctions(self, b: PackedBatch) -> None:
        """Host-side sparse junction map for IRFinder-JuncCount.txt."""
        n = b.n_gaps
        if n == 0:
            return
        keys = np.stack(
            [b.gap_chrom[:n], b.gap_start[:n], b.gap_end[:n], b.gap_strand[:n]], axis=1
        )
        keys = keys[keys[:, 0] >= 0]
        if keys.size == 0:
            return
        uniq, counts = np.unique(keys, axis=0, return_counts=True)
        for (c, s, e, st), k in zip(uniq, counts):
            slot = self.junc_tally.setdefault((int(c), int(s), int(e)), [0, 0])
            slot[int(st)] += int(k)

    def run_stream(self, batches: Iterable[PackedBatch]) -> None:
        for b in batches:
            self.process_batch(b)

    # -- finalize ------------------------------------------------------------
    def counters_host(self) -> dict:
        """Finalize diff arrays on device, pull everything to host NumPy."""
        t0 = time.perf_counter()
        fin = jax.jit(finalize_device)(self.dref, self.counters)
        out = {k: np.asarray(v) for k, v in fin.items()}
        self.metrics.finalize_s += time.perf_counter() - t0
        return out

    def results(self, fc: dict | None = None) -> dict:
        """Full result bundle: nondir rows, directionality call, dir rows."""
        fc = fc if fc is not None else self.counters_host()
        stranded, flip, frac, n_inf = detect_directionality(self.ref, fc["exact_cnt"])
        self.metrics.is_stranded = bool(stranded)
        self.metrics.flip_strand = bool(flip)
        self.metrics.dir_concordance = float(frac)
        self.metrics.dir_informative = int(n_inf)
        args = (
            self.ref,
            fc["depth"],
            fc["start_cnt"],
            fc["end_cnt"],
            fc["exact_cnt"],
            fc["span_hits"],
        )
        return {
            "counters": fc,
            "rows_nondir": intron_rows(*args, mode="nondir"),
            "rows_dir": intron_rows(*args, mode="dir", flip_strand=flip),
            "stranded": stranded,
            "flip_strand": flip,
        }


def open_decoder(
    ref: CompiledRef,
    bam,
    cap_frags: int = 1 << 15,
    use_native: bool = True,
):
    """Pick the decoder: the multithreaded native C++ decoder for file paths
    (SURVEY.md §2 row 7), the pure-Python decoder for file objects or when the
    native toolchain is unavailable.  Both emit identical batch streams
    (tests/test_bamdecode.py)."""
    chrom_index = {c: i for i, c in enumerate(ref.chroms)}
    if isinstance(bam, (str, os.PathLike)):
        if use_native:
            try:
                from .native.bamdecode import decode_bam_native

                return decode_bam_native(str(bam), chrom_index, cap_frags=cap_frags)
            except (RuntimeError, OSError, AssertionError):
                pass  # no toolchain / build failure: fall through to Python
        bam = open(bam, "rb")
    return decode_bam(bam, chrom_index, cap_frags=cap_frags)


def run_bam(
    ref: CompiledRef,
    bam,
    out_dir: str,
    cap_frags: int = 1 << 15,
    use_native: bool = True,
) -> RunMetrics:
    """The `-m BAM` counting path (SURVEY.md §3.3): count one aligner-ordered
    BAM (path or file object) against a compiled reference and write the full
    output table set."""
    engine = Engine(ref, cap_frags=cap_frags)
    t0 = time.perf_counter()
    header, batches, stats = open_decoder(ref, bam, cap_frags, use_native)
    engine.reset(n_refids=len(header.ref_names))
    engine.run_stream(batches)
    engine.metrics.decode_s = time.perf_counter() - t0 - engine.metrics.device_s
    res = engine.results()
    engine.metrics.reads_total = stats.reads_total
    engine.metrics.reads_admitted = stats.reads_admitted
    engine.metrics.fragments = stats.fragments
    write_outputs(out_dir, ref, header, engine, res)
    return engine.metrics


def write_outputs(
    out_dir: str,
    ref: CompiledRef,
    header: BamHeader,
    engine: Engine,
    res: dict,
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    fc = res["counters"]
    with open(os.path.join(out_dir, "IRFinder-IR-nondir.txt"), "w") as fh:
        fmt.write_ir_table(fh, res["rows_nondir"])
    with open(os.path.join(out_dir, "IRFinder-IR-dir.txt"), "w") as fh:
        fmt.write_ir_table(fh, res["rows_dir"])
    with open(os.path.join(out_dir, "IRFinder-JuncCount.txt"), "w") as fh:
        fmt.write_junc_count(fh, ref.chroms, engine.junc_tally)
    with open(os.path.join(out_dir, "IRFinder-SpansPoint.txt"), "w") as fh:
        fmt.write_spans_point(fh, ref, fc["span_hits"])
    with open(os.path.join(out_dir, "IRFinder-ROI.txt"), "w") as fh:
        fmt.write_roi(fh, ref, fc["roi_cnt"])
    with open(os.path.join(out_dir, "IRFinder-ChrCoverage.txt"), "w") as fh:
        fmt.write_chr_coverage(fh, header.ref_names, fc["chr_frag"])
    from .qc import qc_warnings, write_warnings

    with open(os.path.join(out_dir, "WARNINGS"), "w") as fh:
        write_warnings(fh, qc_warnings(ref, fc, engine.metrics))
    import json

    with open(os.path.join(out_dir, "metrics.json"), "w") as fh:
        json.dump(engine.metrics.as_dict(), fh, indent=1)
