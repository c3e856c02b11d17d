"""Counter finalization: dense counter arrays -> per-intron IR rows.

This is the engine analog of CoverageBlocksIRFinder::Output (SURVEY.md §3.4,
historical src/irfinder/ReadBlockProcessor_CoverageBlocks.cpp [R]): join
per-base depth, junction counts and boundary-span counts into one row per
intron, compute IRratio + warning flags (irfinder_tpu.semantics).  Shared by
the NumPy oracle and the device engine so the row math is one code path; the
oracle/engine equivalence tests cover the counter arrays themselves.

Inputs are plain NumPy arrays with a leading strand axis (0 = forward
fragments, 1 = reverse):

    depth      (2, mbs_size)  per-included-base read depth
    start_cnt  (2, S)  splice gaps matching each unique intron start
    end_cnt    (2, E)
    exact_cnt  (2, X)  gaps matching a unique (start, end) pair
    span_hits  (2, P)  blocks spanning each unique boundary point
"""

from __future__ import annotations

import numpy as np

from . import semantics as S
from .refio.compile import CompiledRef, STRAND_CHAR


def intron_rows(
    ref: CompiledRef,
    depth: np.ndarray,
    start_cnt: np.ndarray,
    end_cnt: np.ndarray,
    exact_cnt: np.ndarray,
    span_hits: np.ndarray,
    mode: str = "nondir",
    flip_strand: bool = False,
) -> list:
    """Finalize counters into IntronRow records.

    mode: "nondir" sums both fragment strands; "dir" keeps only fragments
    whose (optionally flipped) strand matches the intron strand.
    flip_strand: library polarity correction from detect_directionality()
    (fragment strand 0 maps to annotation '-' when True).
    """
    rows = []
    for i in range(ref.n_introns):
        istrand = int(ref.intron_strand[i])
        if mode == "nondir":
            sel = (0, 1)
        else:
            want = istrand if not flip_strand else 1 - istrand
            sel = (want,) if istrand in (0, 1) else (0, 1)

        def cnt(arr, idx):
            return int(sum(arr[s, idx] for s in sel))

        # depth over the intron's included bases (CSR runs into MBS)
        runs = slice(int(ref.intron_run_off[i]), int(ref.intron_run_off[i + 1]))
        dsum = sum(depth[s] for s in sel)
        pieces = [
            dsum[m : m + l]
            for m, l in zip(ref.run_mbs_start[runs], ref.run_len[runs])
        ]
        d = np.concatenate(pieces) if pieces else np.zeros(0, dtype=np.int64)
        n = d.size
        if n:
            ds = np.sort(d)
            coverage = float(np.count_nonzero(d)) / n
            mean_depth = float(d.sum()) / n
            p25 = int(ds[S.percentile_rank_index(0.25, n)])
            p50 = int(ds[S.percentile_rank_index(0.50, n)])
            p75 = int(ds[S.percentile_rank_index(0.75, n)])
            w = min(S.EDGE_DEPTH_WINDOW, n)
            first50 = float(d[:w].sum()) / w
            last50 = float(d[-w:].sum()) / w
        else:
            coverage = mean_depth = first50 = last50 = 0.0
            p25 = p50 = p75 = 0

        rows.append(
            S.IntronRow(
                chrom=ref.chroms[int(ref.intron_chrom[i])],
                start=int(ref.intron_start[i]),
                end=int(ref.intron_end[i]),
                name=ref.intron_names[i],
                strand=STRAND_CHAR[istrand],
                coverage=coverage,
                intron_depth=mean_depth,
                p25=p25,
                p50=p50,
                p75=p75,
                exon_intron_left=cnt(span_hits, int(ref.intron_pstart_idx[i])),
                exon_intron_right=cnt(span_hits, int(ref.intron_pend_idx[i])),
                depth_first50=first50,
                depth_last50=last50,
                splice_left=cnt(start_cnt, int(ref.intron_bstart_idx[i])),
                splice_right=cnt(end_cnt, int(ref.intron_bend_idx[i])),
                splice_exact=cnt(exact_cnt, int(ref.intron_pair_idx[i])),
            )
        )
    return rows


def pair_strands(ref: CompiledRef) -> np.ndarray:
    """Annotation strand per unique (start, end) junction pair: 0/1 when all
    introns sharing the pair agree, 2 when unknown or conflicting."""
    ps = np.full(ref.upair_start.size, -1, dtype=np.int8)
    for i in range(ref.n_introns):
        k = int(ref.intron_pair_idx[i])
        st = int(ref.intron_strand[i])
        if ps[k] == -1:
            ps[k] = st
        elif ps[k] != st:
            ps[k] = 2
    ps[ps == -1] = 2
    return ps


def detect_directionality(ref: CompiledRef, exact_cnt: np.ndarray):
    """Library strandedness call from strand-resolved exact-junction counts
    over introns of known direction (SURVEY.md §2 row 15 [R:verify rule]).

    Returns (is_stranded, flip_strand, concordance_fraction, n_informative):
    flip_strand=True means fragment strand 0 corresponds to annotation '-'
    (e.g. dUTP/fr-firststrand libraries).
    """
    ps = pair_strands(ref)
    known = np.nonzero((ps == 0) | (ps == 1))[0]
    if known.size == 0:
        return False, False, 0.0, 0
    k_strand = ps[known].astype(np.int64)
    same = int(exact_cnt[k_strand, known].sum())
    opposite = int(exact_cnt[1 - k_strand, known].sum())
    total = same + opposite
    if total < S.DIR_MIN_INFORMATIVE:
        return False, False, 0.0, total
    frac = max(same, opposite) / total
    return frac >= S.DIR_CONCORDANCE_THRESHOLD, opposite > same, frac, total
