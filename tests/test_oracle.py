"""Conformance tests for the NumPy oracle (irfinder_tpu/oracle.py).

The oracle is the executable spec the device engine must match bit-exactly
(SURVEY.md §7.2 step 2), so the oracle itself is validated here against an
even-dumber brute force: per-genomic-base dictionaries accumulated straight
from the decoded reads, with intron inclusion recomputed from the toy exon
annotation independently of the ref compiler's run tables.
"""

import io

import numpy as np
import pytest

from irfinder_tpu import semantics as S
from irfinder_tpu.io import bamwrite
from irfinder_tpu.io.bampy import decode_bam, iter_reads
from irfinder_tpu.io.bgzf import read_all
from irfinder_tpu.oracle import OracleCounters, intron_rows
from irfinder_tpu.refio.compile import compile_reference
from irfinder_tpu.refio.gtf import Exon
from irfinder_tpu.utils.intervals import merge_intervals, subtract_from_interval

CHROMS = ["chr1", "chr2"]
CHROM_INDEX = {c: i for i, c in enumerate(CHROMS)}


def toy_exons():
    """Two genes on chr1 (one +, one - overlapping), one gene on chr2."""
    mk = lambda c, s, e, st, g, t: Exon(c, s, e, st, g, g.upper(), t)
    return [
        # geneA + : exons [100,200) [500,600) [900,1000) -> introns [200,500) [600,900)
        mk("chr1", 100, 200, "+", "geneA", "txA1"),
        mk("chr1", 500, 600, "+", "geneA", "txA1"),
        mk("chr1", 900, 1000, "+", "geneA", "txA1"),
        # txA2 skips middle exon -> intron [200,900) too
        mk("chr1", 100, 200, "+", "geneA", "txA2"),
        mk("chr1", 900, 1000, "+", "geneA", "txA2"),
        # geneB - : antisense exon inside geneA's first intron -> exclusion zone
        mk("chr1", 300, 350, "-", "geneB", "txB1"),
        mk("chr1", 2000, 2100, "-", "geneB", "txB1"),
        mk("chr1", 2400, 2500, "-", "geneB", "txB1"),
        # geneC + on chr2: intron [150,400)
        mk("chr2", 50, 150, "+", "geneC", "txC1"),
        mk("chr2", 400, 500, "+", "geneC", "txC1"),
    ]


ROIS = [("chr1", 0, 120, "rRNA-ish", "+"), ("chr2", 0, 5000, "chr2-all", ".")]


@pytest.fixture(scope="module")
def ref():
    return compile_reference(toy_exons(), chrom_order=CHROMS, rois=ROIS)


def random_bam_bytes(seed=0, n_frags=300):
    rng = np.random.default_rng(seed)
    records = []
    cigars = [
        "100M",
        "40M300N60M",
        "30M2I30M",
        "20M5D40M",
        "50M10S",
        "8M",  # short block: never spans a point with overhang 8
        "10M700N10M650N10M",
    ]
    for i in range(n_frags):
        ref_id = int(rng.integers(0, 2))
        pos = int(rng.integers(0, 2200))
        cig = cigars[int(rng.integers(0, len(cigars)))]
        rev = bool(rng.integers(0, 2))
        kind = rng.integers(0, 10)
        if kind < 6:  # proper pair
            pos2 = pos + int(rng.integers(50, 300))
            cig2 = cigars[int(rng.integers(0, len(cigars)))]
            records += bamwrite.make_pair(f"frag{i}", ref_id, pos, cig, pos2, cig2, reverse1=rev)
        elif kind < 8:  # single-end
            records.append(bamwrite.make_single(f"frag{i}", ref_id, pos, cig, reverse=rev))
        elif kind == 8:  # filtered: low mapq
            records.append(bamwrite.make_single(f"frag{i}", ref_id, pos, cig, mapq=0))
        else:  # filtered: secondary
            records.append(
                bamwrite.make_single(f"frag{i}", ref_id, pos, cig, flag_extra=0x100)
            )
    buf = io.BytesIO()
    bamwrite.write_bam(buf, CHROMS, [5000, 5000], records)
    return buf.getvalue()


def oracle_from_bam(ref, bam_bytes, cap_frags=1 << 15):
    _, batches, stats = decode_bam(io.BytesIO(bam_bytes), CHROM_INDEX, cap_frags=cap_frags)
    counters = OracleCounters.create(ref)
    for b in batches:
        counters.add_batch(b)
    return counters, stats


def brute_force(ref, bam_bytes):
    """Per-genomic-base dict counting straight off decoded reads, with
    name-adjacency pairing replicated inline."""
    payload = read_all(io.BytesIO(bam_bytes))
    depth = {}  # (strand, chrom, pos) -> n
    juncs = {}  # (strand, chrom, s, e) -> n
    blocks_by_strand = []  # (strand, chrom, s, e)
    frags = []  # (strand, ref_id, chrom, span_s, span_e)
    pending = None
    admitted = []
    for read in iter_reads(payload):
        if read is None:
            continue
        admitted.append(read)
    i = 0
    groups = []
    while i < len(admitted):
        if i + 1 < len(admitted) and admitted[i].name == admitted[i + 1].name:
            groups.append((admitted[i], admitted[i + 1]))
            i += 2
        else:
            groups.append((admitted[i],))
            i += 1
    for grp in groups:
        by_ref = {}
        for r in grp:
            by_ref.setdefault(r.ref_id, []).append(r)
        for rid, rs in by_ref.items():
            chrom = rid  # ref order == chrom order in this test
            strand = rs[0].strand
            lo = min(s for r in rs for (s, _) in r.blocks)
            hi = max(e for r in rs for (_, e) in r.blocks)
            frags.append((strand, rid, chrom, lo, hi))
            for r in rs:
                for (s, e) in r.blocks:
                    blocks_by_strand.append((strand, chrom, s, e))
                    for p in range(s, e):
                        depth[(strand, chrom, p)] = depth.get((strand, chrom, p), 0) + 1
                for (s, e) in r.gaps:
                    juncs[(strand, chrom, s, e)] = juncs.get((strand, chrom, s, e), 0) + 1
    return depth, juncs, blocks_by_strand, frags


def included_intervals_of_intron(chrom_idx, start, end):
    """Recompute exclusion subtraction independently of the ref compiler."""
    ex = [e for e in toy_exons() if CHROM_INDEX[e.chrom] == chrom_idx]
    ms, me = merge_intervals(
        np.array([e.start for e in ex]), np.array([e.end for e in ex])
    )
    return subtract_from_interval(start, end, ms, me)


def test_oracle_depth_matches_bruteforce(ref):
    bam = random_bam_bytes()
    counters, _ = oracle_from_bam(ref, bam)
    depth, _, _, _ = brute_force(ref, bam)
    # walk every uspan base and compare
    for u in range(ref.uspan_start.size):
        c = int(np.searchsorted(ref.uspan_seg, u, side="right")) - 1
        for k, p in enumerate(range(int(ref.uspan_start[u]), int(ref.uspan_end[u]))):
            m = int(ref.uspan_mbs_off[u]) + k
            for st in (0, 1):
                assert counters.depth[st, m] == depth.get((st, c, p), 0), (u, p, st)


def test_oracle_junctions_match_bruteforce(ref):
    bam = random_bam_bytes()
    counters, _ = oracle_from_bam(ref, bam)
    _, juncs, _, _ = brute_force(ref, bam)

    def seg_chrom(seg, i):
        return int(np.searchsorted(seg, i, side="right")) - 1

    for i in range(ref.bstart_coord.size):
        c = seg_chrom(ref.bstart_seg, i)
        for st in (0, 1):
            want = sum(
                v for (s2, c2, gs, _), v in juncs.items() if s2 == st and c2 == c and gs == ref.bstart_coord[i]
            )
            assert counters.start_cnt[st, i] == want
    for i in range(ref.bend_coord.size):
        c = seg_chrom(ref.bend_seg, i)
        for st in (0, 1):
            want = sum(
                v for (s2, c2, _, ge), v in juncs.items() if s2 == st and c2 == c and ge == ref.bend_coord[i]
            )
            assert counters.end_cnt[st, i] == want
    for i in range(ref.upair_start.size):
        c = seg_chrom(ref.upair_seg, i)
        for st in (0, 1):
            want = juncs.get((st, c, int(ref.upair_start[i]), int(ref.upair_end[i])), 0)
            assert counters.exact_cnt[st, i] == want


def test_oracle_spans_and_roi_match_bruteforce(ref):
    bam = random_bam_bytes()
    counters, _ = oracle_from_bam(ref, bam)
    _, _, blocks, frags = brute_force(ref, bam)
    OH = S.SPANS_OVERHANG
    for i in range(ref.point_coord.size):
        c = int(np.searchsorted(ref.point_seg, i, side="right")) - 1
        p = int(ref.point_coord[i])
        for st in (0, 1):
            want = sum(
                1 for (s2, c2, bs, be) in blocks if s2 == st and c2 == c and bs + OH <= p <= be - OH
            )
            assert counters.span_hits[st, i] == want, (i, p, st)
    for r in range(len(ref.roi_names)):
        c = int(np.searchsorted(ref.roi_seg, r, side="right")) - 1
        rs, re = int(ref.roi_start[r]), int(ref.roi_end[r])
        for st in (0, 1):
            want = sum(
                1 for (s2, _, c2, fs, fe) in frags if s2 == st and c2 == c and rs < fe and fs < re
            )
            assert counters.roi_cnt[st, r] == want


def test_intron_rows_vs_per_base_recompute(ref):
    bam = random_bam_bytes()
    counters, _ = oracle_from_bam(ref, bam)
    depth, juncs, blocks, _ = brute_force(ref, bam)
    rows = intron_rows(counters, mode="nondir")
    assert len(rows) == ref.n_introns
    OH = S.SPANS_OVERHANG
    for i, row in enumerate(rows):
        c = int(ref.intron_chrom[i])
        inc = included_intervals_of_intron(c, int(ref.intron_start[i]), int(ref.intron_end[i]))
        d = [
            depth.get((0, c, p), 0) + depth.get((1, c, p), 0)
            for (a, b) in inc
            for p in range(a, b)
        ]
        n = len(d)
        if n:
            ds = sorted(d)
            assert row.coverage == sum(1 for x in d if x) / n
            assert row.intron_depth == sum(d) / n
            assert row.p25 == ds[S.percentile_rank_index(0.25, n)]
            assert row.p50 == ds[S.percentile_rank_index(0.50, n)]
            assert row.p75 == ds[S.percentile_rank_index(0.75, n)]
            w = min(S.EDGE_DEPTH_WINDOW, n)
            assert row.depth_first50 == sum(d[:w]) / w
            assert row.depth_last50 == sum(d[-w:]) / w
        sj = lambda pred: sum(
            v for (st, c2, gs, ge), v in juncs.items() if c2 == c and pred(gs, ge)
        )
        istart, iend = int(ref.intron_start[i]), int(ref.intron_end[i])
        assert row.splice_left == sj(lambda gs, ge: gs == istart)
        assert row.splice_right == sj(lambda gs, ge: ge == iend)
        assert row.splice_exact == sj(lambda gs, ge: gs == istart and ge == iend)
        span = lambda p: sum(
            1 for (st, c2, bs, be) in blocks if c2 == c and bs + OH <= p <= be - OH
        )
        assert row.exon_intron_left == span(istart)
        assert row.exon_intron_right == span(iend)


def test_batch_size_invariance(ref):
    """Counters must be identical whatever the decode batch capacity
    (fragment carry-over across batch boundaries; SURVEY.md §7.3 item 4)."""
    bam = random_bam_bytes(seed=3, n_frags=200)
    big, _ = oracle_from_bam(ref, bam, cap_frags=1 << 15)
    small, _ = oracle_from_bam(ref, bam, cap_frags=7)
    np.testing.assert_array_equal(big.depth, small.depth)
    np.testing.assert_array_equal(big.start_cnt, small.start_cnt)
    np.testing.assert_array_equal(big.end_cnt, small.end_cnt)
    np.testing.assert_array_equal(big.exact_cnt, small.exact_cnt)
    np.testing.assert_array_equal(big.span_hits, small.span_hits)
    np.testing.assert_array_equal(big.roi_cnt, small.roi_cnt)
    assert big.chr_frag == small.chr_frag


def test_merge_associativity(ref):
    """Shard-merge determinism model: splitting the batch stream across
    counter shards and merging equals single-stream counting."""
    bam = random_bam_bytes(seed=4, n_frags=150)
    whole, _ = oracle_from_bam(ref, bam)
    _, batches, _ = decode_bam(io.BytesIO(bam), CHROM_INDEX, cap_frags=13)
    shards = [OracleCounters.create(ref) for _ in range(3)]
    for k, b in enumerate(batches):
        shards[k % 3].add_batch(b)
    merged = shards[0]
    merged.merge(shards[1])
    merged.merge(shards[2])
    np.testing.assert_array_equal(whole.depth, merged.depth)
    np.testing.assert_array_equal(whole.exact_cnt, merged.exact_cnt)
    np.testing.assert_array_equal(whole.span_hits, merged.span_hits)
    assert whole.n_frags == merged.n_frags
