"""Unit tests for the GTF parser, interval algebra, and reference compiler
(SURVEY.md §4 item 2: toy GTF cases — overlapping transcripts, antisense
pairs, single-exon genes)."""

import numpy as np

from irfinder_tpu import semantics as S
from irfinder_tpu.refio.compile import compile_reference
from irfinder_tpu.refio.gtf import iter_exons_lines
from irfinder_tpu.utils.intervals import (
    any_overlap,
    merge_intervals,
    min_distance,
    subtract_from_interval,
)


def gtf_line(chrom, start0, end, strand, gene, tx, gene_name=None):
    """Build a GTF exon line from 0-based half-open coords."""
    attrs = f'gene_id "{gene}"; transcript_id "{tx}"; gene_name "{gene_name or gene}";'
    return f"{chrom}\thavana\texon\t{start0 + 1}\t{end}\t.\t{strand}\t.\t{attrs}\n"


# Toy annotation:
#   geneA (+, chr1): tx1 exons [100,200) [500,600) [900,1000)
#                    tx2 exons [100,200) [700,760) [900,1000)
#     -> unique introns: [200,500) [200,700) [600,900) [760,900)
#        intron [200,700) overlaps tx1's exon [500,600) -> known-exon,
#        and its measurable region excludes [500,600).
#   geneB (-, chr1): single exon [5000,5200) -> no introns; its exon is
#        antisense to nothing nearby.
#   geneC (+, chr2): tx exons [10,50) [80,120); antisense geneD exon [85,95)
#        -> geneC intron [50,80) has an antisense exon 5bp away -> anti-near
#        (with default ANTI_NEAR_DIST) and geneD intron? geneD single exon.
TOY_GTF = (
    gtf_line("chr1", 100, 200, "+", "geneA", "tx1")
    + gtf_line("chr1", 500, 600, "+", "geneA", "tx1")
    + gtf_line("chr1", 900, 1000, "+", "geneA", "tx1")
    + gtf_line("chr1", 100, 200, "+", "geneA", "tx2")
    + gtf_line("chr1", 700, 760, "+", "geneA", "tx2")
    + gtf_line("chr1", 900, 1000, "+", "geneA", "tx2")
    + gtf_line("chr1", 5000, 5200, "-", "geneB", "tx3")
    + gtf_line("chr2", 10, 50, "+", "geneC", "tx4")
    + gtf_line("chr2", 80, 120, "+", "geneC", "tx4")
    + gtf_line("chr2", 85, 95, "-", "geneD", "tx5")
)


def toy_ref(**kw):
    return compile_reference(iter_exons_lines(TOY_GTF.splitlines(keepends=True)), **kw)


class TestIntervals:
    def test_merge_overlapping_and_touching(self):
        s, e = merge_intervals(np.array([10, 0, 5, 40]), np.array([20, 5, 12, 50]))
        assert s.tolist() == [0, 40] and e.tolist() == [20, 50]

    def test_merge_empty(self):
        s, e = merge_intervals(np.array([]), np.array([]))
        assert s.size == 0 and e.size == 0

    def test_subtract(self):
        ex_s, ex_e = np.array([10, 30]), np.array([15, 35])
        assert subtract_from_interval(0, 40, ex_s, ex_e) == [(0, 10), (15, 30), (35, 40)]
        assert subtract_from_interval(12, 14, ex_s, ex_e) == []
        assert subtract_from_interval(10, 15, ex_s, ex_e) == []
        assert subtract_from_interval(14, 31, ex_s, ex_e) == [(15, 30)]

    def test_any_overlap(self):
        s, e = np.array([10, 30]), np.array([15, 35])
        got = any_overlap(s, e, np.array([0, 14, 15, 34]), np.array([10, 16, 30, 40]))
        assert got.tolist() == [False, True, False, True]

    def test_min_distance(self):
        s, e = np.array([10, 30]), np.array([15, 35])
        d = min_distance(s, e, np.array([0, 20, 14]), np.array([5, 25, 16]))
        assert d.tolist() == [5, 5, 0]


class TestGTF:
    def test_parse(self):
        exons = list(iter_exons_lines(TOY_GTF.splitlines(keepends=True)))
        assert len(exons) == 10
        assert exons[0].start == 100 and exons[0].end == 200
        assert exons[0].gene_id == "geneA" and exons[0].strand == "+"


class TestCompile:
    def test_intron_rows(self):
        ref = toy_ref()
        assert ref.chroms == ["chr1", "chr2"]
        rows = list(
            zip(
                ref.intron_chrom.tolist(),
                ref.intron_start.tolist(),
                ref.intron_end.tolist(),
            )
        )
        # geneA: 4 unique introns on chr1; geneC: 1 intron on chr2
        assert rows == [(0, 200, 500), (0, 200, 700), (0, 600, 900), (0, 760, 900), (1, 50, 80)]

    def test_classification(self):
        ref = toy_ref()
        classes = [S.INTRON_CLASSES[c] for c in ref.intron_class]
        # intron [200,700) contains tx1 exon [500,600) (sense) -> known-exon
        assert classes[1] == "known-exon"
        # intron [600,900) contains tx2 exon [700,760) -> known-exon
        assert classes[2] == "known-exon"
        assert classes[0] == "clean"
        assert classes[3] == "clean"
        # geneC intron [50,80): antisense geneD exon [85,95) 5bp away -> anti-near
        assert classes[4] == "anti-near"

    def test_exclusion_and_mbs(self):
        ref = toy_ref()
        # chr1 included union: introns minus ALL exons.
        # union of introns: [200,900); exons exclude [500,600) and [700,760)
        # -> spans [200,500),[600,700),[760,900)
        lo, hi = ref.uspan_seg[0], ref.uspan_seg[1]
        assert ref.uspan_start[lo:hi].tolist() == [200, 600, 760]
        assert ref.uspan_end[lo:hi].tolist() == [500, 700, 900]
        # chr2: intron [50,80) has no exon overlap
        lo, hi = ref.uspan_seg[1], ref.uspan_seg[2]
        assert ref.uspan_start[lo:hi].tolist() == [50]
        assert ref.uspan_end[lo:hi].tolist() == [80]
        # mbs size = 300 + 100 + 140 + 30
        assert ref.mbs_size == 570

    def test_intron_runs(self):
        ref = toy_ref()
        # intron 0 [200,500): fully included, one run at mbs 0 len 300
        assert ref.intron_run_off[0] == 0 and ref.intron_run_off[1] == 1
        assert ref.run_mbs_start[0] == 0 and ref.run_len[0] == 300
        # intron 1 [200,700): runs [200,500) and [600,700)
        r = slice(ref.intron_run_off[1], ref.intron_run_off[2])
        assert ref.run_mbs_start[r].tolist() == [0, 300] and ref.run_len[r].tolist() == [300, 100]
        # intron 4 (chr2 [50,80)): run at global mbs offset 540
        r = slice(ref.intron_run_off[4], ref.intron_run_off[5])
        assert ref.run_mbs_start[r].tolist() == [540] and ref.run_len[r].tolist() == [30]

    def test_boundary_tables(self):
        ref = toy_ref()
        # unique starts chr1: 200, 600, 760 ; chr2: 50
        assert ref.bstart_coord[ref.bstart_seg[0] : ref.bstart_seg[1]].tolist() == [200, 600, 760]
        assert ref.bstart_coord[ref.bstart_seg[1] : ref.bstart_seg[2]].tolist() == [50]
        # intron row -> start idx round-trip
        for i in range(ref.n_introns):
            assert ref.bstart_coord[ref.intron_bstart_idx[i]] == ref.intron_start[i]
            assert ref.bend_coord[ref.intron_bend_idx[i]] == ref.intron_end[i]
            assert ref.upair_start[ref.intron_pair_idx[i]] == ref.intron_start[i]
            assert ref.upair_end[ref.intron_pair_idx[i]] == ref.intron_end[i]
            assert ref.point_coord[ref.intron_pstart_idx[i]] == ref.intron_start[i]
            assert ref.point_coord[ref.intron_pend_idx[i]] == ref.intron_end[i]

    def test_names(self):
        ref = toy_ref()
        assert ref.intron_names[0] == "geneA/geneA/clean"
        assert ref.intron_names[1] == "geneA/geneA/known-exon"

    def test_save_load_roundtrip(self, tmp_path):
        ref = toy_ref(rois=[("chr1", 0, 50, "rRNA", "+")])
        ref.save(str(tmp_path / "ref"))
        from irfinder_tpu.refio.compile import CompiledRef

        ref2 = CompiledRef.load(str(tmp_path / "ref"))
        assert ref2.chroms == ref.chroms
        assert ref2.intron_names == ref.intron_names
        np.testing.assert_array_equal(ref2.intron_start, ref.intron_start)
        np.testing.assert_array_equal(ref2.run_mbs_start, ref.run_mbs_start)
        assert ref2.roi_names == ["rRNA"]

    def test_extra_exclusions(self):
        ref = toy_ref(extra_exclusions={"chr1": ([250], [300])})
        lo, hi = ref.uspan_seg[0], ref.uspan_seg[1]
        assert ref.uspan_start[lo:hi].tolist() == [200, 300, 600, 760]
        assert ref.uspan_end[lo:hi].tolist() == [250, 500, 700, 900]
