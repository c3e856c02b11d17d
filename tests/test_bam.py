"""BAM writer/decoder roundtrip, CIGAR->blocks tables, mate pairing, batching
(SURVEY.md §4 item 2: CIGAR decode tables; §7.3 item 4: pair carry-over)."""

import io

import numpy as np
import pytest

from irfinder_tpu.io import bgzf
from irfinder_tpu.io.bampy import decode_bam, iter_reads, read_header
from irfinder_tpu.io.bamwrite import encode_record, make_pair, make_single, write_bam, SimRead


def bam_bytes(records, refs=(("chr1", 1_000_000), ("chr2", 500_000))):
    buf = io.BytesIO()
    write_bam(buf, [r[0] for r in refs], [r[1] for r in refs], records)
    buf.seek(0)
    return buf


def decode_all(buf, chrom_index=None):
    chrom_index = chrom_index or {"chr1": 0, "chr2": 1}
    header, batches, stats = decode_bam(buf, chrom_index)
    return header, list(batches), stats


class TestBGZF:
    def test_roundtrip_multiblock(self):
        data = bytes(range(256)) * 1000  # > one 60000-byte block
        buf = io.BytesIO()
        bgzf.write_payload(buf, data)
        bgzf.close(buf)
        buf.seek(0)
        assert bgzf.read_all(buf) == data

    def test_corrupt_block_detected(self):
        buf = io.BytesIO()
        bgzf.write_payload(buf, b"hello world" * 100)
        raw = bytearray(buf.getvalue())
        raw[30] ^= 0xFF  # flip a byte inside compressed data
        with pytest.raises(Exception):
            bgzf.read_all(io.BytesIO(bytes(raw)))

    def test_truncated_detected(self):
        buf = io.BytesIO()
        bgzf.write_payload(buf, b"payload" * 50)
        raw = buf.getvalue()[:-5]
        with pytest.raises(ValueError):
            bgzf.read_all(io.BytesIO(raw))


class TestHeader:
    def test_header_roundtrip(self):
        buf = bam_bytes([])
        payload = bgzf.read_all(buf)
        header, off = read_header(memoryview(payload))
        assert header.ref_names == ["chr1", "chr2"]
        assert header.ref_lengths == [1_000_000, 500_000]
        assert off == len(payload)


CIGAR_CASES = [
    # (cigar, pos, expected blocks, expected gaps)
    ("100M", 1000, [(1000, 1100)], []),
    ("50M200N50M", 1000, [(1000, 1050), (1250, 1300)], [(1050, 1250)]),
    ("10S90M", 1000, [(1000, 1090)], []),  # soft clip consumes no ref
    ("40M5D55M", 1000, [(1000, 1100)], []),  # deletion extends block
    ("40M5I55M", 1000, [(1000, 1095)], []),  # insertion consumes no ref
    ("30M100N30M100N30M", 0, [(0, 30), (130, 160), (260, 290)], [(30, 130), (160, 260)]),
    ("20M1000N20M10S", 50, [(50, 70), (1070, 1090)], [(70, 1070)]),
    ("5H95M", 10, [(10, 105)], []),
]


class TestCigar:
    @pytest.mark.parametrize("cigar,pos,blocks,gaps", CIGAR_CASES)
    def test_blocks_and_gaps(self, cigar, pos, blocks, gaps):
        buf = bam_bytes([make_single("r1", 0, pos, cigar)])
        payload = bgzf.read_all(buf)
        reads = [r for r in iter_reads(payload) if r is not None]
        assert len(reads) == 1
        assert reads[0].blocks == blocks
        assert reads[0].gaps == gaps


class TestFilters:
    def test_drop_unmapped_secondary_supplementary_lowmapq(self):
        recs = [
            make_single("ok", 0, 100, "50M"),
            make_single("unmapped", 0, 100, "50M", flag_extra=0x4),
            make_single("secondary", 0, 100, "50M", flag_extra=0x100),
            make_single("supp", 0, 100, "50M", flag_extra=0x800),
            make_single("lowq", 0, 100, "50M", mapq=0),
            make_single("dup_kept", 0, 100, "50M", flag_extra=0x400),  # duplicates kept
        ]
        _, batches, stats = decode_all(bam_bytes(recs))
        assert stats.reads_total == 6
        assert stats.reads_admitted == 2
        total_frags = sum(b.n_frags for b in batches)
        assert total_frags == 2


class TestPairing:
    def test_adjacent_mates_form_fragment(self):
        recs = make_pair("p1", 0, 100, "50M", 300, "50M")
        _, batches, stats = decode_all(bam_bytes(recs))
        assert stats.fragments == 1 and stats.pairs == 1
        b = batches[0]
        assert b.n_frags == 1 and b.n_blocks == 2
        assert b.frag_start[0] == 100 and b.frag_end[0] == 350

    def test_nonadjacent_become_singles(self):
        recs = [
            make_single("a", 0, 100, "50M", flag_extra=0x1 | 0x40),
            make_single("b", 0, 500, "50M"),
            make_single("a", 0, 300, "50M", flag_extra=0x1 | 0x80),
        ]
        _, _, stats = decode_all(bam_bytes(recs))
        assert stats.fragments == 3 and stats.singles == 3

    def test_fragment_strand_read1_convention(self):
        # forward read1 -> strand 0 on both mates' contributions
        recs = make_pair("p", 0, 100, "50M", 300, "50M", reverse1=False)
        _, batches, _ = decode_all(bam_bytes(recs))
        assert batches[0].frag_strand[0] == 0
        assert batches[0].blk_strand[: batches[0].n_blocks].tolist() == [0, 0]
        # reverse read1 -> strand 1
        recs = make_pair("p", 0, 100, "50M", 300, "50M", reverse1=True)
        _, batches, _ = decode_all(bam_bytes(recs))
        assert batches[0].frag_strand[0] == 1

    def test_mate_filtered_leaves_single(self):
        recs = [
            encode_record("p", 0x1 | 0x40, 0, 100, 255, SimRead.parse_cigar("50M")),
            encode_record("p", 0x1 | 0x80 | 0x4, 0, 0, 0, SimRead.parse_cigar("50M")),
        ]
        _, _, stats = decode_all(bam_bytes(recs))
        assert stats.reads_admitted == 1 and stats.singles == 1


class TestBatching:
    def test_fragments_never_split_and_all_survive(self):
        recs = []
        for i in range(100):
            recs += make_pair(f"p{i}", 0, 100 + i, "10M20N10M", 300 + i, "20M")
        _, batches, stats = decode_all(bam_bytes(recs))
        # force tiny batches
        buf = bam_bytes(recs)
        _, batches, stats = decode_bam(buf, {"chr1": 0, "chr2": 1}, cap_frags=7)
        batches = list(batches)
        assert stats.fragments == 100
        assert sum(b.n_frags for b in batches) == 100
        assert sum(b.n_blocks for b in batches) == 300  # 3 blocks per fragment
        assert sum(b.n_gaps for b in batches) == 100
        for b in batches:
            assert b.n_frags <= 7
            # padding lanes marked -1
            assert (b.blk_chrom[b.n_blocks :] == -1).all()
            assert (b.frag_chrom[b.n_frags :] == -1).all()

    def test_unknown_chrom_maps_to_minus1(self):
        recs = [make_single("r", 1, 100, "50M")]
        _, batches, _ = decode_all(bam_bytes(recs), chrom_index={"chr1": 0})
        b = batches[0]
        assert b.frag_chrom[0] == -1 and b.frag_refid[0] == 1
        assert b.blk_chrom[0] == -1


class TestLongReadFragments:
    def test_many_junction_long_read_decodes(self):
        """Long-read spliced alignments (tens of N gaps) must decode even
        when cap_frags is tiny: block/gap capacities are floored at
        MIN_CAP_UNITS (io/batch.py) so one fragment always fits."""
        import io as _io

        from irfinder_tpu.io import bamwrite
        from irfinder_tpu.io.bampy import decode_bam

        cigar = "20M" + "".join("100N20M" for _ in range(29))
        rec = bamwrite.make_single("long1", 0, 1000, cigar)
        buf = _io.BytesIO()
        bamwrite.write_bam(buf, ["chr21"], [46_000_000], [rec])
        buf.seek(0)
        hdr, batches, stats = decode_bam(buf, {"chr21": 0}, cap_frags=16)
        nb = ng = 0
        for b in batches:
            nb += b.n_blocks
            ng += b.n_gaps
        assert (nb, ng) == (30, 29)
        assert stats.fragments == 1
