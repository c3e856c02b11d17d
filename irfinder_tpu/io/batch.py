"""PackedBatch: the columnar host->device read-batch contract.

This is the engine's analog of the reference's per-fragment FragmentBlocks
callback unit (SURVEY.md §2 rows 7-9): instead of streaming one fragment at a
time through a processor chain, the decoder flattens many fragments into
fixed-capacity, statically-shaped column arrays (BASELINE.json:5 "packed
(chrom, start, CIGAR-span, splice-gap) tensors") that one jitted device step
consumes.  Padding lanes carry chrom == -1 and are routed to a trash slot by
the device kernels, so padded work provably contributes zero (SURVEY.md §7.3
item 5).

Both the pure-Python decoder (io/bampy.py) and the native C++ decoder
(native/bamdecode/) emit exactly this layout.
"""

from __future__ import annotations

import dataclasses

import numpy as np

#: Batch column capacities as multiples of cap_frags.  A paired-end
#: fragment is typically 2 blocks (one per mate) and <1 splice gap; both
#: decoders emit a batch early when any column fills, so these ratios only
#: trade padding waste (device work on dead lanes) against batch count.
BLOCKS_PER_FRAG = 3
GAPS_PER_FRAG = 1
#: Long-read batch geometry (--long-reads): full-length transcript
#: alignments (ONT/PacBio) carry one block per exon — tens of blocks and
#: gaps per fragment, single-end.  With the paired-end ratios above such a
#: stream flushes batches on the block column at ~cap_frags/20 fragments,
#: leaving the frag columns ~95% padding; these ratios rebalance the fixed
#: shapes.  Counting semantics are identical under any geometry (batches
#: are add-associative) — this is purely a padding/throughput knob.
LONGREAD_BLOCKS_PER_FRAG = 64
LONGREAD_GAPS_PER_FRAG = 64
#: Floor on the block/gap column capacities, independent of cap_frags: one
#: fragment must always fit a single batch (mate carry-over, SURVEY.md §7.3
#: item 4).  4096 aligned blocks per fragment covers any real alignment
#: (long-read spliced alignments run ~10^2 exon blocks); beyond it the
#: decoders raise instead of silently truncating.
MIN_CAP_UNITS = 4096


@dataclasses.dataclass
class PackedBatch:
    # aligned contiguous blocks (one per CIGAR run of M/D/=/X per mate)
    blk_chrom: np.ndarray  # int32 (B,)  compiled chrom id, -1 = pad/unknown
    blk_start: np.ndarray  # int32 (B,)
    blk_end: np.ndarray  # int32 (B,)
    blk_strand: np.ndarray  # int32 (B,)  fragment strand 0/1
    # splice gaps (one per N CIGAR op per mate)
    gap_chrom: np.ndarray  # int32 (G,)
    gap_start: np.ndarray  # int32 (G,)
    gap_end: np.ndarray  # int32 (G,)
    gap_strand: np.ndarray  # int32 (G,)
    # fragment spans (for ROI / per-chrom tallies)
    frag_chrom: np.ndarray  # int32 (F,)  compiled chrom id, -1 = pad/unknown
    frag_refid: np.ndarray  # int32 (F,)  BAM-space ref id, -1 = pad
    frag_start: np.ndarray  # int32 (F,)
    frag_end: np.ndarray  # int32 (F,)
    frag_strand: np.ndarray  # int32 (F,)
    # scalars (host-side metrics; not shipped to device)
    n_blocks: int = 0
    n_gaps: int = 0
    n_frags: int = 0
    n_reads: int = 0  # admitted reads folded into this batch
    # one contiguous int32 buffer backing the 9 device-bound columns (the blk
    # and frag columns are views into it) — ONE device_put per batch instead
    # of nine (each put through the tunneled PJRT link costs ~0.2-0.5 ms of
    # latency; 9 puts were ~3x the cost of one fused transfer, measured)
    _fused: np.ndarray | None = None
    # packed wire buffer (pack_wire layout, 36 B/frag vs fused's 68) — the
    # native decoder pre-builds it; engine lazily packs when absent
    wire: np.ndarray | None = None
    # opaque decoder-state token (shared format between the native and Python
    # decoders, see io/bampy.py): re-opening the BAM with this token
    # reproduces the stream AFTER this batch — the checkpoint/resume seek
    # primitive (SURVEY.md §5.4)
    resume_token: bytes | None = None

    @staticmethod
    def empty(cap_blocks: int, cap_gaps: int, cap_frags: int) -> "PackedBatch":
        z = lambda n: np.zeros(n, dtype=np.int32)
        m = lambda n: np.full(n, -1, dtype=np.int32)
        fused = np.zeros(4 * cap_blocks + 5 * cap_frags, dtype=np.int32)
        bc = fused[0:cap_blocks]
        bc.fill(-1)
        o = 4 * cap_blocks
        fc = fused[o : o + cap_frags]
        fc.fill(-1)
        fr = fused[o + cap_frags : o + 2 * cap_frags]
        fr.fill(-1)
        return PackedBatch(
            blk_chrom=bc,
            blk_start=fused[cap_blocks : 2 * cap_blocks],
            blk_end=fused[2 * cap_blocks : 3 * cap_blocks],
            blk_strand=fused[3 * cap_blocks : 4 * cap_blocks],
            gap_chrom=m(cap_gaps),
            gap_start=z(cap_gaps),
            gap_end=z(cap_gaps),
            gap_strand=z(cap_gaps),
            frag_chrom=fc,
            frag_refid=fr,
            frag_start=fused[o + 2 * cap_frags : o + 3 * cap_frags],
            frag_end=fused[o + 3 * cap_frags : o + 4 * cap_frags],
            frag_strand=fused[o + 4 * cap_frags : o + 5 * cap_frags],
            _fused=fused,
        )

    @property
    def cap_blocks(self) -> int:
        return int(self.blk_chrom.shape[0])

    @property
    def cap_frags(self) -> int:
        return int(self.frag_chrom.shape[0])

    def fused_h2d(self) -> np.ndarray:
        """The single int32 buffer shipped to the device step: 4 blk columns
        of cap_blocks then 5 frag columns of cap_frags (unpack_fused below is
        the device-side inverse).  Zero-copy when the batch was built by
        PackedBatch.empty; assembled once otherwise."""
        if self._fused is not None:
            return self._fused
        return np.concatenate(
            [
                self.blk_chrom, self.blk_start, self.blk_end, self.blk_strand,
                self.frag_chrom, self.frag_refid, self.frag_start,
                self.frag_end, self.frag_strand,
            ]
        )

    def device_arrays(self) -> dict:
        """The arrays shipped to the device step (order-stable dict).  Gap
        columns are NOT shipped: junction counting lives on the host tally
        (engine.tally_junctions; ops/step.py docstring), so gaps never cross
        H2D."""
        return {
            "blk_chrom": self.blk_chrom,
            "blk_start": self.blk_start,
            "blk_end": self.blk_end,
            "blk_strand": self.blk_strand,
            "frag_chrom": self.frag_chrom,
            "frag_refid": self.frag_refid,
            "frag_start": self.frag_start,
            "frag_end": self.frag_end,
            "frag_strand": self.frag_strand,
        }


def all_arrays_of(b: "PackedBatch") -> dict:
    """Every column including host-only gaps (oracle/conformance paths)."""
    d = b.device_arrays()
    d.update(
        gap_chrom=b.gap_chrom, gap_start=b.gap_start,
        gap_end=b.gap_end, gap_strand=b.gap_strand,
    )
    return d


def unpack_fused(flat, cap_blocks: int, cap_frags: int) -> dict:
    """Device-side inverse of PackedBatch.fused_h2d (works on jnp or np
    arrays): one sliced view per column, zero data movement under jit."""
    names_b = ("blk_chrom", "blk_start", "blk_end", "blk_strand")
    names_f = ("frag_chrom", "frag_refid", "frag_start", "frag_end", "frag_strand")
    out = {}
    for i, nm in enumerate(names_b):
        out[nm] = flat[i * cap_blocks : (i + 1) * cap_blocks]
    o = 4 * cap_blocks
    for i, nm in enumerate(names_f):
        out[nm] = flat[o + i * cap_frags : o + (i + 1) * cap_frags]
    return out


#: Packed wire format (H2D): the tunneled-TPU link runs at ~25-75 MB/s
#: effective (content-dependent — the transport compresses), so shipped
#: bytes ARE the e2e throughput on weak links.  The wire buffer packs the
#: nine device-bound int32 columns into five words/fragment-row:
#:   [blk_start (B,) | blk_meta (B,) | frag_start (F,) | frag_end (F,) |
#:    frag_meta (F,)]
#:   blk_meta  = len:18 | chrom:13 | strand:1   (chrom 0x1FFF = pad)
#:   frag_meta = refid:31 | strand:1            (refid -1 = pad, via
#:                                               arithmetic >> on device)
#: frag_chrom is NOT shipped — the device derives it from refid through the
#: per-BAM chrom LUT (one tiny put per run).  36 B/frag vs the fused
#: buffer's 68 B/frag; the zeroed padding regions compress on the wire.
WIRE_LEN_BITS = 18
WIRE_CHROM_PAD = 0x1FFF  # 13-bit chrom field sentinel
WIRE_MAX_BLOCK_LEN = (1 << WIRE_LEN_BITS) - 1


def pack_wire(b: "PackedBatch") -> np.ndarray:
    """Host-side wire packing from a PackedBatch's columns (the native
    decoder builds the same layout straight from its C views — see
    native/bamdecode.py _pack_wire_from_views; both must stay bit-equal)."""
    return pack_wire_cols(
        b.blk_chrom, b.blk_start, b.blk_end, b.blk_strand,
        b.frag_refid, b.frag_start, b.frag_end, b.frag_strand,
    )


def pack_wire_cols(
    blk_chrom, blk_start, blk_end, blk_strand,
    frag_refid, frag_start, frag_end, frag_strand,
) -> np.ndarray:
    B = blk_chrom.shape[0]
    F = frag_refid.shape[0]
    out = np.empty(2 * B + 3 * F, np.int32)
    pad_b = blk_chrom < 0
    # pad lanes may carry stale start/end from recycled decoder buffers:
    # zero them so the wire's padding region stays compressible and the
    # block-length cap check only sees real lanes
    ln = np.where(pad_b, 0, blk_end.astype(np.int64) - blk_start)
    if ln.size and int(ln.max()) > WIRE_MAX_BLOCK_LEN:
        raise ValueError(
            f"aligned block longer than {WIRE_MAX_BLOCK_LEN} bases "
            "(corrupt CIGAR? wire format caps block length at 2^18)"
        )
    if blk_chrom.size and int(blk_chrom.max()) >= WIRE_CHROM_PAD:
        raise ValueError(
            f"compiled chrom id >= {WIRE_CHROM_PAD}: reference has too many "
            "contigs for the 13-bit wire chrom field (engine falls back to "
            "the fused buffer for such refs)"
        )
    cfield = np.where(pad_b, WIRE_CHROM_PAD, blk_chrom).astype(np.uint32)
    meta = (
        (ln.astype(np.uint32) << 14)
        | (cfield << 1)
        | (np.where(pad_b, 0, blk_strand).astype(np.uint32) & 1)
    )
    out[0:B] = np.where(pad_b, 0, blk_start)
    out[B : 2 * B] = meta.view(np.int32)
    o = 2 * B
    pad_f = frag_refid < 0
    out[o : o + F] = np.where(pad_f, 0, frag_start)
    out[o + F : o + 2 * F] = np.where(pad_f, 0, frag_end)
    fmeta = (
        (frag_refid.astype(np.int64) << 1)
        | (np.where(pad_f, 0, frag_strand).astype(np.int64) & 1)
    ).astype(np.int32)
    out[o + 2 * F : o + 3 * F] = fmeta
    return out


def unpack_wire(flat, cap_blocks: int, cap_frags: int, lut) -> dict:
    """Device-side inverse of pack_wire (jnp; runs inside the jitted wire
    step).  `lut` maps BAM refid -> compiled chrom id (-1 unknown)."""
    import jax.numpy as jnp

    B, F = cap_blocks, cap_frags
    bs = flat[0:B]
    bm = flat[B : 2 * B]
    o = 2 * B
    fs = flat[o : o + F]
    fe = flat[o + F : o + 2 * F]
    fm = flat[o + 2 * F : o + 3 * F]
    ln = (bm >> 14) & ((1 << WIRE_LEN_BITS) - 1)
    c13 = (bm >> 1) & 0x1FFF
    blk_chrom = jnp.where(c13 == WIRE_CHROM_PAD, -1, c13)
    refid = fm >> 1  # arithmetic: pad -1 survives
    n = lut.shape[0]
    frag_chrom = jnp.where(
        (refid >= 0) & (refid < n),
        lut[jnp.clip(refid, 0, n - 1)],
        -1,
    )
    return {
        "blk_chrom": blk_chrom,
        "blk_start": bs,
        "blk_end": bs + ln,
        "blk_strand": bm & 1,
        "frag_chrom": frag_chrom,
        "frag_refid": refid,
        "frag_start": fs,
        "frag_end": fe,
        "frag_strand": fm & 1,
    }


def device_batch(arrays: dict) -> dict:
    """Strip host-only (gap) columns from a raw batch-array dict so callers
    holding synthetic array dicts (bench, dry runs) ship the same column set
    as PackedBatch.device_arrays()."""
    return {k: v for k, v in arrays.items() if not k.startswith("gap_")}
