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
    frag_nblk: np.ndarray  # int32 (F,) blocks emitted for this frag row
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
    # False when the decoder skipped filling the block/frag columns on the
    # Engine.wire_ok promise (open_decoder full_columns=False): such a batch
    # carries ONLY `wire` and must never feed the fused/column step — the
    # engine raises instead of shipping never-filled zero columns
    columns_full: bool = True
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
            frag_nblk=z(cap_frags),
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
            "frag_nblk": self.frag_nblk,
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


#: Packed wire format (H2D): the tunneled-TPU link runs at ~8-75 MB/s
#: effective (content-dependent — the transport compresses), so shipped
#: bytes ARE the e2e throughput on weak links.  The wire buffer packs the
#: nine device-bound int32 columns into three words/fragment-row:
#:   [blk_start (B,) | blk_meta (B,) | frag_meta (F,)]
#:   blk_meta  = len:18 | chrom:13 | strand:1            (chrom 0x1FFF = pad)
#:   frag_meta = nblk:12 | refid:19 | strand:1           (refid 0x7FFFF = pad)
#: Neither frag_chrom nor frag_start/end is shipped: the device derives
#: chrom from refid through the per-BAM LUT (one tiny put per run) and the
#: fragment span by segmented min/max over its OWN blocks — blocks are
#: emitted contiguously per fragment row, and frag_meta's nblk carries the
#: per-row block count, so an exclusive cumsum reconstructs the exact
#: segmentation (zero-block rows span 0..0, matching the decoders).
#: ~22 B/frag average vs the fused buffer's 68; padding compresses on the
#: wire.
WIRE_LEN_BITS = 18
WIRE_CHROM_PAD = 0x1FFF  # 13-bit chrom field sentinel
WIRE_MAX_BLOCK_LEN = (1 << WIRE_LEN_BITS) - 1
WIRE_NBLK_BITS = 12
WIRE_MAX_NBLK = (1 << WIRE_NBLK_BITS) - 1
WIRE_REFID_PAD = 0x7FFFF  # 19-bit refid field sentinel


def pack_wire(b: "PackedBatch") -> np.ndarray:
    """Host-side wire packing from a PackedBatch's columns (the native
    decoder builds the same layout straight from its C views; both must
    stay bit-equal)."""
    return pack_wire_cols(
        b.blk_chrom, b.blk_start, b.blk_end, b.blk_strand,
        b.frag_refid, b.frag_strand, b.frag_nblk,
    )


def pack_wire_cols(
    blk_chrom, blk_start, blk_end, blk_strand,
    frag_refid, frag_strand, frag_nblk,
) -> np.ndarray:
    B = blk_chrom.shape[0]
    F = frag_refid.shape[0]
    out = np.empty(2 * B + F, np.int32)
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
    if frag_nblk.size and int(frag_nblk.max()) > WIRE_MAX_NBLK:
        raise ValueError(
            f"fragment with more than {WIRE_MAX_NBLK} aligned blocks "
            "exceeds the wire nblk field (corrupt CIGAR?)"
        )
    if frag_refid.size and int(frag_refid.max()) >= WIRE_REFID_PAD:
        raise ValueError(
            f"BAM refid >= {WIRE_REFID_PAD}: header has too many reference "
            "sequences for the 19-bit wire refid field (set IRTPU_WIRE=0)"
        )
    rfield = np.where(pad_f, WIRE_REFID_PAD, frag_refid).astype(np.uint32)
    fmeta = (
        (np.where(pad_f, 0, frag_nblk).astype(np.uint32) << 20)
        | (rfield << 1)
        | (np.where(pad_f, 0, frag_strand).astype(np.uint32) & 1)
    )
    out[o : o + F] = fmeta.view(np.int32)
    return out


def unpack_wire_cols(bs, bm, fm, lut) -> dict:
    """Device-side inverse of pack_wire over the three raw sections (jnp;
    runs inside the jitted wire step — also per-bin in the binned mesh form,
    where segmentation must respect bin boundaries).  `lut` maps BAM refid
    -> compiled chrom id (-1 unknown).  Fragment spans are reconstructed by
    segmented min/max over each row's own contiguous block run."""
    import jax
    import jax.numpy as jnp

    F = fm.shape[0]
    B = bs.shape[0]
    ln = (bm >> 14) & ((1 << WIRE_LEN_BITS) - 1)
    c13 = (bm >> 1) & 0x1FFF
    blk_chrom = jnp.where(c13 == WIRE_CHROM_PAD, -1, c13)
    blk_end = bs + ln
    nblk = (fm >> 20) & WIRE_MAX_NBLK
    r19 = (fm >> 1) & 0x7FFFF
    refid = jnp.where(r19 == WIRE_REFID_PAD, -1, r19)
    n = lut.shape[0]
    frag_chrom = jnp.where(
        (refid >= 0) & (refid < n),
        lut[jnp.clip(refid, 0, n - 1)],
        -1,
    )
    # block i belongs to the fragment row whose cumulative-block interval
    # contains i; rows beyond the real blocks (pads) go to segment F
    ends = jnp.cumsum(nblk)
    seg = jnp.searchsorted(ends, jnp.arange(B, dtype=ends.dtype), side="right")
    seg = jnp.where(blk_chrom >= 0, jnp.minimum(seg, F), F)
    fstart = jax.ops.segment_min(bs, seg, num_segments=F + 1)[:F]
    fend = jax.ops.segment_max(blk_end, seg, num_segments=F + 1)[:F]
    # unmapped-refid fragments (frag_chrom -1) have their blocks pad-encoded
    # (forced to segment F), so the segment min/max would yield INT32_MAX/MIN
    # identities; mask them to the 0..0 span the decoders emit
    has = (nblk > 0) & (frag_chrom >= 0)
    return {
        "blk_chrom": blk_chrom,
        "blk_start": bs,
        "blk_end": blk_end,
        "blk_strand": bm & 1,
        "frag_chrom": frag_chrom,
        "frag_refid": refid,
        "frag_start": jnp.where(has, fstart, 0).astype(jnp.int32),
        "frag_end": jnp.where(has, fend, 0).astype(jnp.int32),
        "frag_strand": fm & 1,
        "frag_nblk": nblk,
    }


def unpack_wire(flat, cap_blocks: int, cap_frags: int, lut) -> dict:
    """Slice the flat wire buffer into its three sections and unpack."""
    B, F = cap_blocks, cap_frags
    return unpack_wire_cols(
        flat[0:B], flat[B : 2 * B], flat[2 * B : 2 * B + F], lut
    )


#: trim_wire ship-shape quantum (rows): shipped section sizes round up to
#: multiples of this so a stream sees only a handful of distinct wire-step
#: shapes (each new shape compiles one step specialization; the persistent
#: compile cache absorbs repeats across runs)
WIRE_TRIM_QUANTUM = 8192


def trim_wire(
    w: np.ndarray, cap_blocks: int, cap_frags: int,
    n_blocks: int, n_frags: int, quantum: int = WIRE_TRIM_QUANTUM,
) -> "tuple[np.ndarray, int, int]":
    """Used-prefix wire slice at quantized shapes -> (buffer, B_ship,
    F_ship).  Decoders flush a batch when EITHER column fills, so the other
    column ships substantial padding at full caps (measured ~35% of block
    lanes on the paired-end mix, ~2.6x on --long-reads where the geometry
    ratio overshoots the actual blocks/read) — and shipped bytes are the
    e2e ceiling on weak links.  Lanes beyond the used counts are
    pad-encoded by pack_wire, so any quantized prefix >= the used count
    unpacks to identical counters (tested)."""
    B, F = cap_blocks, cap_frags
    bs = min(B, -(-max(n_blocks, 1) // quantum) * quantum)
    fs = min(F, -(-max(n_frags, 1) // quantum) * quantum)
    if bs >= B and fs >= F:
        return w, B, F
    return (
        np.concatenate([w[0:bs], w[B : B + bs], w[2 * B : 2 * B + fs]]),
        bs,
        fs,
    )


def device_batch(arrays: dict) -> dict:
    """Strip host-only (gap) columns from a raw batch-array dict so callers
    holding synthetic array dicts (bench, dry runs) ship the same column set
    as PackedBatch.device_arrays()."""
    return {k: v for k, v in arrays.items() if not k.startswith("gap_")}
