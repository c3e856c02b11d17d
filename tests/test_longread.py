"""Long-read spliced alignments (late-reference long-read mode, SURVEY.md §2
row 1 [R:verify]): a single read with O(100) exon blocks flows through both
decoders and the engine mechanically — the block/gap model and the 4096-block
batch floor admit it without a special mode; counters match the oracle."""

import io

import numpy as np
import pytest

from irfinder_tpu.engine import Engine
from irfinder_tpu.io import bamwrite
from irfinder_tpu.io.bampy import decode_bam
from irfinder_tpu.oracle import OracleCounters
from irfinder_tpu.synth import synth_ref


def _longread_bam(ref, n_exons=120, n_reads=8):
    """Reads with n_exons aligned blocks each (a full-length transcript
    alignment, nanopore/pacbio style): 100M + N-gap ladders.  The FIRST gap
    of each read lands exactly on an annotated intron (SpliceExact hit);
    the rest are novel junctions."""
    recs = []
    for r in range(n_reads):
        k = r * 3
        istart, iend = int(ref.intron_start[k]), int(ref.intron_end[k])
        chrom = int(ref.intron_chrom[k])
        base = istart - 100
        cig = [(100, "M"), (iend - istart, "N")]
        for _ in range(n_exons - 1):
            cig.append((100, "M"))
            cig.append((500, "N"))
        cig.append((100, "M"))
        cigar = "".join(f"{ln}{op}" for ln, op in cig)
        recs.append(bamwrite.make_single(f"lr{r}", chrom, base, cigar, mapq=60))
    buf = io.BytesIO()
    bamwrite.write_bam(buf, ref.chroms, [2_000_000_000] * len(ref.chroms), recs)
    return buf.getvalue()


def test_longread_through_engine():
    ref = synth_ref(n_genes=400)
    bam = _longread_bam(ref)
    ci = {c: i for i, c in enumerate(ref.chroms)}

    _, batches, stats = decode_bam(io.BytesIO(bam), ci, cap_frags=64)
    batches = list(batches)
    assert stats.reads_total == 8
    n_blocks = sum(b.n_blocks for b in batches)
    n_gaps = sum(b.n_gaps for b in batches)
    assert n_blocks > 8 * 50, "long reads should decode to many blocks"
    assert n_gaps > 8 * 50

    orc = OracleCounters.create(ref)
    for b in batches:
        orc.add_batch(b)

    eng = Engine(ref, cap_frags=64)
    eng._device_stats = False
    eng.reset(n_refids=len(ref.chroms))
    _, batches2, _ = decode_bam(io.BytesIO(bam), ci, cap_frags=64)
    eng.run_stream(batches2)
    fc = eng.counters_host()
    np.testing.assert_array_equal(np.asarray(fc["depth"]), orc.depth)
    np.testing.assert_array_equal(fc["exact_cnt"], orc.exact_cnt)
    np.testing.assert_array_equal(fc["span_hits"], orc.span_hits)
    # each read's first gap lands exactly on its annotated intron
    assert orc.exact_cnt.sum() == 8


def test_longread_native_parity(tmp_path):
    ref = synth_ref(n_genes=400)
    bam = _longread_bam(ref)
    path = str(tmp_path / "lr.bam")
    open(path, "wb").write(bam)
    ci = {c: i for i, c in enumerate(ref.chroms)}
    _, pb, _ = decode_bam(io.BytesIO(bam), ci, cap_frags=64)
    py = list(pb)
    try:
        from irfinder_tpu.native.bamdecode import decode_bam_native
    except Exception:
        pytest.skip("native decoder unavailable")
    _, nb, _ = decode_bam_native(path, ci, cap_frags=64)
    nat = list(nb)
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        for k in ("blk_chrom", "blk_start", "blk_end", "gap_start", "gap_end"):
            assert np.array_equal(getattr(a, k), getattr(b, k)), k
