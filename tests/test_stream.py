"""Streaming decode: the pure-Python decoder must consume a live pipe
incrementally (first batch out before the writer closes), with bounded
memory — the FastQ --stream contract (VERDICT.md round 1, next-round #3)."""

import io
import os
import threading
import time

import numpy as np
import pytest

from irfinder_tpu.io import bamwrite, bgzf
from irfinder_tpu.io.bampy import decode_bam


def _bam_bytes(n_pairs: int, name0: int = 0) -> bytes:
    buf = io.BytesIO()
    recs = []
    for i in range(n_pairs):
        p = 1000 + 50 * i
        recs.extend(
            bamwrite.make_pair(f"s{name0 + i}", 0, p, "100M", p + 250, "100M")
        )
    bamwrite.write_bam(buf, ["chr21"], [46_000_000], recs)
    return buf.getvalue()


def test_first_batch_before_pipe_close():
    """A slow writer holds the pipe open until the consumer has decoded the
    first batch: only a genuinely incremental decoder can get there."""
    # two separate BAM streams concatenated won't do — build ONE stream and
    # split it at a BGZF block boundary past the first half of the records
    full = io.BytesIO()
    recs = []
    for i in range(3000):
        p = 1000 + 50 * i
        recs.extend(bamwrite.make_pair(f"s{i}", 0, p, "100M", p + 250, "100M"))
    bamwrite.write_bam(full, ["chr21"], [46_000_000], recs)
    data = full.getvalue()
    half = _block_boundary_after(data, len(data) // 2)

    r_fd, w_fd = os.pipe()
    got_first = threading.Event()
    writer_done = {"before_close": None}

    def writer():
        with os.fdopen(w_fd, "wb") as w:
            w.write(data[:half])
            w.flush()
            # wait (bounded) for the consumer to see the first batch while
            # the pipe is still open
            writer_done["before_close"] = got_first.wait(timeout=30)
            w.write(data[half:])

    t = threading.Thread(target=writer)
    t.start()
    with os.fdopen(r_fd, "rb") as r:
        header, batches, stats = decode_bam(r, {"chr21": 0}, cap_frags=256)
        n_frags = 0
        for i, b in enumerate(batches):
            if i == 0:
                got_first.set()
            n_frags += b.n_frags
    t.join()
    assert writer_done["before_close"] is True, (
        "first batch was not decoded before the pipe closed: decoder is "
        "not streaming"
    )
    assert n_frags == 3000
    assert stats.reads_total == 6000


def _block_boundary_after(data: bytes, target: int) -> int:
    """Offset of the first BGZF block boundary at/after `target`."""
    import struct

    off = 0
    while off < len(data):
        xlen = struct.unpack_from("<H", data, off + 10)[0]
        xo = off + 12
        bsize = None
        end = xo + xlen
        while xo + 4 <= end:
            si1, si2 = data[xo], data[xo + 1]
            slen = struct.unpack_from("<H", data, xo + 2)[0]
            if si1 == 66 and si2 == 67 and slen == 2:
                bsize = struct.unpack_from("<H", data, xo + 4)[0] + 1
            xo += 4 + slen
        off += bsize
        if off >= target:
            return off
    return len(data)


def test_stream_equals_file_decode():
    """Pipe-fed streaming decode produces the identical batch stream as a
    file decode."""
    data = _bam_bytes(2000)
    h1, b1, s1 = decode_bam(io.BytesIO(data), {"chr21": 0}, cap_frags=128)
    l1 = list(b1)

    r_fd, w_fd = os.pipe()

    def writer():
        with os.fdopen(w_fd, "wb") as w:
            for i in range(0, len(data), 999):  # dribble odd-sized chunks
                w.write(data[i : i + 999])
                if i % 9990 == 0:
                    time.sleep(0.001)

    t = threading.Thread(target=writer)
    t.start()
    with os.fdopen(r_fd, "rb") as r:
        h2, b2, s2 = decode_bam(r, {"chr21": 0}, cap_frags=128)
        l2 = list(b2)
    t.join()
    assert h1.ref_names == h2.ref_names
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        for k in ("blk_chrom", "blk_start", "blk_end", "frag_chrom"):
            assert np.array_equal(getattr(a, k), getattr(b, k))
    assert (s1.reads_total, s1.fragments) == (s2.reads_total, s2.fragments)


def test_stream_reader_tell_and_skip():
    """StreamReader.tell/skip_to round-trip: re-opening the stream and
    skipping to a recorded offset resumes at the identical record."""
    from irfinder_tpu.io.bampy import StreamReader, stream_header, stream_reads

    data = _bam_bytes(500)
    sr = StreamReader(io.BytesIO(data))
    stream_header(sr)
    reads = stream_reads(sr)
    seen = []
    for _ in range(300):
        seen.append(next(reads))
    mark = sr.tell()
    rest = [r for r in reads]

    sr2 = StreamReader(io.BytesIO(data))
    sr2.skip_to(mark)
    rest2 = [r for r in stream_reads(sr2)]
    assert len(rest) == len(rest2)
    for a, b in zip(rest, rest2):
        assert (a is None) == (b is None)
        if a is not None:
            assert (a.name, a.blocks, a.gaps) == (b.name, b.blocks, b.gaps)
