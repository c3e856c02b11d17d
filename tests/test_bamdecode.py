"""Native C++ decoder vs pure-Python decoder: bit-identical PackedBatch
streams (the conformance contract in irfinder_tpu/io/bampy.py's docstring).
Skipped when the native toolchain can't build the library."""

import io
import os

import numpy as np
import pytest

from irfinder_tpu.io.bampy import decode_bam

from test_oracle import CHROM_INDEX, random_bam_bytes

nat = pytest.importorskip("irfinder_tpu.native.bamdecode")


@pytest.fixture(scope="module")
def lib():
    try:
        return nat.load_library()
    except Exception as e:  # no toolchain
        pytest.skip(f"native build unavailable: {e}")


def _batches_py(bam_bytes, cap):
    hdr, gen, stats = decode_bam(io.BytesIO(bam_bytes), CHROM_INDEX, cap_frags=cap)
    return hdr, list(gen), stats


def _batches_native(path, cap, threads=4):
    hdr, gen, stats = nat.decode_bam_native(path, CHROM_INDEX, cap_frags=cap, n_threads=threads)
    return hdr, list(gen), stats


COLS = [
    "blk_chrom", "blk_start", "blk_end", "blk_strand",
    "gap_chrom", "gap_start", "gap_end", "gap_strand",
    "frag_chrom", "frag_refid", "frag_start", "frag_end", "frag_strand",
]


@pytest.mark.parametrize("cap,threads", [(1 << 15, 4), (13, 1), (13, 8)])
def test_native_matches_python(lib, tmp_path, cap, threads):
    bam = random_bam_bytes(seed=21, n_frags=400)
    p = tmp_path / "t.bam"
    p.write_bytes(bam)
    hdr_a, py, st_a = _batches_py(bam, cap)
    hdr_b, nt, st_b = _batches_native(str(p), cap, threads)
    assert hdr_a.ref_names == hdr_b.ref_names
    assert hdr_a.ref_lengths == hdr_b.ref_lengths
    assert len(py) == len(nt)
    for i, (a, b) in enumerate(zip(py, nt)):
        assert (a.n_blocks, a.n_gaps, a.n_frags, a.n_reads) == (
            b.n_blocks, b.n_gaps, b.n_frags, b.n_reads,
        ), f"batch {i} counts"
        for c in COLS:
            np.testing.assert_array_equal(
                getattr(a, c), getattr(b, c), err_msg=f"batch {i} col {c}"
            )
    assert (st_a.reads_total, st_a.reads_admitted, st_a.fragments, st_a.pairs, st_a.singles) == (
        st_b.reads_total, st_b.reads_admitted, st_b.fragments, st_b.pairs, st_b.singles,
    )


def test_native_corrupt_bgzf(lib, tmp_path):
    bam = bytearray(random_bam_bytes(seed=22, n_frags=50))
    bam[len(bam) // 2] ^= 0xFF  # flip a byte mid-file
    p = tmp_path / "bad.bam"
    p.write_bytes(bytes(bam))
    with pytest.raises(ValueError):
        hdr, gen, _ = nat.decode_bam_native(str(p), CHROM_INDEX)
        list(gen)


def test_native_truncated(lib, tmp_path):
    bam = random_bam_bytes(seed=23, n_frags=50)
    p = tmp_path / "trunc.bam"
    p.write_bytes(bam[: len(bam) // 2])
    with pytest.raises(ValueError):
        hdr, gen, _ = nat.decode_bam_native(str(p), CHROM_INDEX)
        list(gen)


def test_native_empty_file(lib, tmp_path):
    p = tmp_path / "empty.bam"
    p.write_bytes(b"")
    with pytest.raises(ValueError):
        hdr, gen, _ = nat.decode_bam_native(str(p), CHROM_INDEX)
        list(gen)


@pytest.mark.parametrize("target,exe", [("asan", "smoke_asan"), ("tsan", "smoke_tsan")])
def test_sanitizer_smoke(lib, tmp_path, target, exe):
    """Run the decoder under ASan/TSan on a multi-threaded decode (SURVEY.md
    §5.2 — the decoder is the only threaded native code)."""
    import subprocess

    from irfinder_tpu.native import _NATIVE_ROOT

    d = os.path.join(_NATIVE_ROOT, "bamdecode")
    r = subprocess.run(["make", "-C", d, target], capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"sanitizer build unavailable: {r.stderr[-200:]}")
    bam = tmp_path / "s.bam"
    bam.write_bytes(random_bam_bytes(seed=3, n_frags=500))
    p = subprocess.run(
        [os.path.join(d, exe), str(bam), "8"], capture_output=True, text=True, timeout=120
    )
    assert p.returncode == 0, p.stderr[-800:]
    assert "SUMMARY" not in p.stderr  # sanitizer reports print SUMMARY lines
    # streaming (pipe) mode: same decode through the reader thread +
    # compressed ring; checksums must match the file path exactly
    with open(bam, "rb") as fh:
        ps = subprocess.run(
            [os.path.join(d, exe), "-", "8"], stdin=fh,
            capture_output=True, text=True, timeout=120,
        )
    assert ps.returncode == 0, ps.stderr[-800:]
    assert "SUMMARY" not in ps.stderr
    assert ps.stdout == p.stdout, "stream checksum != file checksum"


# ---- streaming (pipe) mode: bd_open_fd -------------------------------------

def _batches_fd(fd, cap, threads=4, tee_fd=-1):
    hdr, gen, stats = nat.decode_bam_native_fd(
        fd, CHROM_INDEX, cap_frags=cap, n_threads=threads, tee_fd=tee_fd
    )
    return hdr, list(gen), stats


@pytest.mark.parametrize("cap,threads", [(1 << 15, 4), (13, 2)])
def test_fd_pipe_matches_file(lib, tmp_path, cap, threads):
    """The streaming decoder off an os.pipe emits the identical batch stream
    as the mmap file path (FastQ --stream contract, SURVEY.md §3.2)."""
    import threading

    bam = random_bam_bytes(seed=31, n_frags=400)
    p = tmp_path / "t.bam"
    p.write_bytes(bam)
    _, file_b, st_f = _batches_native(str(p), cap, threads)

    r_fd, w_fd = os.pipe()

    def writer():
        with os.fdopen(w_fd, "wb") as w:
            w.write(bam)

    t = threading.Thread(target=writer)
    t.start()
    _, pipe_b, st_p = _batches_fd(r_fd, cap, threads)
    t.join()
    os.close(r_fd)
    assert len(file_b) == len(pipe_b)
    for i, (a, b) in enumerate(zip(file_b, pipe_b)):
        for c in COLS:
            np.testing.assert_array_equal(
                getattr(a, c), getattr(b, c), err_msg=f"batch {i} col {c}"
            )
    assert st_f.reads_total == st_p.reads_total
    assert st_f.fragments == st_p.fragments


def test_fd_incremental_and_tee(lib, tmp_path):
    """First batch must come out while the writer still holds the pipe open
    (genuine streaming), and tee_fd must spool the raw bytes exactly."""
    import threading

    bam = random_bam_bytes(seed=32, n_frags=3000)
    r_fd, w_fd = os.pipe()
    got_first = threading.Event()
    held = {}

    def writer():
        with os.fdopen(w_fd, "wb") as w:
            w.write(bam[: len(bam) // 2])
            w.flush()
            held["open"] = got_first.wait(timeout=30)
            w.write(bam[len(bam) // 2:])

    t = threading.Thread(target=writer)
    t.start()
    tee_path = tmp_path / "spool.bam"
    tee = open(tee_path, "wb")
    hdr, gen, stats = nat.decode_bam_native_fd(
        r_fd, CHROM_INDEX, cap_frags=64, tee_fd=tee.fileno()
    )
    n = 0
    for b in gen:
        n += b.n_frags
        got_first.set()
    t.join()
    os.close(r_fd)
    tee.close()
    assert held["open"], "first batch only after pipe close: not streaming"
    assert n == stats.fragments > 0
    assert tee_path.read_bytes() == bam


def test_fd_corrupt_stream(lib):
    """A corrupt BGZF member mid-stream surfaces as ValueError, not a hang."""
    import threading

    bam = bytearray(random_bam_bytes(seed=33, n_frags=200))
    bam[len(bam) // 2] ^= 0xFF
    r_fd, w_fd = os.pipe()

    def writer():
        with os.fdopen(w_fd, "wb") as w:
            try:
                w.write(bytes(bam))
            except BrokenPipeError:
                pass

    t = threading.Thread(target=writer)
    t.start()
    with pytest.raises(ValueError):
        _batches_fd(r_fd, 1 << 15)
    t.join()
    os.close(r_fd)
