"""Decoder resume tokens (VERDICT.md round 1, next-round #4): resuming from
a batch's token reproduces the remaining stream exactly, across BOTH decoders
(the binary token format is shared), and the native decoder seeks by BGZF
block arithmetic instead of re-inflating the skipped prefix."""

import os

import numpy as np
import pytest

from irfinder_tpu.io.bamgen import write_realistic_bam
from irfinder_tpu.io.bampy import decode_bam
from irfinder_tpu.synth import synth_ref

COLS = (
    "blk_chrom", "blk_start", "blk_end", "blk_strand",
    "gap_chrom", "gap_start", "gap_end", "gap_strand",
    "frag_chrom", "frag_refid", "frag_start", "frag_end", "frag_strand",
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    ref = synth_ref(n_genes=40)
    path = str(tmp_path_factory.mktemp("resume") / "mix.bam")
    write_realistic_bam(path, ref, n_pairs=6_000, seed=3)
    chrom_index = {c: i for i, c in enumerate(ref.chroms)}
    return ref, path, chrom_index


def _batches_py(path, chrom_index, token=None, cap=512):
    with open(path, "rb") as fh:
        _, b, st = decode_bam(fh, chrom_index, cap_frags=cap, resume_token=token)
        return list(b), st


def _batches_native(path, chrom_index, token=None, cap=512):
    from irfinder_tpu.native.bamdecode import decode_bam_native

    _, b, st = decode_bam_native(path, chrom_index, cap_frags=cap, resume_token=token)
    return list(b), st


def _assert_stream_equal(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert (x.n_blocks, x.n_gaps, x.n_frags, x.n_reads) == (
            y.n_blocks, y.n_gaps, y.n_frags, y.n_reads,
        )
        for k in COLS:
            assert np.array_equal(getattr(x, k), getattr(y, k)), k


@pytest.mark.parametrize("k", [0, 3, 7])
def test_python_token_roundtrip(setup, k):
    _, path, ci = setup
    full, st_full = _batches_py(path, ci)
    assert k < len(full) - 1
    resumed, st_res = _batches_py(path, ci, token=full[k].resume_token)
    _assert_stream_equal(full[k + 1 :], resumed)
    assert st_res.reads_total == st_full.reads_total
    assert st_res.fragments == st_full.fragments


def test_cross_decoder_tokens(setup):
    _, path, ci = setup
    try:
        full_n, _ = _batches_native(path, ci)
    except Exception:
        pytest.skip("native decoder unavailable")
    full_p, _ = _batches_py(path, ci)
    _assert_stream_equal(full_n, full_p)
    k = len(full_n) // 2
    # python token -> native resume
    res_n, st_n = _batches_native(path, ci, token=full_p[k].resume_token)
    _assert_stream_equal(full_p[k + 1 :], res_n)
    # native token -> python resume
    res_p, _ = _batches_py(path, ci, token=full_n[k].resume_token)
    _assert_stream_equal(full_n[k + 1 :], res_p)


def test_native_resume_skips_inflation(setup):
    """Seek-resume proof: the resumed native decoder inflates only the
    remaining blocks (cost independent of position in the BAM)."""
    _, path, ci = setup
    try:
        full, st_full = _batches_native(path, ci)
    except Exception:
        pytest.skip("native decoder unavailable")
    k = len(full) - 2
    _, st_res = _batches_native(path, ci, token=full[k].resume_token)
    assert st_res.blocks_inflated < max(4, st_full.blocks_inflated // 2), (
        f"resume inflated {st_res.blocks_inflated} of "
        f"{st_full.blocks_inflated} blocks: not seeking"
    )


def test_token_after_last_batch_resumes_empty(setup):
    _, path, ci = setup
    full, _ = _batches_py(path, ci)
    # the LAST token (from the last capacity-flushed batch) reproduces only
    # the tail batches; resume from it and re-resume transitively
    resumed, _ = _batches_py(path, ci, token=full[-2].resume_token if len(full) > 1 else full[0].resume_token)
    assert len(resumed) >= 1


def test_corrupt_token_rejected(setup):
    """Fault injection (SURVEY.md §5.3): mangled resume tokens fail with a
    diagnosable error in BOTH decoders, never silent garbage."""
    _, path, ci = setup
    full, _ = _batches_py(path, ci)
    tok = bytearray(full[2].resume_token)
    tok[0] ^= 0xFF  # break the magic
    with pytest.raises(ValueError, match="magic"):
        _batches_py(path, ci, token=bytes(tok))
    try:
        from irfinder_tpu.native.bamdecode import decode_bam_native  # noqa: F401
    except Exception:
        pytest.skip("native decoder unavailable")
    with pytest.raises(ValueError, match="magic|token"):
        _batches_native(path, ci, token=bytes(tok))
    # truncated token
    short = full[2].resume_token[: len(full[2].resume_token) // 2]
    with pytest.raises(Exception):
        _batches_py(path, ci, token=short)
    with pytest.raises(ValueError):
        _batches_native(path, ci, token=short)


def test_offset_beyond_eof_rejected(setup):
    """A token whose logical offset exceeds the BAM fails cleanly."""
    import struct

    _, path, ci = setup
    full, _ = _batches_py(path, ci)
    tok = bytearray(full[2].resume_token)
    struct.pack_into("<Q", tok, 4, 1 << 60)  # absurd offset
    with pytest.raises(ValueError):
        _batches_py(path, ci, token=bytes(tok))
    try:
        from irfinder_tpu.native.bamdecode import decode_bam_native  # noqa: F401
    except Exception:
        pytest.skip("native decoder unavailable")
    with pytest.raises(ValueError):
        _batches_native(path, ci, token=bytes(tok))
