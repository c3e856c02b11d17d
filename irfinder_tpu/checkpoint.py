"""Checkpoint / resume for long counting runs (SURVEY.md §5.3-5.4).

The reference has no restartability: a killed run is redone from scratch [R].
Here the whole accumulation state is tiny and additive — one flat int32
counter vector (O(#introns + MBS)) plus the host-side sparse junction tally —
so a snapshot every N batches makes 50M-read runs (BASELINE config C) cheaply
recoverable.

Resume strategy: the snapshot records the decoder's RESUME TOKEN (logical
BGZF-stream offset + mate-pairing carry state, io/bampy.py format, shared
bit-for-bit by the native and Python decoders).  Resume re-opens the BAM with
the token: the decoder seeks to the offset by per-block header arithmetic
(no inflation of the skipped prefix), so resume cost is independent of
position in the BAM.  Snapshots from before the token existed still resume
via the legacy re-decode-and-skip path (engine.run_bam).

Snapshots are written atomically (tmp + rename) as one UNCOMPRESSED .npz:
whole-genome counters are ~2.4 GB and savez_compressed stalls the stream for
tens of seconds per snapshot; raw writes are disk-bandwidth-bound.
"""

from __future__ import annotations

import os

import numpy as np


def save_checkpoint(path: str, st, engine=None) -> None:
    """Snapshot a SampleState: counters (D2H), junction tally, progress,
    decoder resume token."""
    from .junctions import coerce_tally

    keys, vals = coerce_tally(st.junc_tally).merged()  # (n,3)/(n,2) int64
    tmp = path + ".tmp"
    token = np.frombuffer(st.resume_token, dtype=np.uint8) if st.resume_token else np.zeros(0, np.uint8)
    np.savez(
        tmp,
        cnt=np.asarray(st.counters["cnt"]),
        chrn=np.asarray(st.counters["chr"]),
        junc_keys=keys,
        junc_vals=vals,
        batches_done=np.int64(st.metrics.batches),
        n_refids=np.int64(st.n_refids),
        resume_token=token,
    )
    # np.savez appends .npz when missing
    actual_tmp = tmp if os.path.exists(tmp) else tmp + ".npz"
    os.replace(actual_tmp, path)


def load_checkpoint(path: str):
    """Returns ((cnt, chr) ndarrays, JuncTally, batches_done, n_refids,
    resume_token-or-None) or None when no checkpoint exists."""
    from .junctions import JuncTally

    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        cnt = z["cnt"]
        if "chrn" not in z:
            raise ValueError(
                f"checkpoint {path} uses the old single-array counter layout "
                "(before the per-refid tally split); it cannot be resumed — "
                "delete it and rerun"
            )
        chrn = z["chrn"]
        tally = JuncTally()
        tally.add_rows(z["junc_keys"], z["junc_vals"])
        token = bytes(z["resume_token"].tobytes()) if "resume_token" in z else b""
        return (
            (cnt, chrn),
            tally,
            int(z["batches_done"]),
            int(z["n_refids"]),
            token or None,
        )


def restore_state(engine, ckpt) -> "SampleState":
    """Build a SampleState out of a loaded checkpoint tuple."""
    import jax.numpy as jnp

    (cnt, chrn), tally, batches_done, n_refids = ckpt[:4]
    token = ckpt[4] if len(ckpt) > 4 else None
    st = engine.new_state(n_refids=n_refids)
    if (
        st.counters["cnt"].shape != cnt.shape
        or st.counters["chr"].shape != chrn.shape
    ):
        raise ValueError(
            "checkpoint counter shape mismatch: reference or refid count "
            f"changed ({st.counters['cnt'].shape} vs {cnt.shape})"
        )
    st.counters = {"cnt": jnp.asarray(cnt), "chr": jnp.asarray(chrn)}
    st.junc_tally = tally
    st.metrics.batches = batches_done
    st.resume_token = token
    return st
