"""Checkpoint / resume for long counting runs (SURVEY.md §5.3-5.4).

The reference has no restartability: a killed run is redone from scratch [R].
Here the whole accumulation state is tiny and additive — one flat int32
counter vector (O(#introns + MBS)) plus the host-side sparse junction tally —
so a snapshot every N batches makes 50M-read runs (BASELINE config C) cheaply
recoverable.

Resume strategy: the decoder stream is deterministic for a given BAM and
capacity, so the snapshot records `batches_done` and resume simply re-decodes
and skips that many batches (host-side skip only; no device work).  This
works identically for the native C++ and the Python decoder, costs no decoder
API surface, and keeps bit-identical results (the counters are restored
exactly; skipped batches contribute nothing twice).

Snapshots are written atomically (tmp + rename) as one .npz.
"""

from __future__ import annotations

import os

import numpy as np


def save_checkpoint(path: str, st, engine=None) -> None:
    """Snapshot a SampleState: counters (D2H), junction tally, progress."""
    from .junctions import coerce_tally

    keys, vals = coerce_tally(st.junc_tally).merged()  # (n,3)/(n,2) int64
    tmp = path + ".tmp"
    np.savez_compressed(
        tmp if tmp.endswith(".npz") else tmp,
        cnt=np.asarray(st.counters["cnt"]),
        chrn=np.asarray(st.counters["chr"]),
        junc_keys=keys,
        junc_vals=vals,
        batches_done=np.int64(st.metrics.batches),
        n_refids=np.int64(st.n_refids),
    )
    # np.savez appends .npz when missing
    actual_tmp = tmp if os.path.exists(tmp) else tmp + ".npz"
    os.replace(actual_tmp, path)


def load_checkpoint(path: str):
    """Returns ((cnt, chr) ndarrays, JuncTally, batches_done, n_refids) or
    None when no checkpoint exists."""
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
        return (cnt, chrn), tally, int(z["batches_done"]), int(z["n_refids"])


def restore_state(engine, ckpt) -> "SampleState":
    """Build a SampleState out of a loaded checkpoint tuple."""
    import jax.numpy as jnp

    (cnt, chrn), tally, batches_done, n_refids = ckpt
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
    return st
