"""JuncTally: the vectorized host-side junction accumulator
(irfinder_tpu/junctions.py) vs a scalar dict reference."""

import numpy as np
import pytest

import irfinder_tpu.junctions as J
from irfinder_tpu.junctions import JuncTally, coerce_tally


class FakeBatch:
    def __init__(self, rows):
        rows = np.asarray(rows, dtype=np.int32).reshape(-1, 4)
        self.n_gaps = len(rows)
        self.gap_chrom = rows[:, 0]
        self.gap_start = rows[:, 1]
        self.gap_end = rows[:, 2]
        self.gap_strand = rows[:, 3]


def dict_reference(batches):
    tally = {}
    for b in batches:
        for i in range(b.n_gaps):
            c = int(b.gap_chrom[i])
            if c < 0:
                continue
            key = (c, int(b.gap_start[i]), int(b.gap_end[i]))
            slot = tally.setdefault(key, [0, 0])
            slot[int(b.gap_strand[i])] += 1
    return tally


def random_batches(rng, n_batches, n_gaps, n_chroms=3, coord_span=50):
    out = []
    for _ in range(n_batches):
        rows = np.stack(
            [
                rng.integers(-1, n_chroms, n_gaps),  # -1 = pad lane
                rng.integers(0, coord_span, n_gaps),
                rng.integers(coord_span, 2 * coord_span, n_gaps),
                rng.integers(0, 2, n_gaps),
            ],
            axis=1,
        )
        out.append(FakeBatch(rows))
    return out


def test_matches_dict_reference():
    rng = np.random.default_rng(0)
    batches = random_batches(rng, 20, 300)
    t = JuncTally()
    for b in batches:
        t.add_batch(b)
    assert t.as_dict() == dict_reference(batches)


def test_merged_sorted_and_incremental_compaction(monkeypatch):
    # force a compaction every ~2 batches to exercise the merge path
    monkeypatch.setattr(J, "COMPACT_ROWS", 400)
    rng = np.random.default_rng(1)
    batches = random_batches(rng, 30, 250)
    t = JuncTally()
    for b in batches:
        t.add_batch(b)
    keys, vals = t.merged()
    assert keys.dtype == np.int64 and vals.dtype == np.int64
    # lexicographic (chrom, start, end) order, unique rows
    order = np.lexsort((keys[:, 2], keys[:, 1], keys[:, 0]))
    np.testing.assert_array_equal(order, np.arange(len(keys)))
    assert len(np.unique(keys, axis=0)) == len(keys)
    assert t.as_dict() == dict_reference(batches)


def test_add_rows_merges_counts():
    rng = np.random.default_rng(2)
    batches = random_batches(rng, 8, 200)
    whole = JuncTally()
    for b in batches:
        whole.add_batch(b)
    # split across two tallies, then merge via add_rows (checkpoint restore path)
    a, b_ = JuncTally(), JuncTally()
    for i, b in enumerate(batches):
        (a if i % 2 else b_).add_batch(b)
    merged = JuncTally()
    merged.add_rows(*a.merged())
    merged.add_rows(*b_.merged())
    ka, va = whole.merged()
    kb, vb = merged.merged()
    np.testing.assert_array_equal(ka, kb)
    np.testing.assert_array_equal(va, vb)


def test_coerce_tally_roundtrip():
    d = {(0, 5, 9): [2, 1], (1, 3, 7): [0, 4]}
    t = coerce_tally(d)
    assert t.as_dict() == d
    assert coerce_tally(t) is t
    assert not JuncTally()
    assert t


def test_empty_and_padded_batches():
    t = JuncTally()
    t.add_batch(FakeBatch(np.zeros((0, 4))))
    t.add_batch(FakeBatch([[-1, 1, 2, 0]]))  # all pad lanes
    keys, vals = t.merged()
    assert len(keys) == 0 and len(vals) == 0
    assert t.as_dict() == {}
