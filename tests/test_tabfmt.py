"""Byte-parity of the native bulk table formatter (native/tabfmt) against
the per-line Python writers in irfinder_tpu/format.py — the Python loop is
the formatting SPEC (pinned against goldens when available); the native
path must reproduce it exactly, including C printf %g float rendering.
"""

from __future__ import annotations

import io

import numpy as np
import pytest

from irfinder_tpu.native import tabfmt

pytestmark = pytest.mark.skipif(
    not tabfmt.available(), reason="native toolchain unavailable"
)


def test_int_column_parity():
    rng = np.random.default_rng(0)
    vals = np.concatenate(
        [
            rng.integers(-(2**62), 2**62, 5000),
            np.array([0, -1, 1, 2**63 - 1, -(2**63)]),
        ]
    )
    got = tabfmt.format_table([("i", vals)]).decode()
    want = "".join(f"{int(v)}\n" for v in vals)
    assert got == want


def test_float_g_column_parity():
    rng = np.random.default_rng(1)
    vals = np.concatenate(
        [
            rng.random(20000),  # typical ratios/coverages
            rng.random(2000) * 1e6,  # depths
            rng.random(2000) * 1e-8,  # tiny -> exponent form
            10.0 ** rng.uniform(-300, 300, 2000) * rng.choice([1, -1], 2000),
            np.array([0.0, -0.0, 1.0, 0.1, 1e-5, 1e-4, 123456.5, 999999.5,
                      1234567.0, 5e-324, 1.7976931348623157e308]),
        ]
    )
    got = tabfmt.format_table([("g", vals)]).decode()
    want = "".join(f"{float(v):g}\n" for v in vals)
    assert got == want


def test_string_pool_and_mixed_columns():
    rng = np.random.default_rng(2)
    n = 3000
    pool = ["chr1", "chr2", "chrX", "some/gene/name-1", ""]
    idx = rng.integers(0, len(pool), n).astype(np.int32)
    iv = rng.integers(0, 10**9, n)
    fv = rng.random(n) * 37
    got = tabfmt.format_table([("s", idx, pool), ("i", iv), ("g", fv)]).decode()
    want = "".join(
        f"{pool[i]}\t{v}\t{f:g}\n"
        for i, v, f in zip(idx.tolist(), iv.tolist(), fv.tolist())
    )
    assert got == want


def test_write_ir_table_native_matches_loop():
    """Engine path (IRTable -> native render) vs spec path (row loop)."""
    from irfinder_tpu import format as fmt
    from irfinder_tpu.finalize import IRTable, intron_table, intron_rows
    from irfinder_tpu.oracle import OracleCounters
    from irfinder_tpu.synth import synth_ref

    ref = synth_ref(n_genes=40)
    rng = np.random.default_rng(3)
    depth = rng.integers(0, 50, (2, ref.mbs_size)).astype(np.int64)
    start_cnt = rng.integers(0, 20, (2, ref.bstart_coord.size))
    end_cnt = rng.integers(0, 20, (2, ref.bend_coord.size))
    exact_cnt = rng.integers(0, 20, (2, ref.upair_start.size))
    span_hits = rng.integers(0, 20, (2, ref.point_coord.size))
    for mode, flip in (("nondir", False), ("dir", False), ("dir", True)):
        table = intron_table(
            ref, depth, start_cnt, end_cnt, exact_cnt, span_hits,
            mode=mode, flip_strand=flip,
        )
        rows = intron_rows(
            ref, depth, start_cnt, end_cnt, exact_cnt, span_hits,
            mode=mode, flip_strand=flip,
        )
        a, b = io.StringIO(), io.StringIO()
        fmt.write_ir_table(a, table)
        fmt.write_ir_table(b, rows)
        assert a.getvalue() == b.getvalue(), f"mode={mode} flip={flip}"
        # IRTable iterates as IntronRow records (compat surface)
        assert [r.name for r in table][:3] == [r.name for r in rows][:3]


def test_ratio_warning_arrays_match_scalar():
    from irfinder_tpu import semantics as S
    from irfinder_tpu.finalize import ratio_warning_arrays

    rng = np.random.default_rng(4)
    n = 5000
    a = {
        "mean": np.concatenate([rng.random(n) * 10, np.zeros(8)]),
        "sl": np.concatenate([rng.integers(0, 30, n), np.zeros(8, np.int64)]),
        "sr": np.concatenate([rng.integers(0, 30, n), np.zeros(8, np.int64)]),
        "sx": np.concatenate([rng.integers(0, 30, n), np.zeros(8, np.int64)]),
        "p25": np.concatenate([rng.integers(0, 30, n), np.zeros(8, np.int64)]),
        "p75": np.concatenate([rng.integers(0, 60, n), np.zeros(8, np.int64)]),
    }
    ratio, widx = ratio_warning_arrays(a)
    pool = [S.WARNING_NONE, *S.WARNING_ORDER]
    for i in range(len(a["mean"])):
        want_r = S.ir_ratio(float(a["mean"][i]), int(a["sl"][i]), int(a["sr"][i]))
        assert ratio[i] == want_r, i
        want_w = S.warning_flag(
            float(a["mean"][i]), int(a["p25"][i]), int(a["p75"][i]),
            int(a["sl"][i]), int(a["sr"][i]), int(a["sx"][i]),
        )
        assert pool[widx[i]] == want_w, i


def test_write_junc_and_spans_native_matches_loop(monkeypatch):
    from irfinder_tpu import format as fmt
    from irfinder_tpu.synth import synth_ref

    ref = synth_ref(n_genes=40)
    rng = np.random.default_rng(5)
    # junc table via a plain dict tally
    tally = {}
    for _ in range(500):
        k = (int(rng.integers(0, 1)), int(rng.integers(0, 10**7)),
             int(rng.integers(0, 10**7)))
        tally[k] = [int(rng.integers(0, 90)), int(rng.integers(0, 90))]
    span_hits = rng.integers(0, 99, (2, ref.point_coord.size))

    outs = {}
    for native in (True, False):
        if not native:
            monkeypatch.setattr(fmt, "_native_render", lambda cols: None)
        a, b = io.StringIO(), io.StringIO()
        fmt.write_junc_count(a, ref.chroms, dict(tally))
        fmt.write_spans_point(b, ref, span_hits)
        outs[native] = (a.getvalue(), b.getvalue())
    assert outs[True] == outs[False]
