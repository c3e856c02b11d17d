"""Transport probe (round-4 verdict #4): the transfer schedule must be
measured, not assumed from the backend name.  On CPU/virtual-mesh backends
choose_defer short-circuits to eager; on TPU backends it A/Bs the two
schedules (probe_link) unless IRTPU_DEFER overrides.  decide_defer is the
asymmetric decision rule; both schedules' correctness is covered by the
IRTPU_DEFER=force e2e tests (test_engine.py / test_engine_mesh.py) plus the
real-hardware eager lane in test_tpu_hw.py.
"""

from __future__ import annotations

import json
import os

import pytest

from irfinder_tpu import transport
from irfinder_tpu.transport import LinkProfile, choose_defer, decide_defer


def test_decide_defer_rule():
    assert decide_defer(10.0, 1.0) is True  # collapsing link: defer
    assert decide_defer(0.5, 1.0) is False  # healthy link: eager wins
    assert decide_defer(1.0, 1.0) is False  # tie: eager (deferred pays a
    # burst-tail penalty at e2e scale on non-collapsing links)
    assert decide_defer(1.2, 1.0) is False  # noise band: eager
    assert decide_defer(1.5, 1.0) is True  # clear eager loss: defer


def test_choose_defer_cpu_is_eager(monkeypatch):
    monkeypatch.delenv("IRTPU_DEFER", raising=False)
    defer, prof = choose_defer()
    assert defer is False  # CPU backend: no tunnel, eager overlaps cores
    assert prof is None


def test_choose_defer_env_overrides(monkeypatch):
    monkeypatch.setenv("IRTPU_DEFER", "force")
    assert choose_defer()[0] is True
    monkeypatch.setenv("IRTPU_DEFER", "0")
    assert choose_defer()[0] is False
    monkeypatch.setenv("IRTPU_DEFER", "1")
    assert choose_defer()[0] is False  # "1" means defer-iff-TPU; CPU here


def test_probe_disk_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(transport, "_PROFILE", None)
    monkeypatch.setattr(
        transport, "_cache_path", lambda backend: str(tmp_path / "probe.json")
    )
    p = LinkProfile(
        idle_mbs=42.0, eager_s=2.0, deferred_s=0.2, defer=True,
        source="probe", probed_at=__import__("time").time(),
    )
    with open(tmp_path / "probe.json", "w") as fh:
        json.dump(p.as_dict(), fh)
    got = transport.probe_link()
    assert got.source == "cache"
    assert got.defer is True
    assert got.idle_mbs == 42.0


def test_probe_runs_on_cpu(tmp_path, monkeypatch):
    """The probe machinery itself must execute anywhere (micro shapes)."""
    monkeypatch.setattr(transport, "_PROFILE", None)
    monkeypatch.setattr(
        transport, "_cache_path", lambda backend: str(tmp_path / "probe.json")
    )
    monkeypatch.setattr(transport, "_N_BUFS", 2)
    monkeypatch.setattr(transport, "_BUF_WORDS", 1 << 14)
    p = transport.probe_link(force=True)
    assert p.source == "probe"
    assert p.idle_mbs > 0
    assert p.eager_s > 0 and p.deferred_s > 0
    assert os.path.exists(tmp_path / "probe.json")
