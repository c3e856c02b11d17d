"""Host->device transport probe: measure the link, don't assume it.

The engine's transfer schedule (eager interleave vs deferred bursts —
engine.DEFER_WINDOW_BYTES) was originally hard-wired against one measured
pathology: the dev box reaches its TPU through a tunnel whose H2D runs
5-55 MB/s phase-dependent, and in SOME phases transfers collapse under
in-flight executions (round-4 measured 15x; round-5 found the same link
favoring eager by 1.5-2x hours later — the behavior is weather, not a
constant).  On a production host with local PCIe/ICI a hard-wired deferred
schedule would simply be wrong: eager overlaps transfer with compute and
the engine is decode-bound there.

Instead of keying the schedule off `jax.default_backend() == "tpu"`
(round-4 verdict #5: this-tunnel-native, not TPU-native), probe_link()
runs the two schedules head-to-head on a micro-workload (~10 MB, one-time
per process, disk-cached across processes for PROBE_TTL_S) and picks the
measured winner.  `IRTPU_DEFER=0|1|force` remains the explicit override;
`IRTPU_PROBE=0` skips probing (falls back to defer-on-TPU, the
conservative choice for this box).

The probe also measures the idle put-completion rate, which gives every
run an auditable wire floor (round-4 verdict #3): RunMetrics records
`wire_bytes` (shipped) and `wire_floor_s = wire_bytes / idle rate`, so a
bench line can show how close e2e wall sits to the link's physical floor.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import numpy as np

#: disk-cache TTL for the probe result (the tunnel's phase wanders on hour
#: scales, but the COLLAPSE is structural; re-probing daily tracks both)
PROBE_TTL_S = float(os.environ.get("IRTPU_PROBE_TTL", 24 * 3600))
#: deferred is chosen only when eager loses the A/B by this margin.  A
#: collapsing link fails eager's own probe legs directly (transfers drop
#: 5-15x under its in-flight execs), so the ratio clears easily there; a
#: healthy link ties at micro scale, and at e2e scale it is DEFERRED that
#: pays a burst-tail penalty (measured 1.5-2x on this tunnel 2026-08-21:
#: the burst keeps the exec stream occupied while trailing transfers
#: drain), so ties go to eager.
DEFER_WIN_RATIO = 1.3

_N_BUFS = 8
_BUF_WORDS = 1 << 19  # 2 MB int32 per buffer; 16 MB per schedule


@dataclasses.dataclass
class LinkProfile:
    idle_mbs: float  # put-completion rate, idle device (MB/s, this phase)
    eager_s: float  # micro-workload wall, eager interleave
    deferred_s: float  # micro-workload wall, deferred burst
    defer: bool  # chosen schedule
    source: str  # "probe" | "cache" | "env" | "default"
    probed_at: float = 0.0
    #: best idle rate seen across recent probes: the link's phase swings
    #: 5-55 MB/s, and a FLOOR (wire_floor_s = bytes / rate) must use the
    #: best demonstrated rate — a trough-phase rate would put the "floor"
    #: above measured walls
    best_mbs: float = 0.0

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


_PROFILE: LinkProfile | None = None  # process cache


def _cache_path(backend: str) -> str:
    d = os.path.join(os.path.expanduser("~/.cache"), "irfinder_tpu")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"link_probe_{backend}.json")


def _sync_1elem(arr) -> None:
    """Completion barrier: a real 1-element D2H pull.  block_until_ready is
    NOT reliable through the tunneled transport (returns early)."""
    np.asarray(arr.reshape(-1)[0:1])


def _make_dummy():
    """A ~ms-scale device exec standing in for the counting step (its
    presence in flight is what collapses tunnel transfers)."""
    import jax
    import jax.numpy as jnp

    def f(x):
        side = min(512, int(x.size**0.5))  # static at trace time
        a = x[: side * side].reshape(side, side).astype(jnp.float32) * 1e-6
        a = jax.lax.fori_loop(0, 64, lambda i, m: jnp.tanh(m @ m) + 1e-3, a)
        return jnp.sum(a) + jnp.sum(x)

    return jax.jit(f)


def _probe_bufs(seed: int = 0) -> list:
    """int32 buffers mimicking the PACKED WIRE layout's field entropy
    (io/batch.py: [blk_start | blk_meta | frag_meta]): the transport
    compresses content-dependently (measured: zeros 65, real batch 35-39,
    random 22 MB/s), so the floor rate must be probed with what actually
    ships — uniform-random words understate it ~3x and produced a "floor"
    above the measured wall."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(_N_BUFS):
        n = _BUF_WORDS
        b = n // 3
        # blk_start: near-sorted genomic coordinates (cumsum of gaps)
        starts = (np.cumsum(rng.integers(0, 500, b)) % (1 << 27)).astype(np.int32)
        # blk_meta: len:18 | chrom:13 | strand:1 with realistic field ranges
        meta = (
            (rng.integers(80, 120, b).astype(np.uint32) << 14)
            | (rng.integers(0, 24, b).astype(np.uint32) << 1)
            | rng.integers(0, 2, b).astype(np.uint32)
        ).view(np.int32)
        # frag_meta: nblk:12 | refid:19 | strand:1
        fmeta = (
            (rng.integers(1, 4, b).astype(np.uint32) << 20)
            | (rng.integers(0, 24, b).astype(np.uint32) << 1)
            | rng.integers(0, 2, b).astype(np.uint32)
        ).view(np.int32)
        buf = np.zeros(n, np.int32)
        buf[0:b], buf[b : 2 * b], buf[2 * b : 3 * b] = starts, meta, fmeta
        out.append(buf)
    return out


def _run_deferred(jax, dummy, bufs) -> float:
    t0 = time.perf_counter()
    devs = [jax.device_put(b) for b in bufs]
    acc = None
    for d in devs:
        acc = dummy(d) if acc is None else acc + dummy(d)
    _sync_1elem(acc)
    return time.perf_counter() - t0


def _run_eager(jax, dummy, bufs) -> float:
    t0 = time.perf_counter()
    acc = None
    for b in bufs:
        d = jax.device_put(b)
        acc = dummy(d) if acc is None else acc + dummy(d)
    _sync_1elem(acc)
    return time.perf_counter() - t0


def decide_defer(eager_s: float, deferred_s: float) -> bool:
    """Defer only when eager CLEARLY loses the probe A/B.  The probe's
    eager leg reproduces a genuine transfer collapse directly (its own
    in-flight execs throttle its own transfers, 5-15x), so a collapsing
    link clears DEFER_WIN_RATIO robustly; a non-collapsing link ties at
    probe scale and favors eager at e2e scale (deferred's burst tail)."""
    return eager_s > DEFER_WIN_RATIO * deferred_s


def probe_link(force: bool = False) -> LinkProfile:
    """Measure the link and choose the transfer schedule.  Process-cached;
    disk-cached for PROBE_TTL_S (keyed by backend)."""
    global _PROFILE
    if _PROFILE is not None and not force:
        return _PROFILE
    import jax

    backend = jax.default_backend()
    path = _cache_path(backend)
    prev_best = 0.0
    try:
        with open(path) as fh:
            d = json.load(fh)
        if time.time() - d.get("probed_at", 0) < 7 * 86400:
            prev_best = float(d.get("best_mbs", d.get("idle_mbs", 0.0)))
        if not force and time.time() - d.get("probed_at", 0) < PROBE_TTL_S:
            d.setdefault("best_mbs", d.get("idle_mbs", 0.0))
            _PROFILE = LinkProfile(**{**d, "source": "cache"})
            return _PROFILE
    except (OSError, ValueError, TypeError):
        pass

    dummy = _make_dummy()
    bufs = _probe_bufs()
    # compile + first-touch outside the timed region
    w = jax.device_put(bufs[0])
    _sync_1elem(dummy(w))
    del w

    def idle_rate() -> float:
        # idle PIPELINED put-completion rate -> the auditable wire floor.
        # The engine ships batches back-to-back, so the floor rate must be
        # measured the same way: dispatch every put, ONE chained 1-elem pull
        # (a per-put sync pays the tunnel round-trip per buffer and
        # understates the rate ~2-3x — a "floor" above the wall)
        t0 = time.perf_counter()
        devs = [jax.device_put(b) for b in bufs]
        acc = None
        for d in devs:
            acc = d[0:1] if acc is None else acc + d[0:1]
        _sync_1elem(acc)
        dt = max(time.perf_counter() - t0, 1e-9)
        return float(sum(b.nbytes for b in bufs) / dt / 1e6)

    # time-box: in deep-distress phases a full probe has taken minutes
    # (16 MB legs at <2 MB/s); a link that slow is collapse-adjacent, and
    # defer is the safe schedule — don't stall engine init measuring it
    t_probe0 = time.perf_counter()
    first_idle = idle_rate()
    if time.perf_counter() - t_probe0 > 10.0:
        _PROFILE = LinkProfile(
            idle_mbs=round(first_idle, 2), eager_s=0.0, deferred_s=0.0,
            defer=True, source="probe", probed_at=time.time(),
            best_mbs=round(max(first_idle, prev_best), 2),
        )
        try:
            with open(path + ".tmp", "w") as fh:
                json.dump(_PROFILE.as_dict(), fh)
            os.replace(path + ".tmp", path)
        except OSError:
            pass
        return _PROFILE
    # interleaved best-of-2 per schedule: the tunnel's phase wanders on
    # second scales, so a single rep ranks weather, not structure — min()
    # filters weather while a structural collapse hits every eager rep
    idle_rates, t_def, t_eag = [first_idle], float("inf"), float("inf")
    for rep in range(2):
        if rep:
            idle_rates.append(idle_rate())
        t_def = min(t_def, _run_deferred(jax, dummy, bufs))
        t_eag = min(t_eag, _run_eager(jax, dummy, bufs))
    idle_mbs = max(idle_rates)
    defer = decide_defer(t_eag, t_def)
    _PROFILE = LinkProfile(
        idle_mbs=round(idle_mbs, 2),
        eager_s=round(t_eag, 4),
        deferred_s=round(t_def, 4),
        defer=defer,
        source="probe",
        probed_at=time.time(),
        best_mbs=round(max(idle_mbs, prev_best), 2),
    )
    try:
        with open(path + ".tmp", "w") as fh:
            json.dump(_PROFILE.as_dict(), fh)
        os.replace(path + ".tmp", path)
    except OSError:
        pass
    return _PROFILE


def choose_defer() -> "tuple[bool, LinkProfile | None]":
    """The engine's schedule decision: explicit IRTPU_DEFER wins; otherwise
    probe the link (TPU backends only — CPU/virtual meshes are always
    eager: compute overlaps decode across cores and there is no tunnel)."""
    import jax

    env = os.environ.get("IRTPU_DEFER", "auto")
    if env == "force":
        return True, LinkProfile(0.0, 0.0, 0.0, True, "env")
    if env == "0":
        return False, LinkProfile(0.0, 0.0, 0.0, False, "env")
    if env == "1":
        return jax.default_backend() == "tpu", LinkProfile(
            0.0, 0.0, 0.0, jax.default_backend() == "tpu", "env"
        )
    if jax.default_backend() != "tpu":
        return False, None
    if os.environ.get("IRTPU_PROBE") == "0":
        # probing disabled: defer is the conservative default for tunneled
        # chips (eager loses 5-15x there; deferred loses ~nothing locally
        # except transfer/compute overlap)
        return True, LinkProfile(0.0, 0.0, 0.0, True, "default")
    try:
        p = probe_link()
        return p.defer, p
    except Exception:
        return True, LinkProfile(0.0, 0.0, 0.0, True, "default")
