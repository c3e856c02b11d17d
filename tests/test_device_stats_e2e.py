"""End-to-end parity of the device-side finalize path.

On real TPUs the engine computes per-intron depth statistics on device
(ops/finalize_stats.py) instead of pulling the O(mbs) depth array; forcing
that path on the CPU backend (IRTPU_DEVICE_STATS=1, Pallas interpreter) must
produce byte-identical output tables to the host finalize."""

import os
import subprocess
import sys

from irfinder_tpu.engine import run_bam
from irfinder_tpu.refio.compile import compile_reference

from test_oracle import CHROMS, ROIS, random_bam_bytes, toy_exons

TABLES = [
    "IRFinder-IR-nondir.txt",
    "IRFinder-IR-dir.txt",
    "IRFinder-JuncCount.txt",
    "IRFinder-SpansPoint.txt",
    "IRFinder-ROI.txt",
    "IRFinder-ChrCoverage.txt",
]


def test_device_stats_path_matches_host(tmp_path):
    ref = compile_reference(toy_exons(), chrom_order=CHROMS, rois=ROIS)
    bam = tmp_path / "in.bam"
    bam.write_bytes(random_bam_bytes(seed=23, n_frags=300))

    run_bam(ref, str(bam), str(tmp_path / "host"), use_native=False)

    # the device-stats flag is read at Engine construction; run the forced
    # path in a subprocess so this process's engines are unaffected
    code = f"""
import sys
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
# force the CPU backend: the axon sitecustomize registers the real TPU at
# interpreter start and env-var overrides are ineffective (see tests/conftest
# docstring) — without this the child jits through the tunnel and can hang
# for minutes on a cold remote compile
import jax
jax.config.update("jax_platforms", "cpu")
from irfinder_tpu.engine import run_bam
from irfinder_tpu.refio.compile import compile_reference
sys.path.insert(0, {repr(os.path.dirname(os.path.abspath(__file__)))})
from test_oracle import CHROMS, ROIS, toy_exons
ref = compile_reference(toy_exons(), chrom_order=CHROMS, rois=ROIS)
run_bam(ref, {repr(str(bam))}, {repr(str(tmp_path / "dev"))}, use_native=False)
"""
    env = dict(os.environ)
    env["IRTPU_DEVICE_STATS"] = "1"
    r = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    assert r.returncode == 0, r.stderr[-2000:]

    for t in TABLES:
        a = (tmp_path / "host" / t).read_text()
        b = (tmp_path / "dev" / t).read_text()
        assert a == b, f"{t} differs between host and device finalize"
