"""End-to-end rehearsal of the golden pinning flow (SURVEY.md §0 protocol;
round-2 verdict next-round #7).

No real IRFinder goldens exist in this environment (the reference snapshot is
a tombstone), so the rehearsal manufactures a "foreign golden": a CLI run
under PERTURBED semantics (SPANS_OVERHANG=5 via IRTPU_SEMANTICS) stands in
for the day a real golden disagrees with our defaults.  The test then walks
the exact runbook a future session will follow (docs/GOLDEN_PINNING.md):

  1. count the same BAM under default semantics,
  2. `Goldens` localizes the first divergence to (table, line, column) and
     names SPANS_OVERHANG among the suspect constants,
  3. re-run with the override -> byte-identical,
  4. `Goldens --record` writes a pinning record carrying the live overrides.
"""

import json
import os
import subprocess
import sys

import pytest

from irfinder_tpu import goldens
from irfinder_tpu.refio.compile import compile_reference

from test_oracle import CHROMS, ROIS, random_bam_bytes, toy_exons

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli_env(overrides: dict | None) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    # subprocesses must stay on the CPU backend like the test session itself
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("IRTPU_SEMANTICS", None)
    if overrides:
        env["IRTPU_SEMANTICS"] = json.dumps(overrides)
    return env


def _run_bam_cli(ref_path: str, bam: str, out: str, overrides: dict | None):
    r = subprocess.run(
        [sys.executable, "-m", "irfinder_tpu.cli", "BAM",
         "-r", ref_path, "-d", out, "--no-native", bam],
        env=_cli_env(overrides), capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    td = tmp_path_factory.mktemp("pinning")
    ref = compile_reference(toy_exons(), chrom_order=CHROMS, rois=ROIS)
    ref_path = str(td / "ref.npz")
    ref.save(ref_path)
    bam = str(td / "in.bam")
    with open(bam, "wb") as fh:
        fh.write(random_bam_bytes(seed=17, n_frags=500))
    golden = str(td / "golden")
    # the "foreign golden": reference-IRFinder-like outputs produced under a
    # semantics value our defaults do not match
    _run_bam_cli(ref_path, bam, golden, {"SPANS_OVERHANG": 5})
    return td, ref_path, bam, golden


def test_pinning_flow_localize_override_rematch(setup):
    td, ref_path, bam, golden = setup

    # step 1: default-semantics run disagrees with the golden
    ours = str(td / "ours_default")
    _run_bam_cli(ref_path, bam, ours, None)
    r = goldens.compare_table(
        os.path.join(ours, "IRFinder-IR-nondir.txt"),
        os.path.join(golden, "IRFinder-IR-nondir.txt"),
    )
    assert not r["match"], "perturbed semantics must produce a differing golden"

    # step 2: the localization names the perturbed constant
    assert r["column"].startswith("ExonToIntronReads"), r
    assert "SPANS_OVERHANG" in r["suspect_constants"], r

    # step 3: overriding the named constant closes the gap byte-exactly
    pinned = str(td / "ours_pinned")
    _run_bam_cli(ref_path, bam, pinned, {"SPANS_OVERHANG": 5})
    assert goldens.check(pinned, golden) == 0

    # step 4: the CLI Goldens mode writes a pinning record with the overrides
    record = str(td / "pinning.json")
    r2 = subprocess.run(
        [sys.executable, "-m", "irfinder_tpu.cli", "Goldens",
         pinned, golden, "--record", record],
        env=_cli_env({"SPANS_OVERHANG": 5}), capture_output=True, text=True,
        timeout=300,
    )
    assert r2.returncode == 0, r2.stdout + r2.stderr
    rec = json.load(open(record))
    assert rec["pinned"] is True
    assert rec["semantics_overrides"] == {"SPANS_OVERHANG": 5}
    assert all(t["match"] for t in rec["tables"])


def test_goldens_cli_exit_code_on_mismatch(setup):
    td, ref_path, bam, golden = setup
    ours = str(td / "ours_default")
    r = subprocess.run(
        [sys.executable, "-m", "irfinder_tpu.cli", "Goldens", ours, golden],
        env=_cli_env(None), capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 1
    assert "MISMATCH" in r.stdout and "SPANS_OVERHANG" in r.stdout
