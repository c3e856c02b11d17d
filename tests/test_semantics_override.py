"""Runtime-injectable semantics (VERDICT.md round 1, next-round #6): every
[R:verify] constant can be overridden via IRTPU_SEMANTICS without a rebuild,
and the override reaches BOTH decoders (the native one through bd_open_ex
parameters, not baked constants)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = r"""
import json, sys
from irfinder_tpu import semantics as S
from irfinder_tpu.synth import synth_ref
from irfinder_tpu.io.bamgen import write_realistic_bam
from irfinder_tpu.engine import open_decoder

bam, use_native = sys.argv[1], sys.argv[2] == "native"
ref = synth_ref(n_genes=30)
_, batches, stats = open_decoder(ref, bam, 512, use_native)
n_frags = sum(b.n_frags for b in batches)
print(json.dumps({
    "min_mapq": S.MIN_MAPQ,
    "admitted": stats.reads_admitted,
    "total": stats.reads_total,
    "frags": n_frags,
}))
"""


@pytest.fixture(scope="module")
def bam(tmp_path_factory):
    from irfinder_tpu.io.bamgen import write_realistic_bam
    from irfinder_tpu.synth import synth_ref

    ref = synth_ref(n_genes=30)
    path = str(tmp_path_factory.mktemp("sem") / "mix.bam")
    write_realistic_bam(path, ref, n_pairs=4_000, seed=9, low_mapq_frac=0.2)
    return path


def _run(bam, decoder, overrides=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    if overrides:
        env["IRTPU_SEMANTICS"] = json.dumps(overrides)
    else:
        env.pop("IRTPU_SEMANTICS", None)
    r = subprocess.run(
        [sys.executable, "-c", DRIVER, bam, decoder],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    return json.loads(r.stdout.strip().splitlines()[-1])


@pytest.mark.parametrize("decoder", ["python", "native"])
def test_min_mapq_override_changes_admission(bam, decoder):
    base = _run(bam, decoder)
    assert base["min_mapq"] == 5
    strict = _run(bam, decoder, {"MIN_MAPQ": 100})
    assert strict["min_mapq"] == 100
    assert strict["total"] == base["total"]
    # MAPQ spectrum is {255, 50, 3}: raising the floor to 100 drops the 50s
    assert strict["admitted"] < base["admitted"]
    assert strict["frags"] < base["frags"]


def test_decoders_agree_under_override(bam):
    py = _run(bam, "python", {"MIN_MAPQ": 100})
    nat = _run(bam, "native", {"MIN_MAPQ": 100})
    assert py == nat


def test_file_based_override(bam, tmp_path):
    spec = tmp_path / "sem.json"
    spec.write_text(json.dumps({"MIN_MAPQ": 100, "SPANS_OVERHANG": 12}))
    env = dict(os.environ)
    env.update(PYTHONPATH=REPO, JAX_PLATFORMS="cpu", IRTPU_SEMANTICS=str(spec))
    r = subprocess.run(
        [sys.executable, "-c",
         "from irfinder_tpu import semantics as S;"
         "print(S.MIN_MAPQ, S.SPANS_OVERHANG, sorted(S.SEMANTICS_OVERRIDES))"],
        env=env, capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "100 12 ['MIN_MAPQ', 'SPANS_OVERHANG']"


def test_unknown_key_rejected():
    env = dict(os.environ)
    env.update(
        PYTHONPATH=REPO, JAX_PLATFORMS="cpu",
        IRTPU_SEMANTICS='{"NOT_A_CONSTANT": 1}',
    )
    r = subprocess.run(
        [sys.executable, "-c", "import irfinder_tpu.semantics"],
        env=env, capture_output=True, text=True, timeout=120,
    )
    assert r.returncode != 0
    assert "NOT_A_CONSTANT" in r.stderr
