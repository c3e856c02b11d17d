"""Native C++ scalar counter vs NumPy oracle: bit-exact counter equivalence
(third implementation of the same semantics; SURVEY.md §7.2 step 2)."""

import io

import numpy as np
import pytest

from irfinder_tpu.io.bampy import decode_bam
from irfinder_tpu.oracle import OracleCounters
from irfinder_tpu.refio.compile import compile_reference

from test_oracle import CHROM_INDEX, CHROMS, ROIS, random_bam_bytes, toy_exons

onat = pytest.importorskip("irfinder_tpu.native.oracle_native")


@pytest.fixture(scope="module")
def ref():
    return compile_reference(toy_exons(), chrom_order=CHROMS, rois=ROIS)


@pytest.fixture(scope="module")
def lib():
    try:
        return onat.load_library()
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")


@pytest.mark.parametrize("seed", [0, 9])
def test_native_oracle_matches_numpy(ref, lib, seed):
    bam = random_bam_bytes(seed=seed, n_frags=250)
    _, batches, _ = decode_bam(io.BytesIO(bam), CHROM_INDEX, cap_frags=31)
    orc = OracleCounters.create(ref)
    nat = onat.NativeOracle(ref, n_refids=len(CHROMS))
    for b in batches:
        orc.add_batch(b)
        nat.add_batch(b)
    fc = nat.finalize()
    np.testing.assert_array_equal(fc["depth"], orc.depth)
    np.testing.assert_array_equal(fc["start_cnt"], orc.start_cnt)
    np.testing.assert_array_equal(fc["end_cnt"], orc.end_cnt)
    np.testing.assert_array_equal(fc["exact_cnt"], orc.exact_cnt)
    np.testing.assert_array_equal(fc["span_hits"], orc.span_hits)
    np.testing.assert_array_equal(fc["roi_cnt"], orc.roi_cnt)
    assert int(fc["n_frags"]) == orc.n_frags
    for rid, n in orc.chr_frag.items():
        assert int(fc["chr_frag"][rid]) == n
    nat.close()
