"""Test harness config: run all JAX work on a virtual 8-device CPU mesh so
sharding logic is exercised without TPU hardware (SURVEY.md §4 item 4).

NOTE: this environment's axon sitecustomize registers the TPU backend at
interpreter start and rewrites jax_platforms to "axon,cpu", so overriding the
JAX_PLATFORMS env var here is too late / ineffective.  The reliable override
is jax.config.update AFTER import (XLA_FLAGS must still be set before the
first backend init).  Without this, tests silently run on the single real TPU
through the tunnel — slow, and concurrent pytest runs deadlock on the device.
"""

import os

if os.environ.get("IRTPU_TPU_TESTS") == "1":
    # Real-hardware lane (VERDICT round 1, next-round #8): leave the TPU
    # backend registered and run ONLY the @pytest.mark.tpu parity tests:
    #   IRTPU_TPU_TESTS=1 python -m pytest tests/ -m tpu
    # (the rest of the suite assumes the 8-device CPU mesh; don't mix)
    import jax  # noqa: F401
else:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
