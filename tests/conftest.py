"""Test configuration: run on a virtual 8-device CPU mesh by default.

This mirrors the reference's CI strategy of running the full kernel/model
suite on a GPU-less backend (wasm32 CPU lane, .github/workflows/tests.yml) —
here the XLA CPU backend with xla_force_host_platform_device_count=8 so
sharding tests exercise real multi-device lowering without TPUs.

Set UZU_TPU_TEST_REAL_DEVICE=1 to run against the actual configured backend.
"""

import os

if not os.environ.get("UZU_TPU_TEST_REAL_DEVICE"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    # the session env may pin JAX_PLATFORMS to a hardware plugin (e.g. axon);
    # config.update wins over whatever the plugin registered
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
