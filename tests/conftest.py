"""Test configuration: CPU backend with 8 virtual devices (for sharding
tests) and 64-bit mode (for parity with the Float64 reference oracles).

Note: this machine's sitecustomize registers an `axon` TPU PJRT plugin at
interpreter startup and forces JAX_PLATFORMS=axon. For hermetic, fast unit
tests we steer JAX back to CPU *before any backend initializes* — config
updates below take effect because backends init lazily. Tests that need the
real TPU chip are marked `tpu` and opt in via RTGR_TPU_TESTS=1.
"""

import os

# Must be set before the CPU backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("RTGR_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
    # x64 for the CPU suite only: the f64 reference oracles need it, but
    # the TPU has no native f64 — under x64, weakly-typed scalars promote
    # to f64 inside Pallas kernels and Mosaic rejects 64-bit types. The
    # TPU suite (RTGR_TPU_TESTS=1) runs the production f32 configuration.
    jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RTGR_TPU_TESTS") == "1":
        return
    skip_tpu = pytest.mark.skip(reason="needs real TPU (set RTGR_TPU_TESTS=1)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)
