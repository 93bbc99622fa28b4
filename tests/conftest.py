"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is
validated on XLA's host platform with 8 virtual devices (the TPU-era
equivalent of the dual CPU/GPU cross-check paths the reference relied on,
see SURVEY.md §4).
"""

import os

# The session environment pins JAX_PLATFORMS=axon (single real TPU via a
# tunnel); tests must override it — set KLT_TEST_TPU=1 to run on hardware.
if not os.environ.get("KLT_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long end-to-end pipeline tests")
