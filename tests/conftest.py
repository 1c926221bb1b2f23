"""Test configuration: run on CPU with 8 virtual devices and float64.

Correctness tests use the CPU backend (x64 for conformance with the
reference's double precision); multi-chip sharding tests use the 8 virtual
devices.  Bench runs (bench.py) use the real TPU chip instead.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"   # override ambient axon/tpu setting
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax  # noqa: E402

# The axon sitecustomize imports jax before user code runs, so env vars set
# here can be too late — jax.config.update is authoritative either way.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFDATA = "/root/reference/data"


@pytest.fixture(scope="session")
def refdata():
    if not os.path.isdir(REFDATA):
        pytest.skip("reference data not available")
    return REFDATA
