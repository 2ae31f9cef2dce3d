"""Test harness configuration.

Forces JAX onto the CPU backend with 8 virtual devices BEFORE jax is imported
anywhere — the TPU analogue of the reference's gloo-on-CPU distributed test
harness (``tests/distributed/dist_harness.py:1-103``): multi-device sharding
logic is exercised on a virtual mesh without real chips. Must run at conftest
import time, ahead of any test module importing jax.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize force-sets jax_platforms="axon,cpu" at
# interpreter start, overriding the env var — re-force CPU before any backend
# initializes so the suite runs on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_compiler_state():
    """Clear JAX's compiled-program caches between test modules.

    At ~1000 tests the suite accumulates thousands of compiled CPU
    executables in one process; past ~950 the XLA CPU compiler started
    segfaulting mid-compile (observed in jax 0.9.0 at
    ``compiler.py::backend_compile_and_load`` on a program that compiles
    fine in isolation). Dropping caches per module bounds compiler/arena
    state; the cost is recompilation across module boundaries only.
    """
    yield
    jax.clear_caches()
    gc.collect()
