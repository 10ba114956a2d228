"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the standard JAX way to exercise multi-chip sharding code without a
pod (SURVEY.md §4): tests never need the real TPU chip, and bench.py (which
does) sets up its own platform.
"""

import os

# Force-override: the session environment pins JAX_PLATFORMS to the real TPU
# tunnel and a sitecustomize imports jax at interpreter startup, so the env
# var alone is captured too early — update the jax config directly as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA:CPU's LLVM JIT accumulates state across the suite's ~hundreds of
    compiles and eventually segfaults/aborts INSIDE a later compile
    (deterministically reproducible with the full slow suite; each victim
    test passes in a fresh process).  Dropping the executable caches between
    modules keeps the client below the poisoning threshold.  Costs some
    cross-module cache reuse; module-internal reuse is unaffected."""
    yield
    import jax
    jax.clear_caches()
