"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

Real-TPU benchmarking uses bench.py; unit/parity tests use CPU where f64 is
native (the reference goldens were produced in f64).

NOTE: this container's sitecustomize imports jax and registers the axon TPU
platform before any test code runs, so env vars alone don't switch platforms;
jax.config.update is authoritative post-import.
"""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    The full suite compiles many hundreds of XLA:CPU programs; with all of
    them retained in-process the compiler segfaults reproducibly partway
    through (jaxlib backend_compile_and_load, observed at the same test in
    consecutive runs while each module passes in isolation).  Dropping the
    executable caches per module bounds the accumulation; re-compiles within
    a module still amortize."""
    yield
    jax.clear_caches()
