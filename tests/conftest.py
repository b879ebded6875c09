"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

Real-TPU benchmarking uses bench.py; unit/parity tests use CPU where f64 is
native (the reference goldens were produced in f64).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
