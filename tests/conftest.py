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
