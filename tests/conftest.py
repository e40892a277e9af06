"""Test configuration: run everything on a virtual 8-device CPU mesh so multi-chip
sharding logic is exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; bench.py runs on the real chip).

Note: the image's sitecustomize imports jax and pins JAX_PLATFORMS=axon at interpreter
startup, so we must override via jax.config (env vars alone are too late)."""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # float64 oracles in kernel-parity tests
