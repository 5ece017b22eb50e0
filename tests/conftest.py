"""Test harness config: force an 8-device virtual CPU platform.

Mirrors the SURVEY.md §4 test strategy: multi-chip sharding is validated on
virtual CPU devices (no pod needed); TPU benchmarks run separately via
bench.py on real hardware.

Note: the container's sitecustomize imports jax at interpreter startup
with JAX_PLATFORMS=axon (the TPU tunnel), so env vars alone are captured
too early — we must force the platform through jax.config as well.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
