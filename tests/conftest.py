"""Test harness config: force an 8-device virtual CPU platform.

Mirrors the SURVEY.md §4 test strategy: multi-chip sharding is validated on
virtual CPU devices (no pod needed); TPU benchmarks run separately via
bench.py on real hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
