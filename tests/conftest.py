"""Test harness configuration.

Tests run hermetically on CPU with 8 virtual XLA devices so that all
sharding / collective code paths (dp/tp/sp meshes) are exercised without TPU
hardware, per the multi-device test strategy in SURVEY.md §4.5.  Must run
before the first ``import jax`` anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep CPU tests deterministic and fast.
os.environ.setdefault("JAX_ENABLE_X64", "0")
