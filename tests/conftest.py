"""Test harness configuration.

Tests run hermetically on CPU with 8 virtual XLA devices so that all
sharding / collective code paths (dp/tp/sp meshes) are exercised without TPU
hardware, per the multi-device test strategy in SURVEY.md §4.5.

This container's sitecustomize registers an `axon` TPU plugin and forces
``jax_platforms=axon,cpu`` at interpreter startup, so env vars alone are not
enough: we override the config again here (it is re-read until the first
backend initialisation, which conftest import precedes) unless the suite is
explicitly asked to run on hardware with ``DIFFMA_TEST_TPU=1``.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

if os.environ.get("DIFFMA_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

# Parity tests compare fp32 math across implementations; on TPU the default
# matmul precision silently rounds fp32 operands to bf16, which makes those
# comparisons backend-dependent.  Pin true-fp32 contractions for the suite
# (production code paths choose their own precision per dtype).
import jax as _jax  # noqa: E402

_jax.config.update("jax_default_matmul_precision", "highest")
