"""Incremental decode parity: iterating the single-token step functions over
a sequence must reproduce the full parallel mixer forward (identity scan
order), matching the reference's step()/forward consistency contract
(block/mamba.py:405-459, block/mamba2.py:714-780)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # deselect with -m 'not slow'

from diffma_tpu.models.decode import (
    allocate_mamba2_cache,
    allocate_mamba_cache,
    mamba2_step,
    mamba_step,
)
from diffma_tpu.models.mamba import Mamba
from diffma_tpu.models.mamba2 import Mamba2
from diffma_tpu.ops.scan_orders import ScanSpec


def identity_spec(L):
    ident = np.arange(L, dtype=np.int32)
    return ScanSpec(fwd=ident[None], merge=ident[:, None], scale=1.0)


@pytest.mark.parametrize("init_style", ["diffma", "mamba"])
def test_mamba1_step_matches_forward(init_style):
    B, L, d = 2, 12, 64
    spec = identity_spec(L)
    m = Mamba(d_model=d, d_state=16, init_style=init_style, scan_impl="ref")
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, d))
    params = m.init(jax.random.PRNGKey(1), x, spec)["params"]
    full = m.apply({"params": params}, x, spec)

    cache = allocate_mamba_cache(B, d_inner=2 * d, d_state=16)
    outs = []
    for t in range(L):
        y, cache = mamba_step(params, x[:, t], cache)
        outs.append(y)
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(stepped), np.asarray(full), rtol=2e-4, atol=2e-4
    )


def test_mamba2_step_matches_forward():
    B, L, d = 2, 16, 64
    spec = identity_spec(L)
    m = Mamba2(d_model=d, d_state=16, headdim=32, chunk_size=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, d))
    params = m.init(jax.random.PRNGKey(1), x, spec)["params"]
    full = m.apply({"params": params}, x, spec)

    cache = allocate_mamba2_cache(B, d_inner=2 * d, d_state=16, headdim=32)
    outs = []
    for t in range(L):
        y, cache = mamba2_step(params, x[:, t], cache, headdim=32)
        outs.append(y)
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(stepped), np.asarray(full), rtol=2e-4, atol=2e-4
    )


def test_decode_scan_compatible():
    """The whole decode fits in one lax.scan (pure cache pytree)."""
    B, L, d = 1, 8, 32
    spec = identity_spec(L)
    m = Mamba(d_model=d, d_state=8, scan_impl="ref")
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, d))
    params = m.init(jax.random.PRNGKey(1), x, spec)["params"]
    full = m.apply({"params": params}, x, spec)

    cache = allocate_mamba_cache(B, d_inner=2 * d, d_state=8)

    def step(cache, x_t):
        y, cache = mamba_step(params, x_t, cache)
        return cache, y

    _, ys = jax.lax.scan(step, cache, jnp.moveaxis(x, 1, 0))
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(ys, 0, 1)), np.asarray(full), rtol=2e-4, atol=2e-4
    )
