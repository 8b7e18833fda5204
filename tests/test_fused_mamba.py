"""Fused mixer inner (single Pallas kernel) vs the composable path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # deselect with -m 'not slow'

from diffma_tpu.models.mamba import Mamba
from diffma_tpu.ops.fused_mamba import _fused_ref, mamba_inner_fused
from diffma_tpu.ops.scan_orders import ScanSpec


def _weights(d=32, K=4, r=4, n=8, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    conv_w = jax.random.normal(ks[0], (d, K)) * 0.3
    conv_b = jax.random.normal(ks[1], (d,)) * 0.1
    xp_w = jax.random.normal(ks[2], (d, r + 2 * n)) * (d**-0.5)
    dt_w = jax.random.normal(ks[3], (r, d)) * (r**-0.5)
    dt_b = jax.random.normal(ks[4], (d,)) * 0.5 - 2.0
    A = -jnp.exp(jax.random.normal(ks[5], (d, n)) * 0.3)
    D = jax.random.normal(ks[6], (d,))
    return conv_w, conv_b, xp_w, dt_w, dt_b, A, D


@pytest.mark.parametrize("L", [28, 13])
def test_fused_matches_composable(L):
    d = 32
    w = _weights(d=d)
    xz = jax.random.normal(jax.random.PRNGKey(9), (3, L, 2 * d))
    ref = _fused_ref(xz, *w)
    got = mamba_inner_fused(xz, *w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5)


def test_fused_grads_via_recompute():
    d = 32
    w = _weights(d=d)
    xz = jax.random.normal(jax.random.PRNGKey(9), (1, 16, 2 * d))

    def loss(fn):
        return lambda xz, cw: jnp.sum(jnp.tanh(fn(xz, cw, *w[1:])))

    g_ref = jax.grad(loss(_fused_ref), argnums=(0, 1))(xz, w[0])
    g_fused = jax.grad(loss(mamba_inner_fused), argnums=(0, 1))(xz, w[0])
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_fused_grads_bf16_cotangent():
    """bf16 primal output => the recompute VJP must accept bf16 cotangents
    (regression: training through scan_impl='fused' in bf16)."""
    d = 32
    w = _weights(d=d)
    xz = jax.random.normal(jax.random.PRNGKey(9), (1, 16, 2 * d), jnp.bfloat16)

    def loss(xz):
        return jnp.sum(mamba_inner_fused(xz, *w).astype(jnp.float32))

    g = jax.grad(loss)(xz)
    assert g.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(g, np.float32)).all()


def test_mamba_module_fused_impl():
    """Mamba(scan_impl='fused') == Mamba(scan_impl='ref') on the same params."""
    B, L, dm = 2, 16, 32
    ident = np.arange(L, dtype=np.int32)
    spec = ScanSpec(fwd=ident[None], merge=ident[:, None], scale=1.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, dm))
    m_ref = Mamba(d_model=dm, d_state=8, scan_impl="ref")
    params = m_ref.init(jax.random.PRNGKey(1), x, spec)["params"]
    out_ref = m_ref.apply({"params": params}, x, spec)
    m_fused = Mamba(d_model=dm, d_state=8, scan_impl="fused")
    out_fused = m_fused.apply({"params": params}, x, spec)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), rtol=3e-5, atol=3e-5
    )
