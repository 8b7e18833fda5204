"""Parity tests: SSD chunked scan vs sequential ref; conv; gated norm."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffma_tpu.ops.conv import causal_conv1d, causal_conv1d_update
from diffma_tpu.ops.norm import layer_norm, rms_norm_gated
from diffma_tpu.ops.ssd import ssd_chunked, ssd_ref


def _ssd_inputs(G=2, L=36, H=4, P=8, N=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    x = jax.random.normal(ks[0], (G, L, H, P))
    dt = jax.random.normal(ks[1], (G, L, H)) * 0.5
    A = -jnp.exp(jax.random.uniform(ks[2], (H,), minval=0.0, maxval=2.0))
    B = jax.random.normal(ks[3], (G, L, N))
    C = jax.random.normal(ks[4], (G, L, N))
    D = jax.random.normal(ks[5], (H,))
    dt_bias = jnp.linspace(-4.0, -2.0, H)
    return x, dt, A, B, C, D, dt_bias


@pytest.mark.slow
@pytest.mark.parametrize("chunk", [8, 16, 64])
@pytest.mark.parametrize("L", [36, 64, 17])
def test_ssd_chunked_matches_ref(chunk, L):
    x, dt, A, B, C, D, dt_bias = _ssd_inputs(L=L)
    ref = ssd_ref(x, dt, A, B, C, D, dt_bias)
    got = ssd_chunked(x, dt, A, B, C, D, dt_bias, chunk_size=chunk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_ssd_headdim_D():
    x, dt, A, B, C, _, dt_bias = _ssd_inputs()
    D = jax.random.normal(jax.random.PRNGKey(7), (4, 8))  # (H, P)
    ref = ssd_ref(x, dt, A, B, C, D, dt_bias)
    got = ssd_chunked(x, dt, A, B, C, D, dt_bias, chunk_size=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_ssd_dt_limit():
    x, dt, A, B, C, D, dt_bias = _ssd_inputs()
    ref = ssd_ref(x, dt, A, B, C, D, dt_bias, dt_limit=(0.01, 0.08))
    got = ssd_chunked(x, dt, A, B, C, D, dt_bias, dt_limit=(0.01, 0.08), chunk_size=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_ssd_grads_match():
    x, dt, A, B, C, D, dt_bias = _ssd_inputs(G=1, L=24, H=2, P=4, N=4)

    def loss(f):
        return lambda *a: jnp.sum(jnp.tanh(f(*a, dt_bias)))

    g_ref = jax.grad(loss(ssd_ref), argnums=(0, 1, 2, 3, 4, 5))(x, dt, A, B, C, D)
    g_chk = jax.grad(
        loss(lambda *a: ssd_chunked(*a, chunk_size=8)), argnums=(0, 1, 2, 3, 4, 5)
    )(x, dt, A, B, C, D)
    for a, b in zip(g_ref, g_chk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_causal_conv1d_matches_manual():
    G, L, C, K = 2, 10, 6, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], (G, L, C))
    w = jax.random.normal(ks[1], (C, K))
    b = jax.random.normal(ks[2], (C,))
    y = np.asarray(causal_conv1d(x, w, b, activation=None))
    xp = np.pad(np.asarray(x), ((0, 0), (K - 1, 0), (0, 0)))
    expect = np.zeros((G, L, C))
    for t in range(L):
        window = xp[:, t : t + K, :]  # x[t-3..t]
        expect[:, t] = (window * np.asarray(w).T[None]).sum(1) + np.asarray(b)
    np.testing.assert_allclose(y, expect, rtol=1e-5, atol=1e-5)


def test_causal_conv1d_update_matches_full():
    """Streaming decode must equal the full causal conv."""
    G, L, C, K = 1, 8, 4, 4
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(ks[0], (G, L, C))
    w = jax.random.normal(ks[1], (C, K))
    b = jax.random.normal(ks[2], (C,))
    full = np.asarray(causal_conv1d(x, w, b))
    state = jnp.zeros((G, K, C))
    outs = []
    for t in range(L):
        y_t, state = causal_conv1d_update(x[:, t], state, w, b)
        outs.append(np.asarray(y_t))
    np.testing.assert_allclose(np.stack(outs, 1), full, rtol=1e-5, atol=1e-5)


def test_layer_norm_matches_numpy():
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 16))
    w = jax.random.normal(jax.random.PRNGKey(1), (16,))
    b = jax.random.normal(jax.random.PRNGKey(2), (16,))
    got = np.asarray(layer_norm(x, w, b, eps=1e-6))
    xn = np.asarray(x)
    mu = xn.mean(-1, keepdims=True)
    var = xn.var(-1, keepdims=True)
    expect = (xn - mu) / np.sqrt(var + 1e-6) * np.asarray(w) + np.asarray(b)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("norm_before_gate", [False, True])
def test_rms_norm_gated(norm_before_gate):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 8))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 8))
    w = jax.random.normal(jax.random.PRNGKey(2), (8,))
    got = np.asarray(
        rms_norm_gated(x, w, z, eps=1e-5, norm_before_gate=norm_before_gate)
    )
    xn, zn, wn = (np.asarray(t, np.float64) for t in (x, z, w))
    silu = zn / (1 + np.exp(-zn))

    def rms(v):
        return v / np.sqrt((v**2).mean(-1, keepdims=True) + 1e-5)

    expect = rms(xn) * wn * silu if norm_before_gate else rms(xn * silu) * wn
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)
