"""Numerical parity tests for the selective-scan implementations.

The lax.scan reference (spec: the reference repo's pure-PyTorch fallback at
block/mamba.py:435-443) is ground truth; the associative-scan and Pallas
(interpret-mode on CPU) implementations must match it in both values and
gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffma_tpu.ops.selective_scan import (
    selective_scan,
    selective_scan_assoc,
    selective_scan_ref,
)


def _make_inputs(G=2, L=28, d=64, n=16, seed=0, dtype=jnp.float32):
    keys = jax.random.split(jax.random.PRNGKey(seed), 7)
    u = jax.random.normal(keys[0], (G, L, d), dtype)
    delta = jax.random.normal(keys[1], (G, L, d), dtype) * 0.5 - 1.0
    # S4D-real init: A = -exp(log(arange)) perturbed (block/mamba.py:304-309)
    A = -jnp.exp(
        jnp.log(jnp.arange(1, n + 1, dtype=jnp.float32))[None, :]
        + 0.1 * jax.random.normal(keys[2], (d, n))
    )
    B = jax.random.normal(keys[3], (G, L, n), dtype)
    C = jax.random.normal(keys[4], (G, L, n), dtype)
    D = jax.random.normal(keys[5], (d,), jnp.float32)
    z = jax.random.normal(keys[6], (G, L, d), dtype)
    return u, delta, A, B, C, D, z


def test_manual_recurrence_matches_ref():
    """Cross-check the lax.scan reference against a literal python loop."""
    u, delta, A, B, C, D, z = _make_inputs(G=1, L=7, d=4, n=3)
    got = np.asarray(selective_scan_ref(u, delta, A, B, C, D, z))
    dt = np.log1p(np.exp(np.asarray(delta, np.float64)))
    uu, AA, BB, CC = (np.asarray(t, np.float64) for t in (u, A, B, C))
    h = np.zeros((4, 3))
    expect = np.zeros((1, 7, 4))
    for t in range(7):
        a = np.exp(dt[0, t][:, None] * AA)
        h = a * h + (dt[0, t] * uu[0, t])[:, None] * BB[0, t][None, :]
        y = h @ CC[0, t] + np.asarray(D) * uu[0, t]
        zz = np.asarray(z[0, t], np.float64)
        expect[0, t] = y * (zz / (1 + np.exp(-zz)))
    # TPU fp32 transcendentals (exp/softplus) are approximated; vs this fp64
    # host loop the recurrence accumulates up to ~5e-4 relative error there.
    tol = 2e-5 if jax.default_backend() != "tpu" else 5e-4
    np.testing.assert_allclose(got, expect, rtol=tol, atol=tol)


@pytest.mark.parametrize("gated", [True, False])
def test_assoc_matches_ref(gated):
    u, delta, A, B, C, D, z = _make_inputs()
    z = z if gated else None
    ref = selective_scan_ref(u, delta, A, B, C, D, z)
    got = selective_scan_assoc(u, delta, A, B, C, D, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("gated", [True, False])
@pytest.mark.parametrize("L", [28, 13])  # composite and prime lengths
def test_pallas_forward_matches_ref(gated, L):
    u, delta, A, B, C, D, z = _make_inputs(L=L)
    z = z if gated else None
    ref = selective_scan_ref(u, delta, A, B, C, D, z)
    got = selective_scan(u, delta, A, B, C, D, z, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_assoc_grads_match_ref():
    u, delta, A, B, C, D, z = _make_inputs(G=1, L=14, d=8, n=4)

    def loss(impl):
        def f(*args):
            return jnp.sum(jnp.tanh(impl(*args)))

        return f

    g_ref = jax.grad(loss(selective_scan_ref), argnums=(0, 1, 2, 3, 4, 5, 6))(
        u, delta, A, B, C, D, z
    )
    g_assoc = jax.grad(loss(selective_scan_assoc), argnums=(0, 1, 2, 3, 4, 5, 6))(
        u, delta, A, B, C, D, z
    )
    for a, b in zip(g_ref, g_assoc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


@pytest.mark.slow  # interpret-mode Pallas backward on CPU is minutes-long
@pytest.mark.parametrize("gated", [True, False])
def test_pallas_grads_match_ref(gated):
    u, delta, A, B, C, D, z = _make_inputs(G=2, L=28, d=16, n=4)
    args = (u, delta, A, B, C, D) + ((z,) if gated else ())

    def loss_ref(*a):
        zz = a[6] if gated else None
        return jnp.sum(jnp.tanh(selective_scan_ref(*a[:6], zz)))

    def loss_pl(*a):
        zz = a[6] if gated else None
        return jnp.sum(jnp.tanh(selective_scan(*a[:6], zz, impl="pallas")))

    argnums = tuple(range(len(args)))
    g_ref = jax.grad(loss_ref, argnums=argnums)(*args)
    g_pl = jax.grad(loss_pl, argnums=argnums)(*args)
    names = ["du", "ddelta", "dA", "dB", "dC", "dD", "dz"]
    for name, a, b in zip(names, g_ref, g_pl):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_bf16_inputs_fp32_state():
    """bf16 I/O must stay close to the fp32 reference (fp32 carry inside)."""
    u, delta, A, B, C, D, z = _make_inputs(L=28, d=32)
    ref = selective_scan_ref(u, delta, A, B, C, D, z)
    got = selective_scan(
        u.astype(jnp.bfloat16),
        delta,
        A,
        B.astype(jnp.bfloat16),
        C.astype(jnp.bfloat16),
        D,
        z.astype(jnp.bfloat16),
        impl="pallas",
    )
    err = np.abs(np.asarray(got, np.float32) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).mean() + 1e-6
    assert err.mean() / scale < 0.05
