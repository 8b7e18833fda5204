"""Sequence-parallel SSD: sharding L over the mesh must match the full scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # deselect with -m 'not slow'

if jax.device_count() < 8:
    pytest.skip("needs the 8-device virtual mesh", allow_module_level=True)

from jax.sharding import Mesh

from diffma_tpu.ops.ssd import ssd_chunked, ssd_ref
from diffma_tpu.parallel.sequence import ssd_sequence_parallel


def _inputs(G=2, L=64, H=4, P=8, N=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    x = jax.random.normal(ks[0], (G, L, H, P))
    dt = jax.random.normal(ks[1], (G, L, H)) * 0.5
    A = -jnp.exp(jax.random.uniform(ks[2], (H,), minval=0.0, maxval=2.0))
    B = jax.random.normal(ks[3], (G, L, N))
    C = jax.random.normal(ks[4], (G, L, N))
    D = jax.random.normal(ks[5], (H,))
    dt_bias = jnp.linspace(-4.0, -2.0, H)
    return x, dt, A, B, C, D, dt_bias


def test_initial_state_threading():
    """ssd_chunked(initial_state) == running the two halves back to back."""
    x, dt, A, B, C, D, db = _inputs(L=48)
    full = ssd_ref(x, dt, A, B, C, D, db)
    h = 24
    y1, s1 = ssd_chunked(
        x[:, :h], dt[:, :h], A, B[:, :h], C[:, :h], D, dt_bias=db,
        chunk_size=8, return_final_state=True,
    )
    y2 = ssd_chunked(
        x[:, h:], dt[:, h:], A, B[:, h:], C[:, h:], D, dt_bias=db,
        chunk_size=8, initial_state=s1,
    )
    got = jnp.concatenate([y1, y2], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("ndev", [4, 8])
def test_sequence_parallel_matches_ref(ndev):
    x, dt, A, B, C, D, db = _inputs(L=64)
    ref = ssd_ref(x, dt, A, B, C, D, db)
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("sp",))
    got = ssd_sequence_parallel(
        x, dt, A, B, C, D, mesh, axis="sp", dt_bias=db, chunk_size=8
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("gated", [True, False])
def test_mamba1_sequence_parallel_matches_ref(gated):
    from diffma_tpu.ops.selective_scan import selective_scan_ref
    from diffma_tpu.parallel.sequence import selective_scan_sequence_parallel

    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    G, L, d, n = 2, 64, 16, 8
    u = jax.random.normal(ks[0], (G, L, d))
    delta = jax.random.normal(ks[1], (G, L, d)) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (d, n)) * 0.3)
    B = jax.random.normal(ks[3], (G, L, n))
    C = jax.random.normal(ks[4], (G, L, n))
    D = jnp.ones((d,))
    z = jax.random.normal(ks[5], (G, L, d)) if gated else None

    ref = selective_scan_ref(u, delta, A, B, C, D, z=z)
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    got = selective_scan_sequence_parallel(u, delta, A, B, C, D, mesh, z=z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_mamba1_sequence_parallel_grads():
    from diffma_tpu.ops.selective_scan import selective_scan_ref
    from diffma_tpu.parallel.sequence import selective_scan_sequence_parallel

    ks = jax.random.split(jax.random.PRNGKey(4), 6)
    G, L, d, n = 1, 32, 8, 4
    u = jax.random.normal(ks[0], (G, L, d))
    delta = jax.random.normal(ks[1], (G, L, d)) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (d, n)) * 0.3)
    B = jax.random.normal(ks[3], (G, L, n))
    C = jax.random.normal(ks[4], (G, L, n))
    D = jnp.ones((d,))
    z = jax.random.normal(ks[5], (G, L, d))
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))

    def loss_sp(u, delta, B, C):
        return jnp.sum(jnp.tanh(
            selective_scan_sequence_parallel(u, delta, A, B, C, D, mesh, z=z)
        ))

    def loss_ref(u, delta, B, C):
        return jnp.sum(jnp.tanh(selective_scan_ref(u, delta, A, B, C, D, z=z)))

    g_sp = jax.grad(loss_sp, argnums=(0, 1, 2, 3))(u, delta, B, C)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(u, delta, B, C)
    for a, b in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_sequence_parallel_grads():
    x, dt, A, B, C, D, db = _inputs(G=1, L=32, H=2, P=4, N=4)
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))

    def loss_sp(x, dt, B, C):
        return jnp.sum(
            jnp.tanh(
                ssd_sequence_parallel(
                    x, dt, A, B, C, D, mesh, dt_bias=db, chunk_size=8
                )
            )
        )

    def loss_ref(x, dt, B, C):
        return jnp.sum(jnp.tanh(ssd_ref(x, dt, A, B, C, D, db)))

    g_sp = jax.grad(loss_sp, argnums=(0, 1, 2, 3))(x, dt, B, C)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, dt, B, C)
    for a, b in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
