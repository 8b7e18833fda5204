"""Rematerialisation: remat=True must change memory, not math."""

import jax
import pytest

pytestmark = pytest.mark.slow  # deselect with -m 'not slow'
import jax.numpy as jnp
import numpy as np

from diffma_tpu.models.diffma import DiffMa


def _setup(remat, use_mamba2=False):
    model = DiffMa(
        input_size=8, patch_size=2, depth=3, hidden_size=64,
        block_type="spiral", d_state=8, use_mamba2=use_mamba2,
        scan_impl="ref", remat=remat,
    )
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    N, T = 2, 16
    x = jax.random.normal(ks[0], (N, 4, 8, 8))
    t = jnp.array([3, 500], jnp.int32)
    y = jax.random.normal(ks[1], (N, 64))
    y2 = jax.random.normal(ks[2], (N, T, 64))
    w = jax.nn.sigmoid(jax.random.normal(ks[3], (N, T, 1)))
    params = model.init(ks[4], x, t, y, y2, w)["params"]
    return model, params, (x, t, y, y2, w)


def test_remat_same_forward_and_grads():
    model_a, params, args = _setup(remat=False)
    model_b, _, _ = _setup(remat=True)

    out_a = model_a.apply({"params": params}, *args)
    out_b = model_b.apply({"params": params}, *args)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-6, atol=1e-6)

    def loss(m):
        return lambda p: jnp.sum(jnp.square(m.apply({"params": p}, *args)))

    g_a = jax.grad(loss(model_a))(params)
    g_b = jax.grad(loss(model_b))(params)
    for pa, pb in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-5, atol=1e-5)
