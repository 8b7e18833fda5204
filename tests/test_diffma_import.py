"""DiffMa checkpoint importer: synthetic reference-layout state dicts must
map leaf-for-leaf onto the Flax model (names per model.py / mamba_block.py /
mamba_ssm)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffma_tpu.models.diffma import DiffMa
from diffma_tpu.utils.torch_io import diffma_params_from_torch


def _tree_shapes(t):
    return jax.tree.map(lambda x: tuple(x.shape), t)


class _B:
    def __init__(self):
        self.sd, self._o = {}, 0.0

    def add(self, k, shape):
        # Unique (placement-checkable) but small values; all-positive weights
        # at O(1) scale make the stacked softplus/exp paths overflow.
        self._o += 1.0
        n = int(np.prod(shape))
        vals = (np.arange(n, dtype=np.float32).reshape(shape) + self._o) / n
        self.sd[k] = vals * 0.02

    def dense(self, k, i, o, bias=True):
        self.add(f"{k}.weight", (o, i))
        if bias:
            self.add(f"{k}.bias", (o,))

    def norm(self, k, c):
        self.add(f"{k}.weight", (c,))
        self.add(f"{k}.bias", (c,))

    def mamba1(self, k, d, n):
        d_in, r = 2 * d, math.ceil(d / 16)
        self.dense(f"{k}.in_proj", d, 2 * d_in, bias=False)
        self.add(f"{k}.conv1d.weight", (d_in, 1, 4))
        self.add(f"{k}.conv1d.bias", (d_in,))
        self.dense(f"{k}.x_proj", d_in, r + 2 * n, bias=False)
        self.dense(f"{k}.dt_proj", r, d_in)
        self.add(f"{k}.A_log", (d_in, n))
        self.add(f"{k}.D", (d_in,))
        self.dense(f"{k}.out_proj", d_in, d, bias=False)


def _diffma_sd(depth=2, d=64, n=8, patch=2, in_ch=4):
    b = _B()
    b.add("pos_embed", (1, 16, d))  # fixed buffer; importer must ignore it
    b.add("x_embedder.proj.weight", (d, in_ch, patch, patch))
    b.add("x_embedder.proj.bias", (d,))
    b.dense("t_embedder.mlp.0", 256, d)
    b.dense("t_embedder.mlp.2", d, d)
    for i in range(depth):
        k = f"blocks.{i}"
        b.norm(f"{k}.norm1", d)
        b.dense(f"{k}.adaLN_modulation.1", 2 * d, 3 * d)
        b.mamba1(f"{k}.mamba1", d, n)
        b.mamba1(f"{k}.mamba2", d, n)
        b.norm(f"{k}.attention_network.0", 2 * d)
        b.dense(f"{k}.attention_network.1", 2 * d, d)
        b.dense(f"{k}.attention_network.3", d, 1)
    b.dense("final_layer.adaLN_modulation.1", 2 * d, 2 * d)
    b.dense("final_layer.linear", d, patch * patch * 2 * in_ch)
    return b.sd


@pytest.mark.slow
def test_diffma_import_matches_init_tree():
    depth, d, n = 2, 64, 8
    sd = _diffma_sd(depth=depth, d=d, n=n)
    got = diffma_params_from_torch(sd, depth=depth, block_type="spiral")

    model = DiffMa(
        input_size=8, patch_size=2, depth=depth, hidden_size=d,
        block_type="spiral", d_state=n, scan_impl="ref",
    )
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    N, T = 2, 16
    args = (
        jax.random.normal(ks[0], (N, 4, 8, 8)),
        jnp.array([3, 40], jnp.int32),
        jax.random.normal(ks[1], (N, d)),
        jax.random.normal(ks[2], (N, T, d)),
        jax.nn.sigmoid(jax.random.normal(ks[3], (N, T, 1))),
    )
    ref = {"params": model.init(ks[4], *args)["params"]}
    assert _tree_shapes(got) == _tree_shapes(ref)

    # transposition spot checks
    np.testing.assert_array_equal(
        got["params"]["block_0"]["mamba1"]["in_proj"]["kernel"],
        sd["blocks.0.mamba1.in_proj.weight"].T,
    )
    np.testing.assert_array_equal(
        got["params"]["block_1"]["mamba2"]["conv1d_weight"],
        sd["blocks.1.mamba2.conv1d.weight"][:, 0, :],
    )
    # conv patchify flatten order (channel-major then kh, kw)
    w = sd["x_embedder.proj.weight"]
    np.testing.assert_array_equal(
        got["params"]["x_embedder"]["kernel"], w.reshape(w.shape[0], -1).T
    )

    out = model.apply(got, *args)
    assert out.shape == (2, 8, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_diffma_import_dit():
    depth, d = 2, 64
    b = _B()
    b.add("x_embedder.proj.weight", (d, 4, 2, 2))
    b.add("x_embedder.proj.bias", (d,))
    b.dense("t_embedder.mlp.0", 256, d)
    b.dense("t_embedder.mlp.2", d, d)
    for i in range(depth):
        k = f"blocks.{i}"
        b.dense(f"{k}.adaLN_modulation.1", 2 * d, 6 * d)
        b.dense(f"{k}.attn.qkv", d, 3 * d)
        b.dense(f"{k}.attn.proj", d, d)
        b.dense(f"{k}.mlp.fc1", d, 4 * d)
        b.dense(f"{k}.mlp.fc2", 4 * d, d)
    b.dense("final_layer.adaLN_modulation.1", 2 * d, 2 * d)
    b.dense("final_layer.linear", d, 2 * 2 * 8)
    got = diffma_params_from_torch(b.sd, depth=depth, block_type="DiT")

    model = DiffMa(
        input_size=8, patch_size=2, depth=depth, hidden_size=d, block_type="DiT"
    )
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    N, T = 2, 16
    args = (
        jax.random.normal(ks[0], (N, 4, 8, 8)),
        jnp.array([3, 40], jnp.int32),
        jax.random.normal(ks[1], (N, d)),
        jax.random.normal(ks[2], (N, T, d)),
        jax.nn.sigmoid(jax.random.normal(ks[3], (N, T, 1))),
    )
    ref = {"params": model.init(ks[4], *args)["params"]}
    assert _tree_shapes(got) == _tree_shapes(ref)
    out = model.apply(got, *args)
    assert np.isfinite(np.asarray(out)).all()
