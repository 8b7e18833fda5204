"""Embedding / head layers of the DiffMa model.

TPU-first re-design of the reference layers (model.py):

* ``PatchEmbed``  (model.py:22-46)  -- the reference uses a strided Conv2d;
  since kernel == stride in every shipped config, patchify is a pure
  reshape + one big matmul here (straight onto the MXU, no conv lowering).
* ``TimestepEmbed`` (model.py:49-85) -- sinusoidal features + 2-layer MLP.
* ``FinalLayer`` (model.py:92-109) -- adaLN-modulated linear head,
  zero-initialised (model.py:244-247) so the network starts at identity.
* ``get_2d_sincos_pos_embed`` (model.py:325-372) -- fixed (non-learned)
  position table, computed in numpy at trace time and constant-folded.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from diffma_tpu.ops.norm import layer_norm

__all__ = [
    "PatchEmbed",
    "TimestepEmbed",
    "FinalLayer",
    "get_2d_sincos_pos_embed",
    "modulate",
    "xavier_uniform",
]

xavier_uniform = nn.initializers.xavier_uniform()


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    """adaLN modulation (block/mamba_block.py:8-9): x*(1+scale) + shift."""
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """(grid*grid, embed_dim) fixed sin-cos table (model.py:325-351)."""
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)  # w first, as upstream
    grid = grid.reshape([2, 1, grid_size, grid_size])
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


class PatchEmbed(nn.Module):
    """Non-overlapping patchify as reshape + matmul.

    Weight layout matches a flattened torch Conv2d kernel
    ((C*p*p, embed_dim), channel-major within a patch) so reference
    checkpoints map with a transpose+reshape.  Init: xavier over the
    flattened 2-D view, zero bias (model.py:230-233).
    """

    patch_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (N, H, W, C) -> (N, T, D)
        N, H, W, C = x.shape
        p = self.patch_size
        assert H % p == 0 and W % p == 0, (H, W, p)
        gh, gw = H // p, W // p
        # (N, gh, p, gw, p, C) -> (N, gh, gw, C, p, p): channel-major patch
        # vector, matching Conv2d weight layout (out, in, kh, kw).
        x = x.reshape(N, gh, p, gw, p, C)
        x = x.transpose(0, 1, 3, 5, 2, 4).reshape(N, gh * gw, C * p * p)
        kernel = self.param(
            "kernel", xavier_uniform, (C * p * p, self.embed_dim), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,), jnp.float32)
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        return y + bias.astype(self.dtype)


class TimestepEmbed(nn.Module):
    """Sinusoidal timestep features + MLP (model.py:49-85).

    MLP weights ~ N(0, 0.02) (model.py:235-236), biases zero.
    """

    hidden_size: int
    freq_size: int = 256
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def timestep_embedding(t: jax.Array, dim: int, max_period: int = 10000) -> jax.Array:
        half = dim // 2
        freqs = jnp.exp(
            -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
        )
        args = t.astype(jnp.float32)[:, None] * freqs[None]
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        if dim % 2:
            emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
        return emb

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:  # (N,) -> (N, D)
        normal02 = nn.initializers.normal(stddev=0.02)
        h = self.timestep_embedding(t, self.freq_size)
        h = nn.Dense(
            self.hidden_size, kernel_init=normal02, dtype=self.dtype, name="fc1"
        )(h.astype(self.dtype))
        h = jax.nn.silu(h)
        return nn.Dense(
            self.hidden_size, kernel_init=normal02, dtype=self.dtype, name="fc2"
        )(h)


class FinalLayer(nn.Module):
    """adaLN-modulated linear head (model.py:92-109); both the modulation and
    the output projection start at zero (model.py:244-247)."""

    hidden_size: int
    patch_size: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array) -> jax.Array:
        mod = nn.Dense(
            2 * self.hidden_size,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="adaLN",
        )(jax.nn.silu(c.astype(self.dtype)))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = layer_norm(x, eps=1e-6)  # elementwise_affine=False
        x = modulate(x, shift, scale)
        return nn.Dense(
            self.patch_size * self.patch_size * self.out_channels,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="linear",
        )(x)
