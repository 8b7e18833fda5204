"""CT conditioning encoder (block/CT_encoder.py:5-45) and the BEiT-style
VisionEmbedding it wraps (block/visionEmbedding.py:4-73).

The encoder patch-embeds the 4-channel VAE latent of the CT slice and
produces a per-token attention weight through a shared token-MLP over
avg- and max-pooled features:

    x       = VisionEmbedding(latent)                  # (N, T, D)
    weight  = sigmoid(fc(avg_D(x)) + fc(max_D(x)))     # (N, T, 1)
    tokens  = LayerNorm(x * weight)                    # (N, T, D)

(The reference's AdaptiveAvg/MaxPool2d((T,1)) on an (N, T, D) tensor reduce
over the embedding dim D; the fc MLP acts on the T token axis,
CT_encoder.py:25-31.)

Patchify is reshape+matmul (kernel == stride in all configs); the weight
layout matches a flattened torch Conv2d kernel so shipped checkpoints
(`pretrain_ct_vision_embedder/*.pt`) import with a transpose.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffma_tpu.models.layers import xavier_uniform
from diffma_tpu.ops.norm import layer_norm

__all__ = ["VisionEmbedding", "CTEncoder"]


class VisionEmbedding(nn.Module):
    """Conv-patchify + optional mask/cls tokens (block/visionEmbedding.py)."""

    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    contain_mask_token: bool = False
    prepend_cls_token: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @nn.compact
    def __call__(
        self, x: jax.Array, masked_position: Optional[jax.Array] = None
    ) -> jax.Array:
        # x: (N, C, H, W) for reference API parity
        N, C, H, W = x.shape
        p = self.patch_size
        assert H == self.img_size and W == self.img_size
        gh = H // p
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
        x = x.reshape(N, gh, p, gh, p, C)
        x = x.transpose(0, 1, 3, 5, 2, 4).reshape(N, gh * gh, C * p * p)
        kernel = self.param(
            "kernel", xavier_uniform, (C * p * p, self.embed_dim), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.embed_dim,), jnp.float32
        )
        x = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype)) + bias.astype(
            self.dtype
        )

        if self.contain_mask_token:
            mask_token = self.param(
                "mask_token", nn.initializers.zeros, (1, 1, self.embed_dim),
                jnp.float32,
            )
            if masked_position is not None:
                w = masked_position[..., None].astype(x.dtype)
                x = x * (1 - w) + mask_token.astype(x.dtype) * w
        if self.prepend_cls_token:
            cls_token = self.param(
                "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim),
                jnp.float32,
            )
            cls = jnp.broadcast_to(
                cls_token.astype(x.dtype), (N, 1, self.embed_dim)
            )
            x = jnp.concatenate([cls, x], axis=1)
        return x


class CTEncoder(nn.Module):
    """Per-token soft-mask conditioning encoder (block/CT_encoder.py)."""

    img_size: int = 28
    patch_size: int = 2
    in_channels: int = 4
    embed_dim: int = 1024
    contain_mask_token: bool = True
    reduction_ratio: int = 14
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        T = (self.img_size // self.patch_size) ** 2
        x = VisionEmbedding(
            img_size=self.img_size,
            patch_size=self.patch_size,
            in_chans=self.in_channels,
            embed_dim=self.embed_dim,
            contain_mask_token=self.contain_mask_token,
            dtype=self.dtype,
            name="vision_embedding",
        )(x)  # (N, T, D)

        fc = nn.Sequential(
            [
                nn.Dense(
                    int(T / self.reduction_ratio), kernel_init=xavier_uniform,
                    dtype=self.dtype, name="fc1",
                ),
                jax.nn.relu,
                nn.Dense(
                    T, kernel_init=xavier_uniform, dtype=self.dtype, name="fc2"
                ),
            ]
        )
        avg_out = fc(jnp.mean(x, axis=-1))  # (N, T): pool over D, MLP over T
        max_out = fc(jnp.max(x, axis=-1))
        weight = jax.nn.sigmoid(avg_out + max_out)[..., None]  # (N, T, 1)

        x = x * weight
        scale = self.param(
            "norm_scale", nn.initializers.ones, (self.embed_dim,), jnp.float32
        )
        bias = self.param(
            "norm_bias", nn.initializers.zeros, (self.embed_dim,), jnp.float32
        )
        x = layer_norm(x, scale, bias, eps=1e-5)
        return weight, x
