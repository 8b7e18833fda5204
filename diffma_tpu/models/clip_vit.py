"""BiomedCLIP image tower (ViT-B/16) in Flax.

The reference conditions on the 512-d global CT embedding produced by
``create_model_from_pretrained('hf-hub:microsoft/BiomedCLIP-...').visual``
(train.py:176-177, sample.py:56-58).  BiomedCLIP's image tower is a timm
ViT-B/16 (patch 16, width 768, 12 layers, 12 heads, GELU, pre-LN blocks,
CLS-token pooling) with a linear projection head to 512.

This module implements that architecture NHWC/TPU-style (patchify as
reshape+matmul).  Weights must be imported from a locally available
checkpoint (no egress in this container); random init otherwise.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["VisionTransformer", "biomedclip_vit_b16"]


class MlpBlock(nn.Module):
    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        h = jax.nn.gelu(h, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)


class EncoderBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        B, L, D = h.shape
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(B, L, 3, self.heads, D // self.heads), 3, 2)
        q, k, v = (t.squeeze(2).transpose(0, 2, 1, 3) for t in (q, k, v))
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(D // self.heads).astype(
            q.dtype
        )
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(q.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", att, v).transpose(0, 2, 1, 3).reshape(B, L, D)
        x = x + nn.Dense(D, dtype=self.dtype, name="proj")(o)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        return x + MlpBlock(
            self.dim, int(self.dim * self.mlp_ratio), self.dtype, name="mlp"
        )(h)


class VisionTransformer(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    width: int = 768
    depth: int = 12
    heads: int = 12
    output_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (N, 3, H, W) -> (N, out)
        N, C, H, W = x.shape
        p = self.patch_size
        g = H // p
        x = jnp.transpose(x, (0, 2, 3, 1))
        x = x.reshape(N, g, p, g, p, C).transpose(0, 1, 3, 5, 2, 4)
        x = x.reshape(N, g * g, C * p * p)
        kernel = self.param(
            "patch_kernel", nn.initializers.xavier_uniform(),
            (C * p * p, self.width), jnp.float32,
        )
        bias = self.param("patch_bias", nn.initializers.zeros, (self.width,), jnp.float32)
        x = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype)) + bias.astype(
            self.dtype
        )

        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.width), jnp.float32
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (N, 1, self.width)), x], axis=1
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, g * g + 1, self.width), jnp.float32,
        )
        x = x + pos.astype(x.dtype)

        for i in range(self.depth):
            x = EncoderBlock(
                self.width, self.heads, dtype=self.dtype, name=f"block_{i}"
            )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        cls_out = x[:, 0]
        return nn.Dense(
            self.output_dim, use_bias=False, dtype=self.dtype, name="head"
        )(cls_out)


def biomedclip_vit_b16(dtype=jnp.float32) -> VisionTransformer:
    return VisionTransformer(
        img_size=224, patch_size=16, width=768, depth=12, heads=12,
        output_dim=512, dtype=dtype,
    )
