"""Stable-Diffusion VAE (AutoencoderKL) in Flax.

The reference consumes ``stabilityai/sd-vae-ft-{ema,mse}`` through diffusers
(train.py:156, sample.py:54) for the 224x224 -> 28x28x4 latent codec with
scaling factor 0.18215 (train.py:238-239).  This is a faithful JAX port of
that architecture (SD first-stage AutoencoderKL: ch=128, ch_mult=(1,2,4,4),
2 res-blocks per level, single mid-attention, double_z), NHWC layout.  Local
diffusers weights import via ``diffma_tpu.utils.torch_io.vae_params_from_torch``.
The container has no network egress, so tests run with random weights and the
importer is exercised against synthetic state dicts.

encode() returns the diagonal-Gaussian moments; ``sample`` + ``scale`` match
``vae.encode(x).latent_dist.sample().mul_(0.18215)``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["AutoencoderKL", "DiagonalGaussian", "SD_VAE_SCALE"]

SD_VAE_SCALE = 0.18215


class DiagonalGaussian:
    def __init__(self, moments: jax.Array):  # (N, H, W, 2C)
        self.mean, logvar = jnp.split(moments, 2, axis=-1)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, rng: jax.Array) -> jax.Array:
        return self.mean + self.std * jax.random.normal(
            rng, self.mean.shape, self.mean.dtype
        )

    def mode(self) -> jax.Array:
        return self.mean


def _gn(x, scale, bias, groups=32, eps=1e-6):
    N, H, W, C = x.shape
    xf = x.astype(jnp.float32).reshape(N, H, W, groups, C // groups)
    mu = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = jnp.square(xf - mu).mean(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(N, H, W, C)
    return (xf * scale + bias).astype(x.dtype)


class GroupNorm(nn.Module):
    channels: int
    groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", nn.initializers.ones, (self.channels,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.channels,), jnp.float32)
        return _gn(x, s, b, self.groups, self.eps)


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = GroupNorm(in_ch, name="norm1")(x)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv1")(
            jax.nn.silu(h)
        )
        h = GroupNorm(self.out_ch, name="norm2")(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(
            jax.nn.silu(h)
        )
        if in_ch != self.out_ch:
            x = nn.Conv(
                self.out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut"
            )(x)
        return x + h


class AttnBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        N, H, W, C = x.shape
        h = GroupNorm(C, name="norm")(x)
        q = nn.Dense(C, dtype=self.dtype, name="q")(h).reshape(N, H * W, C)
        k = nn.Dense(C, dtype=self.dtype, name="k")(h).reshape(N, H * W, C)
        v = nn.Dense(C, dtype=self.dtype, name="v")(h).reshape(N, H * W, C)
        att = jnp.einsum("nqc,nkc->nqk", q, k) / jnp.sqrt(C).astype(q.dtype)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(q.dtype)
        h = jnp.einsum("nqk,nkc->nqc", att, v).reshape(N, H, W, C)
        h = nn.Dense(C, dtype=self.dtype, name="proj_out")(h)
        return x + h


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: tuple = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for level, mult in enumerate(self.ch_mult):
            for b in range(self.num_res_blocks):
                h = ResnetBlock(
                    self.ch * mult, self.dtype, name=f"down_{level}_block_{b}"
                )(h)
            if level != len(self.ch_mult) - 1:
                # stride-2 conv with asymmetric (0,1) pad, as in SD
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(
                    h.shape[-1], (3, 3), strides=2, padding="VALID",
                    dtype=self.dtype, name=f"down_{level}_downsample",
                )(h)
        h = ResnetBlock(h.shape[-1], self.dtype, name="mid_block_1")(h)
        h = AttnBlock(h.shape[-1], self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], self.dtype, name="mid_block_2")(h)
        h = GroupNorm(h.shape[-1], name="norm_out")(h)
        h = nn.Conv(
            2 * self.z_channels, (3, 3), padding=1, dtype=self.dtype,
            name="conv_out",
        )(jax.nn.silu(h))
        return h  # moments (N, H/8, W/8, 2*z)


class Decoder(nn.Module):
    ch: int = 128
    ch_mult: tuple = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_ch: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        block_in = self.ch * self.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(block_in, self.dtype, name="mid_block_1")(h)
        h = AttnBlock(block_in, self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, self.dtype, name="mid_block_2")(h)
        for level in reversed(range(len(self.ch_mult))):
            out_ch = self.ch * self.ch_mult[level]
            for b in range(self.num_res_blocks + 1):
                h = ResnetBlock(out_ch, self.dtype, name=f"up_{level}_block_{b}")(h)
            if level != 0:
                N, H, W, C = h.shape
                h = jax.image.resize(h, (N, 2 * H, 2 * W, C), "nearest")
                h = nn.Conv(
                    C, (3, 3), padding=1, dtype=self.dtype,
                    name=f"up_{level}_upsample",
                )(h)
        h = GroupNorm(h.shape[-1], name="norm_out")(h)
        return nn.Conv(
            self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(jax.nn.silu(h))


class AutoencoderKL(nn.Module):
    """SD first-stage VAE.  Public API mirrors the two call sites:
    ``encode_sample(rng, x)`` == encode().latent_dist.sample()*scale and
    ``decode(z/scale)`` (x in NCHW [-1,1], z NCHW to match the denoiser)."""

    ch: int = 128
    ch_mult: tuple = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    out_ch: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            self.ch, self.ch_mult, self.num_res_blocks, self.z_channels, self.dtype
        )
        self.decoder = Decoder(
            self.ch, self.ch_mult, self.num_res_blocks, self.out_ch, self.dtype
        )
        self.quant_conv = nn.Dense(2 * self.z_channels, dtype=self.dtype)
        self.post_quant_conv = nn.Dense(self.z_channels, dtype=self.dtype)

    def encode(self, x: jax.Array) -> DiagonalGaussian:
        x = jnp.transpose(x, (0, 2, 3, 1))
        moments = self.quant_conv(self.encoder(x))
        return DiagonalGaussian(moments)

    def decode(self, z: jax.Array) -> jax.Array:
        z = jnp.transpose(z, (0, 2, 3, 1))
        img = self.decoder(self.post_quant_conv(z))
        return jnp.transpose(img, (0, 3, 1, 2))

    def encode_sample(self, rng: jax.Array, x: jax.Array, scale: float = SD_VAE_SCALE):
        dist = self.encode(x)
        return jnp.transpose(dist.sample(rng), (0, 3, 1, 2)) * scale

    def __call__(self, rng, x):
        z = self.encode_sample(rng, x)
        return self.decode(z / SD_VAE_SCALE)
