"""Normalisation primitives.

The reference uses Triton fused layer/RMS norms (block/mamba.py:21,
block/mamba2.py:17); on TPU XLA fuses these natively, so plain jnp
expressions with fp32 accumulation are the idiomatic equivalent.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["layer_norm", "rms_norm_gated"]


def layer_norm(
    x: jax.Array,
    weight: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    eps: float = 1e-6,
) -> jax.Array:
    """LayerNorm over the last axis, fp32 statistics."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm_gated(
    x: jax.Array,
    weight: jax.Array,
    z: Optional[jax.Array] = None,
    eps: float = 1e-5,
    group_size: Optional[int] = None,
    norm_before_gate: bool = False,
) -> jax.Array:
    """Gated group RMSNorm matching mamba_ssm's RMSNormGated
    (built at block/mamba2.py:347-350 with norm_before_gate=False):

        norm_before_gate=False:  out = rmsnorm(x * silu(z)) * weight
        norm_before_gate=True:   out = rmsnorm(x) * weight * silu(z)

    RMS statistics are computed per ``group_size`` slice of the last axis.
    """
    xf = x.astype(jnp.float32)
    if z is not None and not norm_before_gate:
        zf = z.astype(jnp.float32)
        xf = xf * (zf * jax.nn.sigmoid(zf))
    d = x.shape[-1]
    gs = group_size or d
    assert d % gs == 0
    shaped = xf.reshape(*xf.shape[:-1], d // gs, gs)
    rms = jax.lax.rsqrt(jnp.mean(jnp.square(shaped), axis=-1, keepdims=True) + eps)
    y = (shaped * rms).reshape(xf.shape) * weight.astype(jnp.float32)
    if z is not None and norm_before_gate:
        zf = z.astype(jnp.float32)
        y = y * (zf * jax.nn.sigmoid(zf))
    return y.astype(x.dtype)
