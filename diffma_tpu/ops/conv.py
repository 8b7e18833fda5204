"""Causal depthwise 1-D convolution.

Replaces the ``causal_conv1d`` CUDA package (imported at block/mamba.py:13,
block/mamba2.py:10).  Both mixers use kernel size 4 with left padding 3 and a
SiLU activation (block/mamba.py:263-271, block/mamba2.py:309-318).  On TPU a
k-tap depthwise causal conv is cheapest as k shifted multiply-adds -- XLA
fuses them into the surrounding elementwise graph, and there is no im2col or
gather traffic.

Also provides the single-token state update used by incremental decode
(spec: block/mamba.py:412-418 / block/mamba2.py:727-732).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["causal_conv1d", "causal_conv1d_update"]


def causal_conv1d(
    x: jax.Array,  # (G, L, C) feature-last
    weight: jax.Array,  # (C, K)
    bias: Optional[jax.Array] = None,  # (C,)
    activation: Optional[str] = "silu",
) -> jax.Array:
    """y[t] = act(sum_k w[:, k] * x[t - K + 1 + k] + b), zero left-pad."""
    K = weight.shape[-1]
    w = weight.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    pad = jnp.pad(xf, ((0, 0), (K - 1, 0), (0, 0)))
    L = x.shape[1]
    y = sum(pad[:, k : k + L, :] * w[:, k][None, None, :] for k in range(K))
    if bias is not None:
        y = y + bias.astype(jnp.float32)[None, None, :]
    if activation == "silu":
        y = y * jax.nn.sigmoid(y)
    elif activation is not None:
        raise ValueError(activation)
    return y.astype(x.dtype)


def causal_conv1d_update(
    x_t: jax.Array,  # (G, C) new token
    conv_state: jax.Array,  # (G, K, C) rolling window, oldest first
    weight: jax.Array,  # (C, K)
    bias: Optional[jax.Array] = None,
    activation: Optional[str] = "silu",
) -> tuple[jax.Array, jax.Array]:
    """One decode step: roll the window, apply the K-tap filter."""
    conv_state = jnp.concatenate([conv_state[:, 1:], x_t[:, None]], axis=1)
    y = jnp.einsum(
        "gkc,ck->gc",
        conv_state.astype(jnp.float32),
        weight.astype(jnp.float32),
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if activation == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x_t.dtype), conv_state
