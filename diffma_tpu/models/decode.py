"""Incremental (single-token) decode for the Mamba mixers.

Capability parity with the reference's inference-cache API:
``Mamba.step`` / ``allocate_inference_cache`` (block/mamba.py:405-471) and
``Mamba2.step`` / ``allocate_inference_cache`` (block/mamba2.py:714-795).
The reference threads mutable ``(conv_state, ssm_state)`` tensors through an
``inference_params`` dict keyed by layer; the TPU-native design is a pure
function over an explicit cache pytree, so a whole autoregressive decode can
sit inside one ``lax.scan`` with the caches as carries.

Both step functions consume the *exact* Flax param trees produced by
``diffma_tpu.models.mamba.Mamba`` / ``mamba2.Mamba2``, so a trained
checkpoint decodes without any weight surgery:

    params = model.init(...)['params']          # or restored
    cache  = allocate_mamba_cache(B, d_inner=1024)
    y, cache = mamba_step(params, x_t, cache)   # x_t (B, d_model)

Iterating ``*_step`` over a sequence is numerically identical to the full
parallel forward with an identity scan order (tested in
tests/test_decode.py); like upstream, decode is defined for the causal
raster order only -- the 2-D multi-stream scan orders are a training/parallel
-sampling construct.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from diffma_tpu.ops.conv import causal_conv1d_update
from diffma_tpu.ops.norm import rms_norm_gated
from diffma_tpu.ops.selective_scan import selective_state_update
from diffma_tpu.ops.ssd import ssd_state_update

__all__ = [
    "MixerCache",
    "allocate_mamba_cache",
    "allocate_mamba2_cache",
    "mamba_step",
    "mamba2_step",
]


class MixerCache(NamedTuple):
    """Per-mixer decode state: rolling conv window + SSM state (fp32)."""

    conv_state: jax.Array  # (B, K, conv_channels), oldest first
    ssm_state: jax.Array  # Mamba1: (B, d_inner, n); Mamba2: (B, H, P, N)


def allocate_mamba_cache(
    batch: int, d_inner: int, d_conv: int = 4, d_state: int = 16,
    dtype=jnp.float32,
) -> MixerCache:
    """Mamba1 cache (block/mamba.py:461-471)."""
    return MixerCache(
        conv_state=jnp.zeros((batch, d_conv, d_inner), dtype),
        ssm_state=jnp.zeros((batch, d_inner, d_state), jnp.float32),
    )


def allocate_mamba2_cache(
    batch: int, d_inner: int, d_conv: int = 4, d_state: int = 16,
    headdim: int = 64, ngroups: int = 1, dtype=jnp.float32,
) -> MixerCache:
    """Mamba2 cache (block/mamba2.py:782-795)."""
    conv_dim = d_inner + 2 * ngroups * d_state
    return MixerCache(
        conv_state=jnp.zeros((batch, d_conv, conv_dim), dtype),
        ssm_state=jnp.zeros(
            (batch, d_inner // headdim, headdim, d_state), jnp.float32
        ),
    )


def mamba_step(
    params, x_t: jax.Array, cache: MixerCache
) -> tuple[jax.Array, MixerCache]:
    """One Mamba1 decode step (block/mamba.py:405-459).  x_t (B, d_model)."""
    xz = x_t @ params["in_proj"]["kernel"].astype(x_t.dtype)  # (B, 2*d_in)
    d_in = xz.shape[-1] // 2
    x, z = xz[:, :d_in], xz[:, d_in:]

    x, conv_state = causal_conv1d_update(
        x, cache.conv_state, params["conv1d_weight"], params["conv1d_bias"]
    )

    x_db = x @ params["x_proj"]["kernel"].astype(x.dtype)
    n = params["A_log"].shape[1]
    r = x_db.shape[-1] - 2 * n
    dt_r, B, C = x_db[:, :r], x_db[:, r : r + n], x_db[:, r + n :]
    # The reference applies dt_proj's weight here and folds its bias into the
    # softplus inside the state update (block/mamba.py:433,437).
    dt = dt_r.astype(jnp.float32) @ params["dt_proj"]["kernel"].astype(jnp.float32)

    A = -jnp.exp(params["A_log"].astype(jnp.float32))
    y, ssm_state = selective_state_update(
        cache.ssm_state, x, dt, A, B, C, params["D"], z=z,
        dt_bias=params["dt_proj"]["bias"], dt_softplus=True,
    )
    out = y @ params["out_proj"]["kernel"].astype(y.dtype)
    return out, MixerCache(conv_state, ssm_state)


def mamba2_step(
    params, x_t: jax.Array, cache: MixerCache,
    headdim: int = 64, ngroups: int = 1, norm_eps: float = 1e-5,
) -> tuple[jax.Array, MixerCache]:
    """One Mamba2 (SSD) decode step (block/mamba2.py:714-780).
    x_t (B, d_model)."""
    assert ngroups == 1, "ngroups>1 not required by any reference config"
    H = params["A_log"].shape[0]
    zxbcdt = x_t @ params["in_proj"]["kernel"].astype(x_t.dtype)
    conv_dim = cache.conv_state.shape[-1]
    d_in = zxbcdt.shape[-1] - H - conv_dim  # [z | xBC | dt] split
    z = zxbcdt[:, :d_in]
    xBC = zxbcdt[:, d_in : d_in + conv_dim]
    dt = zxbcdt[:, d_in + conv_dim :]  # (B, H)

    xBC, conv_state = causal_conv1d_update(
        xBC, cache.conv_state, params["conv1d_weight"], params["conv1d_bias"]
    )
    n = (conv_dim - d_in) // 2
    x = xBC[:, :d_in]
    B = xBC[:, d_in : d_in + n]
    C = xBC[:, d_in + n :]

    A = -jnp.exp(params["A_log"].astype(jnp.float32))
    y, ssm_state = ssd_state_update(
        cache.ssm_state, x.reshape(x.shape[0], H, headdim), dt, A, B, C,
        params["D"], dt_bias=params["dt_bias"], dt_softplus=True,
    )
    y = y.reshape(x.shape[0], d_in)
    y = rms_norm_gated(
        y, params["norm_weight"], z, eps=norm_eps, group_size=d_in,
        norm_before_gate=False,
    )
    out = y @ params["out_proj"]["kernel"].astype(y.dtype)
    return out, MixerCache(conv_state, ssm_state)
