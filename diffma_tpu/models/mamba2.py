"""Mamba-2 (SSD) mixer as a Flax module.

Re-designs the reference ``Mamba2`` (block/mamba2.py:234-819) TPU-first:

* Single fused in-projection producing [z, x, B, C, dt] per token
  (order: block/mamba2.py:300-301), then static ScanSpec gathers fan out the
  scan streams (the reference permutes the pre-split zxbcdt tensor,
  block/mamba2.py:390; permuting before or after the per-token projection is
  equivalent) and fold them into the batch axis for one chunked SSD scan,
  replacing up to 4 sequential ``mamba_split_conv1d_scan_combined`` Triton
  launches (block/mamba2.py:392-696).
* Gated group-RMSNorm (norm_before_gate=False, block/mamba2.py:347-350) is
  applied per stream (it is nonlinear); the bias-free out_proj runs once on
  the merged sequence.
* Tensor-/sequence-parallel sharding is expressed with pjit shardings over a
  mesh (see diffma_tpu.parallel) instead of the reference's latent
  ColumnParallel/RowParallel wrappers (block/mamba2.py:305-307,355-357).

Effective init mirrors DiffMa's model-level re-init (xavier linears, zero
biases) with the non-Linear specials kept: dt_bias softplus-inverse init
(block/mamba2.py:325-332), A ~ U(1,16) log-parameterised (block/mamba2.py:
337-341), D = 1, torch-default conv init.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from diffma_tpu.ops.conv import causal_conv1d
from diffma_tpu.ops.norm import rms_norm_gated
from diffma_tpu.ops.scan_orders import ScanSpec
from diffma_tpu.ops.ssd import ssd_chunked

__all__ = ["Mamba2"]


def _dt_bias_init(dt_min=0.001, dt_max=0.1, floor=1e-4):
    def init(key, shape, dtype=jnp.float32):
        dt = jnp.exp(
            jax.random.uniform(key, shape, jnp.float32)
            * (math.log(dt_max) - math.log(dt_min))
            + math.log(dt_min)
        )
        dt = jnp.clip(dt, floor, None)
        return (dt + jnp.log(-jnp.expm1(-dt))).astype(dtype)

    return init


def _A_log_init(a_min=1.0, a_max=16.0):
    def init(key, shape, dtype=jnp.float32):
        return jnp.log(jax.random.uniform(key, shape, jnp.float32, a_min, a_max)).astype(
            dtype
        )

    return init


class Mamba2(nn.Module):
    """SSD mixer.  ``__call__(u, spec)`` with u (B, L, d_model)."""

    d_model: int
    d_state: int = 16  # blocks pass the config value (block/mamba_block.py:42)
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64
    ngroups: int = 1
    chunk_size: int = 256
    dt_limit: tuple = (0.0, float("inf"))
    norm_eps: float = 1e-5
    scan_impl: str = "auto"  # reserved (chunked JAX path is MXU-native)
    dtype: jnp.dtype = jnp.float32

    @property
    def d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def nheads(self) -> int:
        assert self.d_inner % self.headdim == 0
        return self.d_inner // self.headdim

    @nn.compact
    def __call__(self, u: jax.Array, spec: ScanSpec) -> jax.Array:
        B_, L, _ = u.shape
        d_in = self.d_inner
        n = self.d_state
        H, P = self.nheads, self.headdim
        g = self.ngroups
        conv_dim = d_in + 2 * g * n
        d_in_proj = 2 * d_in + 2 * g * n + H
        xavier = nn.initializers.xavier_uniform()

        zxbcdt = nn.Dense(
            d_in_proj, use_bias=False, kernel_init=xavier, dtype=self.dtype,
            name="in_proj",
        )(u.astype(self.dtype))

        fwd = jnp.asarray(np.ascontiguousarray(spec.fwd))
        S, Ls = spec.fwd.shape
        xs = jnp.take(zxbcdt, fwd.reshape(-1), axis=1)
        xs = xs.reshape(B_ * S, Ls, d_in_proj)

        z, xBC, dt = jnp.split(xs, [d_in, d_in + conv_dim], axis=-1)

        conv_w = self.param(
            "conv1d_weight",
            lambda k, s: jax.random.uniform(
                k, s, jnp.float32, -1.0 / math.sqrt(self.d_conv),
                1.0 / math.sqrt(self.d_conv),
            ),
            (conv_dim, self.d_conv),
        )
        conv_b = self.param(
            "conv1d_bias",
            lambda k, s: jax.random.uniform(
                k, s, jnp.float32, -1.0 / math.sqrt(self.d_conv),
                1.0 / math.sqrt(self.d_conv),
            ),
            (conv_dim,),
        )
        xBC = causal_conv1d(xBC, conv_w, conv_b, activation="silu")
        x_ssm, B_ssm, C_ssm = jnp.split(xBC, [d_in, d_in + g * n], axis=-1)

        dt_bias = self.param("dt_bias", _dt_bias_init(), (H,))
        A_log = self.param("A_log", _A_log_init(), (H,))
        D = self.param("D", nn.initializers.ones, (H,), jnp.float32)

        assert g == 1, "ngroups>1 not required by any reference config"
        y = ssd_chunked(
            x_ssm.reshape(B_ * S, Ls, H, P),
            dt.astype(jnp.float32),
            -jnp.exp(A_log.astype(jnp.float32)),
            B_ssm,
            C_ssm,
            D,
            dt_bias=dt_bias,
            dt_softplus=True,
            dt_limit=self.dt_limit,
            chunk_size=self.chunk_size,
        ).reshape(B_ * S, Ls, d_in)

        norm_w = self.param("norm_weight", nn.initializers.ones, (d_in,), jnp.float32)
        y = rms_norm_gated(
            y, norm_w, z, eps=self.norm_eps,
            group_size=d_in // g, norm_before_gate=False,
        )

        merge = jnp.asarray(np.ascontiguousarray(spec.merge))
        ys = y.reshape(B_, S * Ls, d_in)
        merged = jnp.take(ys, merge.reshape(-1), axis=1).reshape(
            B_, L, merge.shape[1], d_in
        )
        merged = jnp.sum(merged, axis=2) * spec.scale

        return nn.Dense(
            self.d_model, use_bias=False, kernel_init=xavier, dtype=self.dtype,
            name="out_proj",
        )(merged.astype(self.dtype))
