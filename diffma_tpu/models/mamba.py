"""Mamba-1 mixer (selective-scan SSM) as a Flax module.

Re-designs the reference ``Mamba`` (block/mamba.py:226-491) TPU-first:

* One big in-projection matmul over the *unpermuted* sequence, then the
  static ScanSpec gathers fan the tokens out into S scan streams that are
  folded into the batch axis -- a single batched Pallas scan replaces the
  reference's 3-4 sequential ``mamba_inner_fn`` kernel launches
  (block/mamba.py:346-401).
* The scatter-add merge runs *before* ``out_proj`` (valid because out_proj
  carries no bias, block/mamba.py:315), so the output matmul is done once.
* A_log / D / dt bias are fp32 "islands" (block/mamba.py:309-313); all
  activations flow in ``dtype`` (bf16 in training).

Initialisation matches the reference's *effective* init: DiffMa's
``_basic_init`` (model.py:219-224) re-initialises every nn.Linear inside the
mixers with xavier_uniform and zeroes every bias -- including dt_proj's
carefully constructed softplus-inverse bias (block/mamba.py:292-302), whose
``_no_reinit`` marker the reference loop never checks.  ``init_style='mamba'``
restores the upstream mamba_ssm init for standalone use.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from diffma_tpu.ops.scan_orders import ScanSpec
from diffma_tpu.ops.selective_scan import selective_scan
from diffma_tpu.ops.conv import causal_conv1d
from diffma_tpu.ops.fused_mamba import mamba_inner_fused

__all__ = ["Mamba"]


class _Kernel(nn.Module):
    """Bare parameter holder producing the same tree entry as nn.Dense
    ({<name>: {kernel[, bias]}}), so the fused path can read raw weights
    while checkpoints stay interchangeable with the unfused path."""

    shape: tuple
    kernel_init: object
    bias_init: object = None

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, self.shape, jnp.float32)
        if self.bias_init is None:
            return k
        return k, self.param("bias", self.bias_init, (self.shape[1],), jnp.float32)


def _conv_init_torch(key, shape, dtype=jnp.float32):
    """torch Conv1d default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
    with fan_in = K for a depthwise kernel (shape (C, K))."""
    bound = 1.0 / math.sqrt(shape[-1])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _dt_proj_weight_init(dt_rank: int, dt_scale: float = 1.0):
    std = dt_rank**-0.5 * dt_scale

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -std, std)

    return init


def _dt_bias_init(dt_min: float = 0.001, dt_max: float = 0.1, floor: float = 1e-4):
    def init(key, shape, dtype=jnp.float32):
        dt = jnp.exp(
            jax.random.uniform(key, shape, jnp.float32)
            * (math.log(dt_max) - math.log(dt_min))
            + math.log(dt_min)
        )
        dt = jnp.clip(dt, floor, None)
        # inverse softplus
        return (dt + jnp.log(-jnp.expm1(-dt))).astype(dtype)

    return init


class Mamba(nn.Module):
    """Selective-scan mixer.  ``__call__(x, spec)`` with x (B, L, d_model)."""

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: Optional[int] = None  # None => ceil(d_model/16) (block/mamba.py:257)
    init_style: str = "diffma"  # 'diffma' (effective ref init) | 'mamba'
    scan_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @property
    def d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def rank(self) -> int:
        return self.dt_rank if self.dt_rank is not None else math.ceil(self.d_model / 16)

    @nn.compact
    def __call__(self, x: jax.Array, spec: ScanSpec) -> jax.Array:
        B_, L, _ = x.shape
        d_in, n, r = self.d_inner, self.d_state, self.rank
        xavier = nn.initializers.xavier_uniform()
        if self.init_style == "diffma":
            dt_w_init, dt_b_init = xavier, nn.initializers.zeros
        else:
            dt_w_init, dt_b_init = _dt_proj_weight_init(r), _dt_bias_init()

        xz = nn.Dense(
            2 * d_in, use_bias=False, kernel_init=xavier, dtype=self.dtype,
            name="in_proj",
        )(x.astype(self.dtype))

        # Fan out into scan streams and fold them into the batch axis.
        fwd = jnp.asarray(np.ascontiguousarray(spec.fwd))  # (S, Ls)
        xs = jnp.take(xz, fwd.reshape(-1), axis=1)  # (B, S*Ls, 2*d_in)
        S, Ls = spec.fwd.shape
        xs = xs.reshape(B_ * S, Ls, 2 * d_in)

        conv_w = self.param("conv1d_weight", _conv_init_torch, (d_in, self.d_conv))
        # torch Conv1d bias bound uses the weight's fan_in (= K, depthwise).
        conv_b = self.param(
            "conv1d_bias",
            lambda k, s: jax.random.uniform(
                k, s, jnp.float32, -1.0 / math.sqrt(self.d_conv),
                1.0 / math.sqrt(self.d_conv),
            ),
            (d_in,),
        )
        xp_w = _Kernel((d_in, r + 2 * n), xavier, name="x_proj")()
        dt_w, dt_b = _Kernel(
            (r, d_in), dt_w_init, bias_init=dt_b_init, name="dt_proj"
        )()
        A_log = self.param(
            "A_log",
            lambda k, s: jnp.tile(
                jnp.log(jnp.arange(1, n + 1, dtype=jnp.float32))[None, :], (d_in, 1)
            ),
            (d_in, n),
        )
        D = self.param("D", nn.initializers.ones, (d_in,), jnp.float32)
        A = -jnp.exp(A_log.astype(jnp.float32))

        if self.scan_impl == "fused":
            # One Pallas kernel: conv -> projections -> scan -> gate.
            y = mamba_inner_fused(xs, conv_w, conv_b, xp_w, dt_w, dt_b, A, D)
        else:
            u, z = jnp.split(xs, 2, axis=-1)
            u = causal_conv1d(u, conv_w, conv_b, activation="silu")
            x_dbl = jnp.dot(u, xp_w.astype(u.dtype))
            dt_r, B_ssm, C_ssm = jnp.split(x_dbl, [r, r + n], axis=-1)
            delta = (
                jnp.dot(dt_r.astype(jnp.float32), dt_w.astype(jnp.float32))
                + dt_b.astype(jnp.float32)
            )
            y = selective_scan(
                u, delta, A, B_ssm, C_ssm, D, z=z, impl=self.scan_impl
            )

        out_proj = nn.Dense(
            self.d_model, use_bias=False, kernel_init=xavier, dtype=self.dtype,
            name="out_proj",
        )

        if spec.mamba1_vim_quirk:
            # Reference Mamba1 'vim' merge bug (block/mamba.py:362-367): the
            # reverse stream is left in reversed token order and its *output
            # features* are flipped before averaging.  flip_D(y @ W) ==
            # y @ flip(W, out_axis), so run out_proj per stream and reverse
            # the second stream's output columns.
            ys = y.reshape(B_, S, Ls, d_in).astype(self.dtype)
            o1 = out_proj(ys[:, 0])
            o2 = out_proj(ys[:, 1])[..., ::-1]
            return (o1 + o2) * spec.scale

        # Scatter-add merge (pre-out_proj; out_proj has no bias).
        merge = jnp.asarray(np.ascontiguousarray(spec.merge))  # (L, k)
        ys = y.reshape(B_, S * Ls, d_in)
        merged = jnp.take(ys, merge.reshape(-1), axis=1).reshape(
            B_, L, merge.shape[1], d_in
        )
        merged = jnp.sum(merged, axis=2) * spec.scale

        return out_proj(merged.astype(self.dtype))
