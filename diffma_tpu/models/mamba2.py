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
from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from diffma_tpu.ops.conv import causal_conv1d
from diffma_tpu.ops.fused_mixer import mixer_fused_eligible
from diffma_tpu.ops.fused_ssd import mamba2_mixer_fused
from diffma_tpu.ops.norm import rms_norm_gated
from diffma_tpu.ops.scan_orders import ScanSpec
from diffma_tpu.ops.ssd import ssd_chunked, ssd_chunked_grouped

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


class _Kernel(nn.Module):
    """Bare kernel param with the same tree entry as a bias-free nn.Dense."""

    shape: tuple
    kernel_init: object

    @nn.compact
    def __call__(self):
        return self.param("kernel", self.kernel_init, self.shape, jnp.float32)


class Mamba2(nn.Module):
    """SSD mixer.  ``__call__(u, spec)`` with u (B, L, d_model).

    Parallelism (TPU-native realisation of the reference's latent hooks,
    block/mamba2.py:305-307,355-357,708-710 -- which upstream can never
    enable for its own configs: ColumnParallelLinear asserts
    ``ngroups % world_size == 0`` with ngroups=1):

    * ``tp_axis``: heads sharded over ``mesh[tp_axis]`` via shard_map.  Each
      shard computes its own (tiny, 2*n-wide) copy of the shared B/C
      projections, so conv, SSD scan and gating run entirely on sharded
      activations; collectives are one tiny psum of the gated-RMSNorm
      sum-of-squares (the norm group spans all of d_inner upstream) and THE
      out_proj psum (the RowParallel epilogue).  Weights stay replicated.
    * ``sp_axis``: sequence parallelism through ``parallel/sequence.py``
      (one state-summary all-gather per mixer, length-independent).
    """

    d_model: int
    d_state: int = 16  # blocks pass the config value (block/mamba_block.py:42)
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64
    ngroups: int = 1
    chunk_size: int = 256
    dt_limit: tuple = (0.0, float("inf"))
    norm_eps: float = 1e-5
    scan_impl: str = "auto"  # "fused" = whole-mixer Pallas kernel (inference)
    mesh: Optional[Mesh] = None
    tp_axis: Optional[str] = None
    sp_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @property
    def d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def nheads(self) -> int:
        assert self.d_inner % self.headdim == 0
        return self.d_inner // self.headdim

    def _axis_size(self, axis: Optional[str]) -> int:
        if axis is None or self.mesh is None:
            return 1
        return self.mesh.shape[axis]

    @nn.compact
    def __call__(
        self, u: jax.Array, spec: ScanSpec, return_weights: bool = False
    ):
        d_in = self.d_inner
        n = self.d_state
        H = self.nheads
        g = self.ngroups
        assert H % g == 0, (H, g)
        conv_dim = d_in + 2 * g * n
        d_in_proj = 2 * d_in + 2 * g * n + H
        xavier = nn.initializers.xavier_uniform()

        in_w = _Kernel((self.d_model, d_in_proj), xavier, name="in_proj")()
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
        dt_bias = self.param("dt_bias", _dt_bias_init(), (H,))
        A_log = self.param("A_log", _A_log_init(), (H,))
        D = self.param("D", nn.initializers.ones, (H,), jnp.float32)
        norm_w = self.param("norm_weight", nn.initializers.ones, (d_in,), jnp.float32)
        out_w = _Kernel((d_in, self.d_model), xavier, name="out_proj")()
        weights = (in_w, conv_w, conv_b, dt_bias, A_log, D, norm_w, out_w)
        if return_weights:
            # Caller (e.g. the dual-branch block) batches several mixers
            # into one stacked kernel launch; params still live here.
            return weights

        if (
            self.scan_impl == "fused"
            and g == 1  # fused whole-mixer kernel is single-group only
            and self._axis_size(self.tp_axis) == 1
            and self._axis_size(self.sp_axis) == 1
            and mixer_fused_eligible(spec, partition=True)
        ):
            # Whole SSD mixer (in_proj -> streams -> chunkless SSD -> gated
            # norm -> merge -> out_proj) in one Pallas kernel; the per-head
            # decay tiles stay in VMEM (see ops/fused_ssd.py).
            return mamba2_mixer_fused(
                spec, u.astype(self.dtype), *weights,
                tuple(self.dt_limit), self.norm_eps, self.chunk_size,
            )

        if self._axis_size(self.tp_axis) > 1 or self._axis_size(self.sp_axis) > 1:
            # Parallel paths are single-group: our TP shards HEADS with the
            # (tiny) B/C columns replicated, which is only head-symmetric for
            # ngroups=1.  The reference's TP instead divides ngroups across
            # ranks (block/mamba2.py:283-284) -- an arrangement no shipped
            # config can use (every config has ngroups=1, so world_size>1
            # would fail its own assert).  Grouped + parallel is therefore
            # out of scope by the same bound the reference imposes.
            assert g == 1, "tensor/sequence parallel Mamba2 requires ngroups=1"
        if self._axis_size(self.tp_axis) > 1:
            sp = self._axis_size(self.sp_axis) > 1
            if sp and spec.fwd.shape[1] % self._axis_size(self.sp_axis):
                raise ValueError(
                    f"tp+sp composition needs the stream length "
                    f"{spec.fwd.shape[1]} divisible by the sp axis size "
                    f"{self._axis_size(self.sp_axis)}"
                )
            # tp+sp composition (the reference couples them the same way:
            # sequence_parallel is a mode OF tensor parallel,
            # block/mamba2.py:260,276,708-710): ONE shard_map manual over
            # both axes; heads are tp-sliced as below, the SSD scan runs on
            # this shard's sequence slice with a state-summary exchange over
            # sp, and the merge contributions (disjoint token sets per sp
            # shard) fold into a single psum over {tp, sp} at out_proj.
            fn = jax.shard_map(
                partial(self._forward, spec=spec, tp=True, sp=sp),
                mesh=self.mesh,
                in_specs=(P(),) * (1 + len(weights)),
                out_specs=P(),
                axis_names=(
                    {self.tp_axis, self.sp_axis} if sp else {self.tp_axis}
                ),
            )
            return fn(u, *weights)
        return self._forward(u, *weights, spec=spec)

    def _forward(
        self, u, in_w, conv_w, conv_b, dt_bias, A_log, D, norm_w, out_w,
        spec: ScanSpec, tp: bool = False, sp: bool = False,
    ) -> jax.Array:
        B_, L, _ = u.shape
        d_in, n, g = self.d_inner, self.d_state, self.ngroups
        H, Ph = self.nheads, self.headdim
        cd = self.dtype
        S, Ls = spec.fwd.shape

        if tp:
            ntp = self._axis_size(self.tp_axis)
            H_l = H // ntp
            assert H_l * ntp == H, (H, ntp)
            d_l = H_l * Ph
            s_idx = jax.lax.axis_index(self.tp_axis)
            off = s_idx * d_l
            # Column groups of the fused [z|x|B|C|dt] projection owned by
            # this shard: its z and x head-slices, the full (shared) B/C
            # columns, and its dt head-slice.
            Wz = jax.lax.dynamic_slice_in_dim(in_w, off, d_l, 1)
            Wx = jax.lax.dynamic_slice_in_dim(in_w, d_in + off, d_l, 1)
            Wbc = jax.lax.dynamic_slice_in_dim(in_w, 2 * d_in, 2 * g * n, 1)
            Wdt = jax.lax.dynamic_slice_in_dim(
                in_w, 2 * d_in + 2 * g * n + s_idx * H_l, H_l, 1
            )
            uc = u.astype(cd)
            z_f = jnp.dot(uc, Wz.astype(cd))
            xBC_f = jnp.concatenate(
                [jnp.dot(uc, Wx.astype(cd)), jnp.dot(uc, Wbc.astype(cd))], -1
            )
            dt_f = jnp.dot(uc, Wdt.astype(cd))
            zxbcdt = jnp.concatenate([z_f, xBC_f, dt_f], axis=-1)
            # conv channels = this shard's x slice + the shared B/C tail
            conv_w = jnp.concatenate(
                [
                    jax.lax.dynamic_slice_in_dim(conv_w, off, d_l, 0),
                    jax.lax.dynamic_slice_in_dim(conv_w, d_in, 2 * g * n, 0),
                ],
                axis=0,
            )
            conv_b = jnp.concatenate(
                [
                    jax.lax.dynamic_slice_in_dim(conv_b, off, d_l, 0),
                    jax.lax.dynamic_slice_in_dim(conv_b, d_in, 2 * g * n, 0),
                ],
                axis=0,
            )
            dt_bias = jax.lax.dynamic_slice_in_dim(dt_bias, s_idx * H_l, H_l, 0)
            A_log = jax.lax.dynamic_slice_in_dim(A_log, s_idx * H_l, H_l, 0)
            D = jax.lax.dynamic_slice_in_dim(D, s_idx * H_l, H_l, 0)
            norm_w = jax.lax.dynamic_slice_in_dim(norm_w, off, d_l, 0)
            out_w = jax.lax.dynamic_slice_in_dim(out_w, off, d_l, 0)
            d_eff, H_eff = d_l, H_l
        else:
            # Project, THEN fan out (the reference order, block/mamba2.py:390).
            # Fanning out first looks cheaper on gather traffic but makes the
            # in_proj matmul S-times larger -- measured slower for S=3 spiral.
            zxbcdt = jnp.dot(u.astype(cd), in_w.astype(cd))
            d_eff, H_eff = d_in, H

        fwd = jnp.asarray(np.ascontiguousarray(spec.fwd))
        xs = jnp.take(zxbcdt, fwd.reshape(-1), axis=1)
        xs = xs.reshape(B_ * S, Ls, zxbcdt.shape[-1])

        z, xBC, dt = jnp.split(xs, [d_eff, d_eff + d_eff + 2 * g * n], axis=-1)
        xBC = causal_conv1d(xBC, conv_w, conv_b, activation="silu")
        x_ssm, B_ssm, C_ssm = jnp.split(xBC, [d_eff, d_eff + g * n], axis=-1)

        ssd_args = dict(
            dt_bias=dt_bias, dt_softplus=True, dt_limit=self.dt_limit,
            chunk_size=self.chunk_size,
        )
        x_h = x_ssm.reshape(B_ * S, Ls, H_eff, Ph)
        A = -jnp.exp(A_log.astype(jnp.float32))
        Ls_eff = Ls
        if tp and sp:
            # Sequence-parallel scan INSIDE the tensor-parallel shard: each
            # sp shard scans its contiguous Ls/nsp token slice and exchanges
            # one (G, H, P, N) state summary over sp (parallel/sequence.py);
            # projections/conv above stay full-length (sp-replicated) -- the
            # scan is the sequential bottleneck sp splits.
            from diffma_tpu.parallel.sequence import (
                _local_with_carry, _seq_shard,
            )

            nsp = self._axis_size(self.sp_axis)
            shd = lambda a: _seq_shard(a, self.sp_axis, nsp)  # noqa: E731
            y = _local_with_carry(
                shd(x_h), shd(dt.astype(jnp.float32)), A, shd(B_ssm),
                shd(C_ssm), D, dt_bias=dt_bias, dt_softplus=True,
                dt_limit=self.dt_limit, chunk_size=self.chunk_size,
                axis=self.sp_axis,
                varying_axes=(self.tp_axis, self.sp_axis),
            )
            z = shd(z)
            Ls_eff = Ls // nsp
        elif tp:
            # Under shard_map the inter-chunk lax.scan carry must be marked
            # device-varying over the manual axis or its type won't match
            # the (tp-varying) body output.
            ssd_args["initial_state"] = jax.lax.pcast(
                jnp.zeros((B_ * S, H_eff, Ph, n), jnp.float32),
                (self.tp_axis,), to="varying",
            )
            y = ssd_chunked(
                x_h, dt.astype(jnp.float32), A, B_ssm, C_ssm, D, **ssd_args
            )
        elif self._axis_size(self.sp_axis) > 1:
            from diffma_tpu.parallel.sequence import ssd_sequence_parallel

            y = ssd_sequence_parallel(
                x_h, dt.astype(jnp.float32), A, B_ssm, C_ssm, D,
                mesh=self.mesh, axis=self.sp_axis, **ssd_args,
            )
        else:
            y = ssd_chunked_grouped(
                x_h, dt.astype(jnp.float32), A, B_ssm, C_ssm, D, ngroups=g,
                **ssd_args,
            )
        y = y.reshape(B_ * S, Ls_eff, d_eff)

        if tp:
            # Gated RMSNorm whose single group spans ALL of d_inner
            # (block/mamba2.py:347-350 with ngroups=1): gate locally, psum
            # the sum-of-squares for the global RMS statistic.
            yf = y.astype(jnp.float32)
            zf = z.astype(jnp.float32)
            yf = yf * (zf * jax.nn.sigmoid(zf))
            sumsq = jax.lax.psum(
                jnp.sum(jnp.square(yf), axis=-1, keepdims=True), self.tp_axis
            )
            rms = jax.lax.rsqrt(sumsq / (d_in // g) + self.norm_eps)
            y = (yf * rms * norm_w.astype(jnp.float32)).astype(y.dtype)
        else:
            y = rms_norm_gated(
                y, norm_w, z, eps=self.norm_eps,
                group_size=d_in // g, norm_before_gate=False,
            )

        if tp and sp:
            # Scatter the local slice back into a zero full-length buffer:
            # sp shards own disjoint stream positions, so summing the merged
            # outputs over sp reassembles the sequence -- folded into the
            # out_proj psum below (one all-reduce over {tp, sp}, no
            # dedicated all_gather).
            from diffma_tpu.parallel.sequence import _seq_unshard

            y = _seq_unshard(y, Ls, self.sp_axis)

        merge = jnp.asarray(np.ascontiguousarray(spec.merge))
        ys = y.reshape(B_, S * Ls, d_eff)
        merged = jnp.take(ys, merge.reshape(-1), axis=1).reshape(
            B_, L, merge.shape[1], d_eff
        )
        merged = jnp.sum(merged, axis=2) * spec.scale

        out = jnp.dot(merged.astype(cd), out_w.astype(cd))
        if tp and sp:
            return jax.lax.psum(out, (self.tp_axis, self.sp_axis))
        return jax.lax.psum(out, self.tp_axis) if tp else out
