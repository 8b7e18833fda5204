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
from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from diffma_tpu.ops.scan_orders import ScanSpec
from diffma_tpu.ops.selective_scan import selective_scan
from diffma_tpu.ops.conv import causal_conv1d
from diffma_tpu.ops.fused_mamba import mamba_inner_fused
from diffma_tpu.ops.fused_mixer import mamba_mixer_fused, mixer_fused_eligible

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
    """Selective-scan mixer.  ``__call__(x, spec)`` with x (B, L, d_model).

    Parallelism (TPU-native realisation of the reference's latent TP/SP
    hooks, block/mamba2.py:305-307,355-357,708-710 -- Mamba1 upstream has
    none, so this is a capability extension):

    * ``tp_axis``: tensor parallelism over ``mesh[tp_axis]`` via shard_map.
      Each shard owns a contiguous d_inner slice; conv, scan and gating run
      on sharded activations; the only non-trivial collectives are one tiny
      psum of the (rank+2n)-wide x_proj output (x_proj mixes all of d_inner,
      which the reference's column-split cannot avoid either) and THE psum
      at out_proj (the RowParallel epilogue).  Mixer weights stay replicated
      (a deliberate trade: <=2 MB per projection at hidden=512; TP here buys
      compute/activation sharding, not parameter memory).
    * ``sp_axis``: sequence parallelism; the scan runs through
      ``parallel/sequence.py`` with one length-independent state-summary
      all-gather over the axis.
    """

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: Optional[int] = None  # None => ceil(d_model/16) (block/mamba.py:257)
    init_style: str = "diffma"  # 'diffma' (effective ref init) | 'mamba'
    scan_impl: str = "auto"
    mesh: Optional[Mesh] = None
    tp_axis: Optional[str] = None
    sp_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @property
    def d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def rank(self) -> int:
        return self.dt_rank if self.dt_rank is not None else math.ceil(self.d_model / 16)

    def _axis_size(self, axis: Optional[str]) -> int:
        if axis is None or self.mesh is None:
            return 1
        return self.mesh.shape[axis]

    @nn.compact
    def __call__(
        self, x: jax.Array, spec: ScanSpec, return_weights: bool = False
    ):
        d_in, n, r = self.d_inner, self.d_state, self.rank
        xavier = nn.initializers.xavier_uniform()
        if self.init_style == "diffma":
            dt_w_init, dt_b_init = xavier, nn.initializers.zeros
        else:
            dt_w_init, dt_b_init = _dt_proj_weight_init(r), _dt_bias_init()

        in_w = _Kernel((self.d_model, 2 * d_in), xavier, name="in_proj")()
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
        out_w = _Kernel((d_in, self.d_model), xavier, name="out_proj")()
        weights = (in_w, conv_w, conv_b, xp_w, dt_w, dt_b, A_log, D, out_w)
        if return_weights:
            # Caller (e.g. the dual-branch block) batches several mixers
            # into one stacked kernel launch; params still live here.
            return weights

        if self._axis_size(self.tp_axis) > 1:
            sp = self._axis_size(self.sp_axis) > 1
            if sp and spec.fwd.shape[1] % self._axis_size(self.sp_axis):
                raise ValueError(
                    f"tp+sp composition needs the stream length "
                    f"{spec.fwd.shape[1]} divisible by the sp axis size "
                    f"{self._axis_size(self.sp_axis)}"
                )
            # tp+sp in ONE mixer (mirrors the reference's coupling of
            # sequence parallelism to the tensor-parallel group,
            # block/mamba2.py:260,276,708-710): one shard_map manual over
            # both axes; the selective scan runs per sequence shard with a
            # state-summary exchange over sp, and the disjoint merge
            # contributions fold into a single psum over {tp, sp}.
            fn = jax.shard_map(
                partial(self._forward, spec=spec, tp=True, sp=sp),
                mesh=self.mesh,
                in_specs=(P(),) * (1 + len(weights)),
                out_specs=P(),
                axis_names=(
                    {self.tp_axis, self.sp_axis} if sp else {self.tp_axis}
                ),
            )
            return fn(x, *weights)
        return self._forward(x, *weights, spec=spec)

    def _forward(
        self, x, in_w, conv_w, conv_b, xp_w, dt_w, dt_b, A_log, D, out_w,
        spec: ScanSpec, tp: bool = False, sp: bool = False,
    ) -> jax.Array:
        """Mixer body.  With ``tp=True`` it runs per tensor-parallel shard
        (under shard_map): every weight is sliced to this shard's contiguous
        d_inner range, activations stay sharded through conv/scan/gate, and
        the only collectives are the tiny x_proj psum and the out_proj psum."""
        B_, L, _ = x.shape
        d_in, n, r = self.d_inner, self.d_state, self.rank
        cd = self.dtype
        S, Ls = spec.fwd.shape

        if (
            self.scan_impl == "fused"
            and not tp
            and self._axis_size(self.sp_axis) == 1
            and mixer_fused_eligible(spec, partition=True)
        ):
            # Whole mixer (in_proj -> streams -> scan -> merge -> out_proj)
            # in one Pallas kernel; permutations ride the MXU as one-hot
            # matmuls and nothing but x/out touches HBM.
            return mamba_mixer_fused(
                spec, x.astype(cd), in_w, conv_w, conv_b, xp_w, dt_w, dt_b,
                -jnp.exp(A_log.astype(jnp.float32)), D, out_w,
            )

        if tp:
            ntp = self._axis_size(self.tp_axis)
            d_l = d_in // ntp
            assert d_l * ntp == d_in, (d_in, ntp)
            s_idx = jax.lax.axis_index(self.tp_axis)
            off = s_idx * d_l
            sl = lambda w, axis: jax.lax.dynamic_slice_in_dim(w, off, d_l, axis)
            Wu = sl(in_w, 1)
            Wz = jax.lax.dynamic_slice_in_dim(in_w, d_in + off, d_l, 1)
            conv_w, conv_b = sl(conv_w, 0), sl(conv_b, 0)
            xp_w = sl(xp_w, 0)
            dt_w, dt_b = sl(dt_w, 1), sl(dt_b, 0)
            A_log, D, out_w = sl(A_log, 0), sl(D, 0), sl(out_w, 0)
            xc = x.astype(cd)
            u_full = jnp.dot(xc, Wu.astype(cd))
            z_full = jnp.dot(xc, Wz.astype(cd))
            xz = jnp.concatenate([u_full, z_full], axis=-1)
            d_eff = d_l
        else:
            # Fan out to streams BEFORE in_proj: a per-token matmul commutes
            # with the token permutation, and gathering the h-wide input
            # moves 4x less HBM than gathering the 2*d_inner-wide xz.
            fwd = jnp.asarray(np.ascontiguousarray(spec.fwd))  # (S, Ls)
            xg = jnp.take(x.astype(cd), fwd.reshape(-1), axis=1)
            xz = jnp.dot(xg, in_w.astype(cd))
            d_eff = d_in
            xs = xz.reshape(B_ * S, Ls, 2 * d_eff)

        if tp:
            # Fan out into scan streams and fold them into the batch axis.
            fwd = jnp.asarray(np.ascontiguousarray(spec.fwd))  # (S, Ls)
            xs = jnp.take(xz, fwd.reshape(-1), axis=1)
            xs = xs.reshape(B_ * S, Ls, 2 * d_eff)

        A = -jnp.exp(A_log.astype(jnp.float32))
        if self.scan_impl == "fused" and not tp:
            # One Pallas kernel: conv -> projections -> scan -> gate.  (The
            # fused kernel computes x_proj from all of d_inner internally, so
            # it cannot run on a tp shard.)
            y = mamba_inner_fused(xs, conv_w, conv_b, xp_w, dt_w, dt_b, A, D)
        else:
            u, z = jnp.split(xs, 2, axis=-1)
            u = causal_conv1d(u, conv_w, conv_b, activation="silu")
            x_dbl = jnp.dot(u, xp_w.astype(u.dtype))
            if tp:
                # x_proj mixes the whole d_inner axis: psum the partials
                # ((B*S, Ls, r+2n) -- tiny).
                x_dbl = jax.lax.psum(x_dbl, self.tp_axis)
            dt_r, B_ssm, C_ssm = jnp.split(x_dbl, [r, r + n], axis=-1)
            delta = (
                jnp.dot(dt_r.astype(jnp.float32), dt_w.astype(jnp.float32))
                + dt_b.astype(jnp.float32)
            )
            impl = "auto" if (tp and self.scan_impl == "fused") else self.scan_impl
            if tp and sp:
                # Sequence-parallel scan inside the tensor-parallel shard:
                # conv/projections above stay full-length (sp-replicated);
                # each sp shard scans its Ls/nsp slice and exchanges one
                # (G, d, n) composed-map summary (parallel/sequence.py).
                from diffma_tpu.parallel.sequence import (
                    _sel_scan_local, _seq_shard,
                )

                nsp = self._axis_size(self.sp_axis)
                shd = lambda a: _seq_shard(a, self.sp_axis, nsp)  # noqa: E731
                y = _sel_scan_local(
                    shd(u), shd(delta), A, shd(B_ssm), shd(C_ssm), D,
                    shd(z), delta_softplus=True, axis=self.sp_axis,
                )
            elif not tp and self._axis_size(self.sp_axis) > 1:
                from diffma_tpu.parallel.sequence import (
                    selective_scan_sequence_parallel,
                )

                y = selective_scan_sequence_parallel(
                    u, delta, A, B_ssm, C_ssm, D, mesh=self.mesh,
                    axis=self.sp_axis, z=z,
                )
            else:
                y = selective_scan(u, delta, A, B_ssm, C_ssm, D, z=z, impl=impl)

        if tp and sp:
            # Scatter the local scan slice into a zero full-length buffer;
            # the disjoint per-shard contributions are summed by the psum
            # over {tp, sp} fused into the out_proj reduction below.
            from diffma_tpu.parallel.sequence import _seq_unshard

            y = _seq_unshard(y, Ls, self.sp_axis)
            axes = (self.tp_axis, self.sp_axis)
        else:
            axes = self.tp_axis
        psum = (lambda t: jax.lax.psum(t, axes)) if tp else (lambda t: t)
        ow = out_w.astype(cd)

        if spec.mamba1_vim_quirk:
            # Reference Mamba1 'vim' merge bug (block/mamba.py:362-367): the
            # reverse stream is left in reversed token order and its *output
            # features* are flipped before averaging.  flip_D(y @ W) ==
            # y @ flip(W, out_axis), so run out_proj per stream and reverse
            # the second stream's output columns.
            ys = y.reshape(B_, S, Ls, d_eff).astype(cd)
            o = jnp.dot(ys[:, 0], ow) + jnp.dot(ys[:, 1], ow)[..., ::-1]
            return psum(o * spec.scale)

        # Scatter-add merge (pre-out_proj; out_proj has no bias).
        merge = jnp.asarray(np.ascontiguousarray(spec.merge))  # (L, k)
        ys = y.reshape(B_, S * Ls, d_eff)
        merged = jnp.take(ys, merge.reshape(-1), axis=1).reshape(
            B_, L, merge.shape[1], d_eff
        )
        merged = jnp.sum(merged, axis=2) * spec.scale
        return psum(jnp.dot(merged.astype(cd), ow))
