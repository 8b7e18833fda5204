"""Fused Mamba-1 inner function for inference (one Pallas kernel).

The reference's CUDA ``mamba_inner_fn`` (block/mamba.py:11,346-401) fuses the
whole mixer inner: causal conv1d -> x_proj -> dt_proj -> selective scan ->
silu gate.  The training path here keeps those stages as separate XLA ops
(fusion-friendly, differentiable, the Pallas scan carries a hand-derived
VJP); this module adds the *inference* equivalent: everything between the
in-projection gather and the out-projection runs in one Pallas kernel, so
the (G, L, d_inner) activations never round-trip HBM between stages.

Differentiation falls back to the composable path via ``jax.custom_vjp``
(recompute-style), so the fused op is safe to call anywhere; the sampler is
where it pays.

Layouts: xz (G, L, 2*d) with d on lanes; weights transposed so every matmul
is (L, K) x (K, M) on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffma_tpu.ops.conv import causal_conv1d
from diffma_tpu.ops.selective_scan import (
    _CHUNK,
    _COMPILER_PARAMS,
    _interpret,
    _pad_time,
    _silu,
    selective_scan,
)

__all__ = ["mamba_inner_fused"]


def _fused_kernel(
    xz_ref, convw_ref, convb_ref, xpw_ref, dtw_ref, dtb_ref, AT_ref, D_ref,
    out_ref, ubuf, dts, Bbuf, Cbuf, abuf, bbuf, hbuf, ybuf, *, L, Q, d, r, n,
):
    """One G item: conv -> projections -> chunked scan -> gate."""
    nq = L // Q
    xz = xz_ref[0]  # (L, 2d)
    u0 = xz[:, :d].astype(jnp.float32)
    K = convw_ref.shape[0]  # (K, d)

    # Causal depthwise conv (kernel K, zero left-pad) as K shifted adds.
    acc = u0 * convw_ref[K - 1][None, :]
    for k in range(K - 1):
        sh = K - 1 - k  # how far back in time tap k reaches
        shifted = jnp.concatenate(
            [jnp.zeros((sh, d), jnp.float32), u0[: L - sh]], axis=0
        )
        acc = acc + shifted * convw_ref[k][None, :]
    u = _silu(acc + convb_ref[0][None, :])  # (L, d) fp32
    ubuf[...] = u

    # x_proj -> (dt_r, B, C); dt_proj -> delta.  MXU matmuls.
    xdb = jnp.dot(
        u.astype(xz.dtype), xpw_ref[...].astype(xz.dtype),
        preferred_element_type=jnp.float32,
    )  # (L, r + 2n)
    delta = (
        jnp.dot(
            xdb[:, :r].astype(xz.dtype), dtw_ref[...].astype(xz.dtype),
            preferred_element_type=jnp.float32,
        )
        + dtb_ref[0][None, :]
    )
    dts[...] = jax.nn.softplus(delta)
    Bbuf[...] = xdb[:, r : r + n]  # (L, n) fp32
    Cbuf[...] = xdb[:, r + n :]

    AT = AT_ref[...]  # (n, d)

    def chunk_body(c, h):
        s = pl.multiple_of(c * Q, Q)
        dtq = dts[pl.ds(s, Q), :]
        uq = ubuf[pl.ds(s, Q), :]
        Bq = Bbuf[pl.ds(s, Q), :]
        abuf[...] = jnp.exp(dtq[:, None, :] * AT[None])
        bbuf[...] = Bq[:, :, None] * (dtq * uq)[:, None, :]

        def step(t, h):
            h = abuf[t] * h + bbuf[t]
            hbuf[t] = h
            return h

        h = lax.fori_loop(0, Q, step, h)
        Cq = Cbuf[pl.ds(s, Q), :]
        ybuf[pl.ds(s, Q), :] = jnp.sum(hbuf[...] * Cq[:, :, None], axis=1)
        return h

    lax.fori_loop(0, nq, chunk_body, jnp.zeros((n, d), jnp.float32))

    y = ybuf[...] + ubuf[...] * D_ref[0][None, :]
    z = xz[:, d:].astype(jnp.float32)
    out_ref[0] = (y * _silu(z)).astype(out_ref.dtype)


def _fused_ref(xz, conv_w, conv_b, xp_w, dt_w, dt_b, A, D):
    """Composable-path reference: exactly the unfused mixer inner."""
    d = xz.shape[-1] // 2
    u, z = xz[..., :d], xz[..., d:]
    u = causal_conv1d(u, conv_w, conv_b, activation="silu")
    xdb = jnp.dot(u, xp_w.astype(u.dtype))
    r = dt_w.shape[0]
    n = (xdb.shape[-1] - r) // 2
    delta = (
        jnp.dot(xdb[..., :r].astype(jnp.float32), dt_w.astype(jnp.float32))
        + dt_b.astype(jnp.float32)
    )
    return selective_scan(
        u, delta, A, xdb[..., r : r + n], xdb[..., r + n :], D, z=z,
        impl="pallas" if jax.default_backend() == "tpu" else "ref",
    )


def _fused_fwd_impl(xz, conv_w, conv_b, xp_w, dt_w, dt_b, A, D):
    G, L0, dd = xz.shape
    d = dd // 2
    n = A.shape[1]
    r = dt_w.shape[0]
    Q = _CHUNK
    L = ((L0 + Q - 1) // Q) * Q
    xz = _pad_time(xz, L)  # zero pad => conv taps see zeros, dt -> softplus(dt_b)
    # Padded tail is sliced off below; its state drift is irrelevant because
    # the scan is causal (pads sit at the end).
    AT = jnp.transpose(A.astype(jnp.float32))
    out = pl.pallas_call(
        functools.partial(_fused_kernel, L=L, Q=Q, d=d, r=r, n=n),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, L, 2 * d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((conv_w.shape[1], d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, r + 2 * n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, L, d), xz.dtype),
        scratch_shapes=[
            pltpu.VMEM((L, d), jnp.float32),  # ubuf
            pltpu.VMEM((L, d), jnp.float32),  # dts
            pltpu.VMEM((L, n), jnp.float32),  # Bbuf
            pltpu.VMEM((L, n), jnp.float32),  # Cbuf
            pltpu.VMEM((Q, n, d), jnp.float32),  # abuf
            pltpu.VMEM((Q, n, d), jnp.float32),  # bbuf
            pltpu.VMEM((Q, n, d), jnp.float32),  # hbuf
            pltpu.VMEM((L, d), jnp.float32),  # ybuf
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(
        xz,
        jnp.transpose(conv_w.astype(jnp.float32)),  # (K, d)
        conv_b.astype(jnp.float32)[None, :],
        xp_w.astype(jnp.float32),
        dt_w.astype(jnp.float32),
        dt_b.astype(jnp.float32)[None, :],
        AT,
        D.astype(jnp.float32)[None, :],
    )
    return out[:, :L0]


@jax.custom_vjp
def mamba_inner_fused(xz, conv_w, conv_b, xp_w, dt_w, dt_b, A, D):
    """Fused mixer inner: ``xz (G, L, 2d) -> gated scan output (G, L, d)``.

    Weight layouts (all "input-major", matching the Flax params): conv_w
    (d, K), xp_w (d, r+2n), dt_w (r, d), dt_b (d,), A (d, n), D (d,).
    """
    return _fused_fwd_impl(xz, conv_w, conv_b, xp_w, dt_w, dt_b, A, D)


def _vjp_fwd(*args):
    return _fused_fwd_impl(*args), args


def _vjp_bwd(res, g):
    # Recompute through the composable (differentiable) path.
    out, vjp = jax.vjp(_fused_ref, *res)
    return vjp(g.astype(out.dtype))


mamba_inner_fused.defvjp(_vjp_fwd, _vjp_bwd)
