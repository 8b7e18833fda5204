"""Selective scan (Mamba-1 SSM recurrence) for TPU.

Replaces the CUDA ``selective_scan_fn`` / ``mamba_inner_fn`` core imported by
the reference at ``block/mamba.py:11`` and called 13x per mixer forward
(``block/mamba.py:346-401``).  The mathematical spec is the reference's own
pure-PyTorch fallback (``block/mamba.py:435-443``):

    dt_t  = softplus(delta_t + bias)                 # (d,)
    a_t   = exp(dt_t * A)                            # (d, n), A negative
    h_t   = a_t * h_{t-1} + (dt_t * u_t) B_t         # (d, n)
    y_t   = <C_t, h_t> + D * u_t                     # (d,)
    out_t = y_t * silu(z_t)                          # gated output

Three implementations, one signature:

* ``impl="ref"``    -- ``lax.scan`` over time, fp32 carry.  Ground truth and
  the differentiable fallback; used by the CPU test mesh.
* ``impl="assoc"``  -- ``lax.associative_scan`` over the (a, b) affine maps.
  Fully parallel but HBM-heavy (materialises (G, L, d, n)).
* ``impl="pallas"`` -- chunked Pallas TPU kernel with fp32 state held in
  VMEM, a hand-derived backward kernel, and a ``jax.custom_vjp`` wrapper.
  The per-chunk decay/input tensors are built vectorised on the VPU; the
  sequential dependency is reduced to one fused multiply-add per step.

Layout conventions (TPU-first): all activations are time-major-within-batch
``(G, L, d)`` with the model dimension last (128-lane tiling); ``G`` folds
batch x scan-streams.  State tensors inside kernels are ``(n, d)`` so the
d_state axis sits on sublanes and d_inner on lanes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "selective_scan",
    "selective_scan_ref",
    "selective_scan_assoc",
    "selective_state_update",
]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# The backward kernel's scratch (per-chunk a/b/h/g/t buffers + chunk-entry
# checkpoints) can exceed the 16 MB default scoped-VMEM budget at production
# shapes (d_inner=1024, L~200); v5e/v5p have 128 MB VMEM, so grant headroom.
# Grid steps are independent G items (state and scratch are fully re-written
# per step), so "parallel" semantics let Mosaic overlap DMA with compute.
_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel",), vmem_limit_bytes=96 * 1024 * 1024
)



def _contract_precision(dtype) -> lax.Precision:
    """Dtype-faithful MXU precision: fp32 inputs contract in true fp32 (the
    TPU default silently rounds operands to bf16); bf16 keeps the fast path."""
    return (
        lax.Precision.HIGHEST
        if jnp.dtype(dtype) == jnp.float32
        else lax.Precision.DEFAULT
    )

def _silu(x):
    return x * jax.nn.sigmoid(x)


def _dsilu(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


# ---------------------------------------------------------------------------
# Reference implementation (lax.scan)
# ---------------------------------------------------------------------------


def selective_scan_ref(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: jax.Array,
    z: Optional[jax.Array] = None,
    delta_softplus: bool = True,
) -> jax.Array:
    """Sequential ground-truth scan.  Shapes: u/delta/z (G, L, d); A (d, n);
    B/C (G, L, n); D (d,).  Computes in fp32, returns u.dtype."""
    out_dtype = u.dtype
    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    A = A.astype(jnp.float32)
    B = B.astype(jnp.float32)
    C = C.astype(jnp.float32)
    dt = jax.nn.softplus(delta) if delta_softplus else delta
    G, L, d = u.shape
    prec = _contract_precision(out_dtype)

    def step(h, xs):
        dt_t, u_t, B_t, C_t = xs  # (G,d) (G,d) (G,n) (G,n)
        a = jnp.exp(dt_t[..., None] * A)  # (G, d, n)
        h = a * h + (dt_t * u_t)[..., None] * B_t[:, None, :]
        y = jnp.einsum("gdn,gn->gd", h, C_t, precision=prec)
        return h, y

    h0 = jnp.zeros((G, d, A.shape[1]), jnp.float32)
    xs = (
        jnp.moveaxis(dt, 1, 0),
        jnp.moveaxis(u, 1, 0),
        jnp.moveaxis(B, 1, 0),
        jnp.moveaxis(C, 1, 0),
    )
    _, ys = lax.scan(step, h0, xs)
    y = jnp.moveaxis(ys, 0, 1) + u * D.astype(jnp.float32)
    if z is not None:
        y = y * _silu(z.astype(jnp.float32))
    return y.astype(out_dtype)


def selective_state_update(
    ssm_state: jax.Array,  # (G, d, n) fp32 carried state
    x: jax.Array,  # (G, d) post-conv token
    dt: jax.Array,  # (G, d) raw delta (pre-bias)
    A: jax.Array,  # (d, n) negative
    B: jax.Array,  # (G, n)
    C: jax.Array,  # (G, n)
    D: jax.Array,  # (d,)
    z: Optional[jax.Array] = None,  # (G, d) gate
    dt_bias: Optional[jax.Array] = None,  # (d,)
    dt_softplus: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Single-token recurrent update for incremental decode.

    TPU-native equivalent of the Triton ``selective_state_update`` the
    reference imports (block/mamba.py:17) and calls in ``Mamba.step``
    (block/mamba.py:445-447); the math spec is the pure-torch fallback at
    block/mamba.py:435-443.  Returns ``(y, new_state)``; state math in fp32.
    """
    out_dtype = x.dtype
    s = ssm_state.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    if dt_bias is not None:
        dtf = dtf + dt_bias.astype(jnp.float32)
    if dt_softplus:
        dtf = jax.nn.softplus(dtf)
    Af = A.astype(jnp.float32)
    dA = jnp.exp(dtf[..., None] * Af)  # (G, d, n)
    dBx = (dtf * xf)[..., None] * B.astype(jnp.float32)[:, None, :]
    s = dA * s + dBx
    prec = _contract_precision(out_dtype)
    y = jnp.einsum("gdn,gn->gd", s, C.astype(jnp.float32), precision=prec)
    y = y + D.astype(jnp.float32) * xf
    if z is not None:
        y = y * _silu(z.astype(jnp.float32))
    return y.astype(out_dtype), s


# ---------------------------------------------------------------------------
# Parallel associative-scan implementation
# ---------------------------------------------------------------------------


def selective_scan_assoc(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: jax.Array,
    z: Optional[jax.Array] = None,
    delta_softplus: bool = True,
) -> jax.Array:
    """Blelchi-style parallel scan over the affine maps h -> a*h + b."""
    out_dtype = u.dtype
    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    A = A.astype(jnp.float32)
    dt = jax.nn.softplus(delta) if delta_softplus else delta
    a = jnp.exp(dt[..., None] * A)  # (G, L, d, n)
    b = (dt * u)[..., None] * B.astype(jnp.float32)[:, :, None, :]

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, a_r * b_l + b_r

    _, h = lax.associative_scan(combine, (a, b), axis=1)
    prec = _contract_precision(out_dtype)
    y = jnp.einsum("gldn,gln->gld", h, C.astype(jnp.float32), precision=prec)
    y = y + u * D.astype(jnp.float32)
    if z is not None:
        y = y * _silu(z.astype(jnp.float32))
    return y.astype(out_dtype)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


# Chunk length of the sequential kernels.  Must be a multiple of 8 (fp32
# sublane granularity): Mosaic requires statically-aligned second-minor
# slices of VMEM buffers.  Sequences are zero-padded up to a multiple of it;
# padded steps use dt = -20 (=> decay ~ 1, input 0) so the state freezes and
# every padded output/gradient row is exactly zero.
_CHUNK = 16
_PAD_DT = -20.0


def _pad_time(x, Lp):
    L = x.shape[1]
    if L == Lp:
        return x
    return jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0)))


def _fwd_kernel(
    u_ref, dt_ref, B_ref, C_ref, z_ref, AT_ref, D_ref, out_ref,
    dts, abuf, bbuf, hbuf, ybuf, *, L, Q, store_y_only,
):
    """Forward scan for one G item.

    Chunked: the decay/input tensors for a Q-step chunk are built vectorised
    ((Q, n, d) elementwise on the VPU), then the sequential dependency is a
    single fused multiply-add per step; outputs are re-vectorised per chunk.
    """
    n = AT_ref.shape[0]
    nq = L // Q
    AT = AT_ref[...]  # (n, d) fp32

    dts[...] = jax.nn.softplus(dt_ref[0].astype(jnp.float32))

    def chunk_body(c, h):
        s = pl.multiple_of(c * Q, Q)
        dtq = dts[pl.ds(s, Q), :]  # (Q, d)
        uq = u_ref[0, pl.ds(s, Q), :].astype(jnp.float32)
        Bq = B_ref[0, pl.ds(s, Q), :].astype(jnp.float32)  # (Q, n)
        abuf[...] = jnp.exp(dtq[:, None, :] * AT[None])  # (Q, n, d)
        bbuf[...] = Bq[:, :, None] * (dtq * uq)[:, None, :]

        def step(t, h):
            h = abuf[t] * h + bbuf[t]
            hbuf[t] = h
            return h

        h = lax.fori_loop(0, Q, step, h)
        Cq = C_ref[0, pl.ds(s, Q), :].astype(jnp.float32)
        yq = jnp.sum(hbuf[...] * Cq[:, :, None], axis=1)  # (Q, d)
        ybuf[pl.ds(s, Q), :] = yq
        return h

    d = u_ref.shape[2]
    h0 = jnp.zeros((n, d), jnp.float32)
    lax.fori_loop(0, nq, chunk_body, h0)

    u = u_ref[0].astype(jnp.float32)
    y = ybuf[...] + u * D_ref[0][None, :]
    if not store_y_only:
        y = y * _silu(z_ref[0].astype(jnp.float32))
    out_ref[0] = y.astype(out_ref.dtype)


def _selective_scan_pallas_fwd_impl(u, delta, A, B, C, D, z):
    G, L0, d = u.shape
    n = A.shape[1]
    Q = _CHUNK
    L = ((L0 + Q - 1) // Q) * Q
    if L != L0:
        u = _pad_time(u, L)
        delta = jnp.pad(
            delta, ((0, 0), (0, L - L0), (0, 0)), constant_values=_PAD_DT
        )
        B = _pad_time(B, L)
        C = _pad_time(C, L)
        z = _pad_time(z, L) if z is not None else None
    AT = jnp.transpose(A.astype(jnp.float32))  # (n, d)
    D32 = D.astype(jnp.float32)[None, :]  # (1, d)

    kernel = functools.partial(
        _fwd_kernel, L=L, Q=Q, store_y_only=z is None
    )
    grid = (G,)
    row = lambda i: (i, 0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, L, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, n), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, n), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, d), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, L, d), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((L, d), jnp.float32),  # dts
            pltpu.VMEM((Q, n, d), jnp.float32),  # abuf
            pltpu.VMEM((Q, n, d), jnp.float32),  # bbuf
            pltpu.VMEM((Q, n, d), jnp.float32),  # hbuf
            pltpu.VMEM((L, d), jnp.float32),  # ybuf
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(u, delta, B, C, z if z is not None else u, AT, D32)
    return out[:, :L0] if L != L0 else out


def _bwd_kernel(
    # inputs
    u_ref, dt_ref, B_ref, C_ref, z_ref, AT_ref, D_ref, g_ref,
    # outputs
    du_ref, ddelta_ref, dB_ref, dC_ref, dz_ref, dA_ref, dD_ref,
    # scratch
    dts, dy, abuf, bbuf, hbuf, gbuf, tbuf, ckpt, dacc,
    *, L, Q, gated,
):
    """Backward scan for one G item (reverse-mode, chunked recompute).

    Phase 1 re-runs the forward scan storing per-chunk entry states
    (checkpoints) and the pre-gate output y, producing dz / dy / the D-skip
    gradients vectorised.  Phase 2 walks chunks in reverse: rebuilds the
    chunk's (a, b, h) tensors from its checkpoint, runs the two-op adjoint
    recurrence g_t = C_t (x) dy_t + a_{t+1} g_{t+1}, then evaluates every
    remaining gradient contraction vectorised over the chunk.
    """
    n = AT_ref.shape[0]
    d = u_ref.shape[2]
    nq = L // Q
    AT = AT_ref[...]

    dts[...] = jax.nn.softplus(dt_ref[0].astype(jnp.float32))

    # ---- phase 1: forward recompute; y into `dy` temporarily -------------
    def fwd_chunk(c, h):
        s = pl.multiple_of(c * Q, Q)
        ckpt[c] = h
        dtq = dts[pl.ds(s, Q), :]
        uq = u_ref[0, pl.ds(s, Q), :].astype(jnp.float32)
        Bq = B_ref[0, pl.ds(s, Q), :].astype(jnp.float32)
        abuf[...] = jnp.exp(dtq[:, None, :] * AT[None])
        bbuf[...] = Bq[:, :, None] * (dtq * uq)[:, None, :]

        def step(t, h):
            h = abuf[t] * h + bbuf[t]
            hbuf[t] = h
            return h

        h = lax.fori_loop(0, Q, step, h)
        Cq = C_ref[0, pl.ds(s, Q), :].astype(jnp.float32)
        dy[pl.ds(s, Q), :] = jnp.sum(hbuf[...] * Cq[:, :, None], axis=1)
        return h

    h0 = jnp.zeros((n, d), jnp.float32)
    lax.fori_loop(0, nq, fwd_chunk, h0)

    # ---- gating epilogue gradients (fully vectorised) ---------------------
    u = u_ref[0].astype(jnp.float32)
    g_out = g_ref[0].astype(jnp.float32)
    y = dy[...] + u * D_ref[0][None, :]  # pre-gate output
    if gated:
        zv = z_ref[0].astype(jnp.float32)
        dz_ref[0] = (g_out * y * _dsilu(zv)).astype(dz_ref.dtype)
        dyv = g_out * _silu(zv)
    else:
        dz_ref[0] = jnp.zeros((L, d), dz_ref.dtype)
        dyv = g_out
    dy[...] = dyv
    dD_ref[0, 0] = jnp.sum(dyv * u, axis=0)
    # Stage the D-skip contribution in the du output ref; phase 2 adds the
    # recurrence term on top.
    du_ref[0] = (dyv * D_ref[0][None, :]).astype(du_ref.dtype)

    # ---- phase 2: reverse sweep over chunks -------------------------------
    dacc[...] = jnp.zeros_like(dacc)

    def bwd_chunk(i, carry):
        c = nq - 1 - i
        s = pl.multiple_of(c * Q, Q)
        dtq = dts[pl.ds(s, Q), :]
        uq = u_ref[0, pl.ds(s, Q), :].astype(jnp.float32)
        Bq = B_ref[0, pl.ds(s, Q), :].astype(jnp.float32)
        Cq = C_ref[0, pl.ds(s, Q), :].astype(jnp.float32)
        dyq = dy[pl.ds(s, Q), :]
        # Rebuild a, b, h for this chunk from its checkpoint.
        abuf[...] = jnp.exp(dtq[:, None, :] * AT[None])
        tbuf[...] = Bq[:, :, None] * uq[:, None, :]  # du/dB building block
        bbuf[...] = tbuf[...] * dtq[:, None, :]

        def fstep(t, h):
            h = abuf[t] * h + bbuf[t]
            hbuf[t] = h
            return h

        lax.fori_loop(0, Q, fstep, ckpt[c])

        # bbuf's contents (dt*u*B) are no longer needed; reuse it to hold the
        # per-step adjoint sources C_t (x) dy_t so the sequential loop below
        # only ever indexes scratch refs.
        bbuf[...] = Cq[:, :, None] * dyq[:, None, :]

        # Adjoint recurrence: g_t = C_t (x) dy_t + a_{t+1} g_{t+1}.
        def gstep(k, carry):
            t = Q - 1 - k
            g = bbuf[t] + carry
            gbuf[t] = g
            return abuf[t] * g

        carry = lax.fori_loop(0, Q, gstep, carry)

        g_all = gbuf[...]  # (Q, n, d)
        h_all = hbuf[...]
        # h_{t-1}: shift by one, chunk entry state at t=0.
        h_prev = jnp.concatenate([ckpt[c][None], h_all[:-1]], axis=0)

        # dC_t[n] = sum_d dy_t[d] h_t[d, n]
        dC_ref[0, pl.ds(s, Q), :] = jnp.sum(
            h_all * dyq[:, None, :], axis=2
        ).astype(dC_ref.dtype)
        # dB_t[n] = sum_d g_t[n, d] (dt_t u_t)[d]
        dB_ref[0, pl.ds(s, Q), :] = jnp.sum(
            g_all * (dtq * uq)[:, None, :], axis=2
        ).astype(dB_ref.dtype)
        # dA += sum_t g_t h_{t-1} a_t dt_t  (shape (n, d))
        gha = g_all * h_prev * abuf[...]
        dacc[...] += jnp.sum(gha * dtq[:, None, :], axis=0)
        # ddt_t[d] = sum_n g (h_prev a A + u B)   -> then softplus grad
        ddt = jnp.sum(gha * AT[None], axis=1) + jnp.sum(
            g_all * tbuf[...], axis=1
        )
        sig = jax.nn.sigmoid(dt_ref[0, pl.ds(s, Q), :].astype(jnp.float32))
        ddelta_ref[0, pl.ds(s, Q), :] = (ddt * sig).astype(ddelta_ref.dtype)
        # du_t[d] = dy D (staged in phase 1) + sum_n g dt B
        duq = du_ref[0, pl.ds(s, Q), :] + dtq * jnp.sum(
            g_all * Bq[:, :, None], axis=1
        )
        du_ref[0, pl.ds(s, Q), :] = duq.astype(du_ref.dtype)
        return carry

    lax.fori_loop(0, nq, bwd_chunk, jnp.zeros((n, d), jnp.float32))
    dA_ref[0] = dacc[...]


def _selective_scan_pallas_bwd_impl(u, delta, A, B, C, D, z, g_out):
    G, L0, d = u.shape
    n = A.shape[1]
    Q = _CHUNK
    L = ((L0 + Q - 1) // Q) * Q
    if L != L0:
        u = _pad_time(u, L)
        delta = jnp.pad(
            delta, ((0, 0), (0, L - L0), (0, 0)), constant_values=_PAD_DT
        )
        B = _pad_time(B, L)
        C = _pad_time(C, L)
        z = _pad_time(z, L) if z is not None else None
        g_out = _pad_time(g_out, L)
    nq = L // Q
    AT = jnp.transpose(A.astype(jnp.float32))
    D32 = D.astype(jnp.float32)[None, :]
    gated = z is not None

    kernel = functools.partial(_bwd_kernel, L=L, Q=Q, gated=gated)
    row = lambda i: (i, 0, 0)  # noqa: E731
    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, L, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, n), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, n), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, d), row, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, L, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, n), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, n), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, L, d), jnp.float32),  # du
            jax.ShapeDtypeStruct((G, L, d), jnp.float32),  # ddelta
            jax.ShapeDtypeStruct((G, L, n), jnp.float32),  # dB
            jax.ShapeDtypeStruct((G, L, n), jnp.float32),  # dC
            jax.ShapeDtypeStruct((G, L, d), jnp.float32),  # dz
            jax.ShapeDtypeStruct((G, n, d), jnp.float32),  # dA partials
            jax.ShapeDtypeStruct((G, 1, d), jnp.float32),  # dD partials
        ],
        scratch_shapes=[
            pltpu.VMEM((L, d), jnp.float32),  # dts
            pltpu.VMEM((L, d), jnp.float32),  # dy / y
            pltpu.VMEM((Q, n, d), jnp.float32),  # abuf
            pltpu.VMEM((Q, n, d), jnp.float32),  # bbuf
            pltpu.VMEM((Q, n, d), jnp.float32),  # hbuf
            pltpu.VMEM((Q, n, d), jnp.float32),  # gbuf
            pltpu.VMEM((Q, n, d), jnp.float32),  # tbuf (u x B)
            pltpu.VMEM((nq, n, d), jnp.float32),  # checkpoints
            pltpu.VMEM((n, d), jnp.float32),  # dA accumulator
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(u, delta, B, C, z if gated else u, AT, D32, g_out)
    du, ddelta, dB, dC, dz, dA_p, dD_p = outs
    if L != L0:
        du, ddelta, dB, dC, dz = (
            t[:, :L0] for t in (du, ddelta, dB, dC, dz)
        )
    dA = jnp.transpose(jnp.sum(dA_p, axis=0))  # (d, n)
    dD = jnp.sum(dD_p, axis=(0, 1))  # (d,)
    return du, ddelta, dA, dB, dC, dD, (dz if gated else None)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _selective_scan_pallas(u, delta, A, B, C, D, z):
    return _selective_scan_pallas_fwd_impl(u, delta, A, B, C, D, z)


def _pallas_fwd(u, delta, A, B, C, D, z):
    out = _selective_scan_pallas_fwd_impl(u, delta, A, B, C, D, z)
    return out, (u, delta, A, B, C, D, z)


def _pallas_bwd(res, g_out):
    u, delta, A, B, C, D, z = res
    du, ddelta, dA, dB, dC, dD, dz = _selective_scan_pallas_bwd_impl(
        u, delta, A, B, C, D, z, g_out
    )
    return (
        du.astype(u.dtype),
        ddelta.astype(delta.dtype),
        dA.astype(A.dtype),
        dB.astype(B.dtype),
        dC.astype(C.dtype),
        dD.astype(D.dtype),
        dz.astype(z.dtype) if z is not None else None,
    )


_selective_scan_pallas.defvjp(_pallas_fwd, _pallas_bwd)


# ---------------------------------------------------------------------------
# Dispatcher
# ---------------------------------------------------------------------------


def selective_scan(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: jax.Array,
    z: Optional[jax.Array] = None,
    delta_softplus: bool = True,
    impl: str = "auto",
) -> jax.Array:
    """Selective scan with pluggable implementation.

    ``impl='auto'`` picks the Pallas kernel on TPU (fp32 state in VMEM) and
    the associative scan elsewhere.  ``delta`` must already include the dt
    bias; softplus is fused into the kernels.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "assoc"
    if impl == "ref":
        return selective_scan_ref(u, delta, A, B, C, D, z, delta_softplus)
    if impl == "assoc":
        return selective_scan_assoc(u, delta, A, B, C, D, z, delta_softplus)
    if impl == "pallas":
        if not delta_softplus:
            raise NotImplementedError("pallas path fuses softplus; pass raw dt")
        return _selective_scan_pallas(u, delta, A, B, C, D, z)
    raise ValueError(f"unknown impl: {impl!r}")
