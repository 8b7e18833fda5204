"""Whole-mixer fused kernel: in_proj -> streams -> scan -> merge -> out_proj.

The round-1 inference kernel (ops/fused_mamba.py) fused conv->proj->scan->
gate but still materialised the fanned-out (B*S, L, 2*d_inner) streams and
the merged activations in HBM -- ~130 MB of traffic per mixer call at
DiffMa-B/2 shapes, which profiling shows is where the sampler's non-scan
third goes.  This kernel moves the *entire* mixer between the block's
layernorm and residual into one Pallas call:

    x (B, L, h) --in_proj--> xz --P_s--> stream s --conv/x_proj/dt_proj/
    scan/gate--> y_s --P_s^T-->  merged --out_proj--> (B, L, h)

with the key TPU idea that a static token permutation is a one-hot matmul:
``xs = P_s @ xz`` and the inverse-permute merge is ``P_s^T @ y_s``, so the
MXU performs the data movement while everything stays resident in VMEM.
Per grid item (one batch element) HBM traffic is x in + out + (once per
launch) the weights: ~10 MB per mixer call instead of ~130 MB.

Replaces the reference dataflow at block/mamba.py:333-401 (in_proj ->
CrossScan -> 3x mamba_inner_fn -> CrossMerge -> out_proj inside
mamba_inner_fn) one level higher than the CUDA kernels could: upstream
launches 3-4 sequential fused kernels plus separate permutation kernels.

Eligible specs: full-length permutation streams -- spiral / zigma / vim /
vmamba -- plus exact disjoint partitions (EfficientVMamba's quarter-length
atrous streams).  The Mamba1 'vim' feature-flip quirk runs in-kernel
(per-stream out_proj with a column-flipped W for the reverse stream).

Differentiation (``jax.custom_vjp``) is a second monolithic Pallas kernel
(``_mixer_bwd_kernel``): per batch element it recomputes the forward in
VMEM and emits the input gradient plus every weight gradient, accumulated
across the sequential grid -- no intermediate ever reaches HBM.  The 'vim'
quirk runs in the same kernel (the reverse stream's gradient arrives
feature-flipped as an extra input, no row permute).  The round-2
decomposed backward (manual out_proj/merge adjoints over a saved
``merged`` residual + the standalone Pallas scan backward + autodiff over
the scan-free pre-scan segment) stays reachable everywhere via
``DIFFMA_MIXER_BWD=decomposed`` for A/B probes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffma_tpu.ops.conv import causal_conv1d
from diffma_tpu.ops.scan_orders import ScanSpec
from diffma_tpu.ops.selective_scan import (
    _CHUNK,
    _COMPILER_PARAMS,
    _dsilu,
    _interpret,
    _selective_scan_pallas_bwd_impl,
    _silu,
    selective_scan,
)

__all__ = ["mamba_mixer_fused", "mamba_dual_mixer_fused", "mixer_fused_eligible"]


def _exact_partition(spec: ScanSpec) -> bool:
    """Streams jointly cover every token exactly once (atrous partition)."""
    return sorted(spec.fwd.reshape(-1).tolist()) == list(range(spec.seq_len))


def mixer_fused_eligible(spec: ScanSpec, partition: bool = False) -> bool:
    """Full-length permutation streams (spiral / zigma / vim / vmamba)
    always qualify; with ``partition`` (Mamba1 kernel) exact disjoint
    partitions (EfficientVMamba's quarter-length atrous streams) do too.
    The Mamba1 'vim' feature-flip quirk is handled inside the kernels."""
    if spec.fwd.shape[1] == spec.seq_len:
        return True
    return partition and _exact_partition(spec)


@functools.lru_cache(maxsize=None)
def _identity_streams(spec: ScanSpec) -> tuple:
    Ls = spec.fwd.shape[1]
    if Ls != spec.seq_len:
        return (False,) * spec.fwd.shape[0]
    return tuple(bool((spec.fwd[s] == np.arange(Ls)).all()) for s in range(spec.fwd.shape[0]))


@functools.lru_cache(maxsize=None)
def _perm_matrices(spec: ScanSpec, Lp: int, Lr: int = 0):
    """(S, Lr, Lp) one-hot stream-permutation matrices, zero on pad rows.
    ``Lr`` is the padded per-stream row count (== Lp for full-length
    streams, the padded stream length for partition streams)."""
    S, Ls = spec.fwd.shape
    Lr = Lr or Lp
    P = np.zeros((S, Lr, Lp), np.float32)
    for s in range(S):
        P[s, np.arange(Ls), spec.fwd[s]] = 1.0
    return P


def _mixer_kernel(
    x_ref, inw_ref, convw_ref, convb_ref, xpw_ref, dtw_ref, dtb_ref,
    AT_ref, D_ref, outw_ref, P_ref,
    out_ref, *rest,
    L, Q, d, r, n, S, scale, ident, Lr=None, want_merged=False, quirk=False,
):
    """One batch element: the whole mixer with S unrolled streams.

    Weight refs are 2-D for the single-mixer entry point and 3-D with a
    leading block dim of 1 for the dual (stacked-weights) entry point.
    With ``want_merged`` a second output ref receives the pre-out_proj
    merged activations (saved as a VJP residual)."""
    if want_merged:
        merged_ref, *rest = rest
    else:
        merged_ref = None
    (xzbuf, ubuf, dts, Bbuf, Cbuf, abuf, bbuf, ybuf, accbuf) = rest

    def _w(ref):
        return ref[0] if ref.ndim == 3 else ref[...]

    Lr = L if Lr is None else Lr  # per-stream row count (partition: Ls pad)
    nq = Lr // Q
    cd = x_ref.dtype
    prec = (
        lax.Precision.HIGHEST if cd == jnp.float32 else lax.Precision.DEFAULT
    )
    inw, convw, convb = _w(inw_ref), _w(convw_ref), _w(convb_ref)
    xpw, dtw, dtb = _w(xpw_ref), _w(dtw_ref), _w(dtb_ref)
    Dw, outw = _w(D_ref), _w(outw_ref)
    x = x_ref[0]  # (L, h)
    xzbuf[...] = jnp.dot(
        x, inw.astype(cd), preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(cd)
    accbuf[...] = jnp.zeros_like(accbuf)
    K = convw.shape[0]
    AT = _w(AT_ref)  # (n, d)

    for s in range(S):
        Ps = P_ref[s]  # (L, L) fp32 one-hot
        if ident[s]:
            # identity stream (e.g. spiral stream 0): no permute needed;
            # pad rows only pollute output rows >= L0, which are sliced off.
            xs = xzbuf[...]
        else:
            xs = jnp.dot(
                Ps.astype(cd), xzbuf[...], preferred_element_type=jnp.float32,
                precision=prec,
            ).astype(cd)  # (L, 2d)
        u0 = xs[:, :d].astype(jnp.float32)

        # causal depthwise conv, K taps, zero left-pad
        acc = u0 * convw[K - 1][None, :]
        for k in range(K - 1):
            sh = K - 1 - k
            shifted = jnp.concatenate(
                [jnp.zeros((sh, d), jnp.float32), u0[: Lr - sh]], axis=0
            )
            acc = acc + shifted * convw[k][None, :]
        u = _silu(acc + convb[0][None, :])  # (Lr, d) fp32
        ubuf[...] = u

        xdb = jnp.dot(
            u.astype(cd), xpw.astype(cd),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (L, r + 2n) fp32
        delta = (
            jnp.dot(
                xdb[:, :r].astype(cd), dtw.astype(cd),
                preferred_element_type=jnp.float32, precision=prec,
            )
            + dtb[0][None, :]
        )
        dts[...] = jax.nn.softplus(delta)
        Bbuf[...] = xdb[:, r : r + n]
        Cbuf[...] = xdb[:, r + n :]

        abuf[...] = jnp.exp(dts[...][:, None, :] * AT[None])
        bbuf[...] = (
            Bbuf[...][:, :, None] * (dts[...] * ubuf[...])[:, None, :]
        )

        # The recurrence runs in 8-step register blocks: h values never
        # round-trip scratch (a per-step (n, d) store was measured to cost
        # as much as the rest of the kernel combined); the C contraction
        # vectorises over each block's stacked register states.
        T = 8
        assert Lr % T == 0

        def block_body(c, h):
            off = pl.multiple_of(c * T, T)
            a8 = abuf[pl.ds(off, T)]  # (T, n, d)
            b8 = bbuf[pl.ds(off, T)]
            hs = []
            for j in range(T):
                h = a8[j] * h + b8[j]
                hs.append(h)
            h8 = jnp.stack(hs)  # (T, n, d) register values
            C8 = Cbuf[pl.ds(off, T), :]  # (T, n)
            ybuf[pl.ds(off, T), :] = jnp.sum(h8 * C8[:, :, None], axis=1)
            return h

        lax.fori_loop(0, Lr // T, block_body, jnp.zeros((n, d), jnp.float32))

        y = ybuf[...] + ubuf[...] * Dw[0][None, :]
        z = xs[:, d:].astype(jnp.float32)
        yg = y * _silu(z)  # (L, d) fp32

        if quirk:
            # Reference Mamba1 'vim' merge bug (block/mamba.py:362-367):
            # streams stay in their own token order, out_proj runs per
            # stream, and the reverse stream's OUTPUT features are flipped
            # before averaging.  flip_h(y @ W) == y @ flip(W, out_axis).
            if merged_ref is not None:
                merged_ref[0, s * L : (s + 1) * L] = yg.astype(cd)
            h_out = outw.shape[-1]
            # quirk mode receives out_w stacked as [W, flip_h(W)] (Mosaic
            # has no rev lowering); stream 1 uses the flipped variant.
            w_s = outw if s == 0 else outw_ref[1]
            accbuf[:, :h_out] += jnp.dot(
                yg.astype(cd), w_s.astype(cd),
                preferred_element_type=jnp.float32, precision=prec,
            )
        # inverse-permute merge on the MXU: acc += P_s^T @ y_s.  Dtype-
        # faithful precision: the composable path merges in the model dtype,
        # so rounding yg through bf16 here matches it; fp32 models take the
        # multi-pass exact path.
        elif ident[s]:
            accbuf[...] += yg
        else:
            accbuf[...] += lax.dot_general(
                Ps.astype(cd), yg.astype(cd), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )

    if quirk:
        h_out = outw.shape[-1]
        out_ref[0] = (accbuf[:, :h_out] * scale).astype(out_ref.dtype)
        return
    merged = (accbuf[...] * scale).astype(cd)
    if merged_ref is not None:
        merged_ref[0] = merged
    out_ref[0] = jnp.dot(
        merged, outw.astype(cd), preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(out_ref.dtype)


def _fwd_impl(spec, x, in_w, conv_w, conv_b, xp_w, dt_w, dt_b, A, D, out_w,
              want_merged=False):
    B_, L0, h = x.shape
    d = A.shape[0]
    n = A.shape[1]
    r = dt_w.shape[0]
    S, Ls = spec.fwd.shape
    L = ((L0 + 7) // 8) * 8  # sublane-aligned whole sequence
    Lr = ((Ls + 7) // 8) * 8  # per-stream rows (== L unless partition spec)
    Q = Lr  # single chunk
    if L != L0:
        x = jnp.pad(x, ((0, 0), (0, L - L0), (0, 0)))
    P = jnp.asarray(_perm_matrices(spec, L, Lr))
    AT = jnp.transpose(A.astype(jnp.float32))

    ident = _identity_streams(spec)
    quirk = bool(spec.mamba1_vim_quirk)
    if quirk:
        assert d >= h, "quirk out-accumulator reuses the (L, d) buffer"
    kernel = functools.partial(
        _mixer_kernel, L=L, Q=Q, d=d, r=r, n=n, S=S, scale=float(spec.scale),
        ident=ident, Lr=Lr, want_merged=want_merged, quirk=quirk,
    )
    row3 = lambda i: (i, 0, 0)  # noqa: E731
    mrows = S * L if quirk else L
    ospec = pl.BlockSpec((1, L, h), row3, memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, mrows, d), row3, memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((B_, L, h), x.dtype)
    mshape = jax.ShapeDtypeStruct((B_, mrows, d), x.dtype)
    const = lambda i: tuple(0 for _ in range(2))  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(B_,),
        in_specs=[
            pl.BlockSpec((1, L, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 2 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((conv_w.shape[1], d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, r + 2 * n), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((r, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            (
                pl.BlockSpec((2, d, h), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
                if quirk
                else pl.BlockSpec((d, h), const, memory_space=pltpu.VMEM)
            ),
            pl.BlockSpec((S, Lr, L), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[ospec, mspec] if want_merged else ospec,
        out_shape=[oshape, mshape] if want_merged else oshape,
        scratch_shapes=[
            pltpu.VMEM((L, 2 * d), x.dtype),  # xzbuf
            pltpu.VMEM((Lr, d), jnp.float32),  # ubuf
            pltpu.VMEM((Lr, d), jnp.float32),  # dts
            pltpu.VMEM((Lr, n), jnp.float32),  # Bbuf
            pltpu.VMEM((Lr, n), jnp.float32),  # Cbuf
            pltpu.VMEM((Q, n, d), jnp.float32),  # abuf
            pltpu.VMEM((Q, n, d), jnp.float32),  # bbuf
            pltpu.VMEM((Lr, d), jnp.float32),  # ybuf
            pltpu.VMEM((L, d), jnp.float32),  # accbuf
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(
        # matmul weights + one-hot P pre-cast to the compute dtype: the
        # kernel casts them before every dot anyway, and a bf16 fetch
        # halves the dominant per-grid-step weight streaming
        x,
        in_w.astype(x.dtype),
        jnp.transpose(conv_w.astype(jnp.float32)),  # (K, d)
        conv_b.astype(jnp.float32)[None, :],
        xp_w.astype(x.dtype),
        dt_w.astype(x.dtype),
        dt_b.astype(jnp.float32)[None, :],
        AT,
        D.astype(jnp.float32)[None, :],
        (jnp.stack([out_w, out_w[:, ::-1]]) if quirk else out_w).astype(x.dtype),
        P.astype(x.dtype),
    )
    if want_merged:
        out, merged = out
        if L != L0:
            out = out[:, :L0]
            merged = (
                merged.reshape(B_, S, L, d)[:, :, :L0].reshape(B_, S * L0, d)
                if quirk
                else merged[:, :L0]
            )
        return out, merged
    return out[:, :L0] if L != L0 else out


def _mixer_ref(spec, x, in_w, conv_w, conv_b, xp_w, dt_w, dt_b, A, D, out_w):
    """Composable-path reference (differentiable); the bwd recompute target.
    Mirrors Mamba._forward's non-fused math exactly."""
    B_, L, _ = x.shape
    cd = x.dtype
    d = A.shape[0]
    n = A.shape[1]
    r = dt_w.shape[0]
    S, Ls = spec.fwd.shape

    xz = jnp.dot(x, in_w.astype(cd))
    fwd = jnp.asarray(np.ascontiguousarray(spec.fwd))
    xs = jnp.take(xz, fwd.reshape(-1), axis=1).reshape(B_ * S, Ls, 2 * d)
    u, z = jnp.split(xs, 2, axis=-1)
    u = causal_conv1d(u, conv_w, conv_b, activation="silu")
    x_dbl = jnp.dot(u, xp_w.astype(u.dtype))
    dt_r, B_ssm, C_ssm = jnp.split(x_dbl, [r, r + n], axis=-1)
    delta = (
        jnp.dot(dt_r.astype(jnp.float32), dt_w.astype(jnp.float32))
        + dt_b.astype(jnp.float32)
    )
    y = selective_scan(
        u, delta, A, B_ssm, C_ssm, D, z=z,
        impl="pallas" if jax.default_backend() == "tpu" else "ref",
    )
    if spec.mamba1_vim_quirk:
        ys = y.reshape(B_, S, Ls, d).astype(cd)
        ow = out_w.astype(cd)
        o = jnp.dot(ys[:, 0], ow) + jnp.dot(ys[:, 1], ow)[..., ::-1]
        return o * spec.scale
    merge = jnp.asarray(np.ascontiguousarray(spec.merge))
    ys = y.reshape(B_, S * Ls, d)
    merged = jnp.take(ys, merge.reshape(-1), axis=1).reshape(
        B_, L, merge.shape[1], d
    )
    merged = jnp.sum(merged, axis=2) * spec.scale
    return jnp.dot(merged.astype(cd), out_w.astype(cd))


def _dual_fwd_impl(spec, x12, *stacked, want_merged=False):
    """Both mixers of a dual-branch block in ONE launch: grid (2*B,), the
    first B items use weight set 0, the rest set 1 (halves launch count for
    the Spiral block, block/mamba_block.py:107-108)."""
    assert not spec.mamba1_vim_quirk  # dual-branch blocks use spiral specs
    M, B_, L0, h = x12.shape
    d = stacked[6].shape[1]  # A (M, d, n)
    n = stacked[6].shape[2]
    r = stacked[4].shape[1]  # dt_w (M, r, d)
    S = spec.fwd.shape[0]
    Q = ((L0 + 7) // 8) * 8
    L = Q
    x = x12.reshape(M * B_, L0, h)
    if L != L0:
        x = jnp.pad(x, ((0, 0), (0, L - L0), (0, 0)))
    P = jnp.asarray(_perm_matrices(spec, L))
    (in_w, conv_w, conv_b, xp_w, dt_w, dt_b, A, D, out_w) = stacked
    AT = jnp.transpose(A.astype(jnp.float32), (0, 2, 1))  # (M, n, d)

    ident = _identity_streams(spec)
    kernel = functools.partial(
        _mixer_kernel, L=L, Q=Q, d=d, r=r, n=n, S=S, scale=float(spec.scale),
        ident=ident, want_merged=want_merged,
    )
    K = conv_w.shape[2]
    m_of = lambda i: i // B_  # noqa: E731
    row3 = lambda i: (i, 0, 0)  # noqa: E731
    ospec = pl.BlockSpec((1, L, h), row3, memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, L, d), row3, memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((M * B_, L, h), x.dtype)
    mshape = jax.ShapeDtypeStruct((M * B_, L, d), x.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(M * B_,),
        in_specs=[
            pl.BlockSpec((1, L, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, 2 * d), lambda i: (m_of(i), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, d), lambda i: (m_of(i), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (m_of(i), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, r + 2 * n), lambda i: (m_of(i), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, d), lambda i: (m_of(i), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (m_of(i), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i: (m_of(i), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (m_of(i), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, h), lambda i: (m_of(i), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, L, L), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[ospec, mspec] if want_merged else ospec,
        out_shape=[oshape, mshape] if want_merged else oshape,
        scratch_shapes=[
            pltpu.VMEM((L, 2 * d), x.dtype),
            pltpu.VMEM((L, d), jnp.float32),
            pltpu.VMEM((L, d), jnp.float32),
            pltpu.VMEM((L, n), jnp.float32),
            pltpu.VMEM((L, n), jnp.float32),
            pltpu.VMEM((Q, n, d), jnp.float32),
            pltpu.VMEM((Q, n, d), jnp.float32),
            pltpu.VMEM((L, d), jnp.float32),
            pltpu.VMEM((L, d), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(
        # weights + P pre-cast to compute dtype (see single-mixer launcher)
        x,
        in_w.astype(x.dtype),
        jnp.transpose(conv_w.astype(jnp.float32), (0, 2, 1)),  # (M, K, d)
        conv_b.astype(jnp.float32)[:, None, :],
        xp_w.astype(x.dtype),
        dt_w.astype(x.dtype),
        dt_b.astype(jnp.float32)[:, None, :],
        AT,
        D.astype(jnp.float32)[:, None, :],
        out_w.astype(x.dtype),
        P.astype(x.dtype),
    )
    if want_merged:
        out, merged = out
        out = out[:, :L0] if L != L0 else out
        merged = merged[:, :L0] if L != L0 else merged
        return out.reshape(M, B_, L0, h), merged.reshape(M, B_, L0, d)
    out = out[:, :L0] if L != L0 else out
    return out.reshape(M, B_, L0, h)


def _pre_scan(spec, x, in_w, conv_w, conv_b, xp_w, dt_w, dt_b):
    """Pre-scan segment of the composable path (matmuls + conv only; no
    sequential recurrence), used by the decomposed backward."""
    B_, L, _ = x.shape
    cd = x.dtype
    r = dt_w.shape[0]
    n = (xp_w.shape[1] - r) // 2
    S, Ls = spec.fwd.shape
    xz = jnp.dot(x, in_w.astype(cd))
    fwd = jnp.asarray(np.ascontiguousarray(spec.fwd))
    xs = jnp.take(xz, fwd.reshape(-1), axis=1).reshape(B_ * S, Ls, -1)
    u0, z = jnp.split(xs, 2, axis=-1)
    u = causal_conv1d(u0, conv_w, conv_b, activation="silu")
    x_dbl = jnp.dot(u, xp_w.astype(u.dtype))
    dt_r, B_ssm, C_ssm = jnp.split(x_dbl, [r, r + n], axis=-1)
    delta = (
        jnp.dot(dt_r.astype(jnp.float32), dt_w.astype(jnp.float32))
        + dt_b.astype(jnp.float32)
    )
    return u, delta, B_ssm, C_ssm, z


def _manual_bwd(
    spec, x, in_w, conv_w, conv_b, xp_w, dt_w, dt_b, A, D, out_w, merged, g
):
    """Decomposed backward for the fused mixer: manual out_proj/merge
    adjoints (``merged`` saved by the fused forward), the hand-written
    Pallas scan backward, and ``jax.vjp`` over the scan-free pre-scan
    segment.  The sequential scan forward therefore runs exactly as often
    as on the composable path (once, inside the scan backward's chunked
    recompute) while the primal keeps the fused kernel's HBM savings."""
    cd = x.dtype
    B_, L0, _ = x.shape
    S = spec.fwd.shape[0]
    g = g.astype(cd)
    if spec.mamba1_vim_quirk:
        # ``merged`` holds the per-stream gated scan outputs (B, S*L0, d);
        # out = (y0 @ W + flip_h(y1 @ W)) * scale, streams in stream order.
        d = merged.shape[-1]
        gs = (g * spec.scale).astype(cd)
        gf = gs[..., ::-1]
        ys = merged.reshape(B_, S, L0, d).astype(cd)
        g_out_w = (
            jnp.tensordot(ys[:, 0], gs, axes=((0, 1), (0, 1)))
            + jnp.tensordot(ys[:, 1], gf, axes=((0, 1), (0, 1)))
        ).astype(out_w.dtype)
        ow = out_w.astype(cd)
        g_y = jnp.stack(
            [
                jnp.einsum("blh,dh->bld", gs, ow),
                jnp.einsum("blh,dh->bld", gf, ow),
            ],
            axis=1,
        ).reshape(B_ * S, L0, d)
    else:
        g_out_w = jnp.tensordot(
            merged.astype(cd), g, axes=((0, 1), (0, 1))
        ).astype(out_w.dtype)  # (d, h)
        g_merged = jnp.einsum("blh,dh->bld", g, out_w.astype(cd))
        # Merge adjoint: each stream holds every token exactly once
        # (eligible specs are full-length permutations), so the adjoint of
        # merged = sum_s P_s^T y_s * scale is the forward fanout gather.
        fwd_idx = jnp.asarray(np.ascontiguousarray(spec.fwd))
        Ls = spec.fwd.shape[1]
        g_y = (
            jnp.take(g_merged, fwd_idx.reshape(-1), axis=1).reshape(
                B_ * S, Ls, -1
            )
            * spec.scale
        ).astype(cd)

    (u, delta, B_ssm, C_ssm, z), vjp1 = jax.vjp(
        functools.partial(_pre_scan, spec),
        x, in_w, conv_w, conv_b, xp_w, dt_w, dt_b,
    )
    du, ddelta, dA, dB, dC, dD, dz = _selective_scan_pallas_bwd_impl(
        u, delta, A, B_ssm, C_ssm, D, z, g_y
    )
    gx, g_in_w, g_conv_w, g_conv_b, g_xp_w, g_dt_w, g_dt_b = vjp1(
        (
            du.astype(u.dtype),
            ddelta.astype(delta.dtype),
            dB.astype(B_ssm.dtype),
            dC.astype(C_ssm.dtype),
            dz.astype(z.dtype),
        )
    )
    return (
        gx, g_in_w, g_conv_w, g_conv_b, g_xp_w, g_dt_w, g_dt_b,
        dA.astype(A.dtype), dD.astype(D.dtype), g_out_w,
    )


def _mixer_bwd_kernel(
    x_ref, g_ref, *rest,
    L, Q, d, r, n, S, scale, ident, winit, Lr=None, quirk=False,
):
    """Monolithic backward for the fused Mamba1 mixer: ONE Pallas call per
    batch element that recomputes the forward from x + weights entirely in
    VMEM (in_proj, one-hot permutes, conv, projections, the chunked scan
    with per-chunk checkpoints) and emits the input gradient plus ALL weight
    gradients.  Replaces the decomposed VJP's three HBM round-trips (XLA
    ``_pre_scan`` recompute -> standalone Pallas scan backward -> XLA
    adjoint matmuls), which materialised every intermediate -- u, delta,
    B, C, z, g_y, du, ddelta, dB, dC, dz, ~150 MB/step at B/2 shapes --
    between kernels.  The scan adjoint itself is the same chunked
    checkpoint-recompute reverse sweep as ops/selective_scan._bwd_kernel.

    Weight-grad outputs use constant (per-mixer) index maps and accumulate
    across the sequential grid; they are zeroed when a new weight set first
    appears (``i % winit == 0``) -- same idiom as fused_ssd._ssd_bwd_kernel.

    ``quirk`` (the Mamba1 'vim' merge bug, block/mamba.py:362-367): the
    forward runs out_proj per stream in STREAM token order and feature-flips
    the reverse stream's output before summing, so the incoming stream
    gradient is ``g @ out_w^T`` (stream 0) / ``flip_h(g) @ out_w^T``
    (stream 1) with NO row permute, and out_w's grad pairs each stream's
    gated output with the same (un)flipped g.  The flipped g arrives as an
    extra input (first element of ``rest``) because Mosaic has no rev
    lowering -- the same trick the forward kernel uses for flip_h(W).
    Everything upstream of the merge (fan-out permutes, conv, projections,
    scan adjoint) is identical to the non-quirk path.
    """
    if quirk:
        gflip_ref, *rest = rest
    else:
        gflip_ref = None
    (
        inw_ref, convw_ref, convb_ref, xpw_ref, dtw_ref, dtb_ref,
        AT_ref, D_ref, outw_ref, P_ref,
        gx_ref, gin_ref, gconvw_ref, gconvb_ref, gxpw_ref, gdtw_ref,
        gdtb_ref, gA_ref, gD_ref, goutw_ref,
        xz, xsb, ub, preb, drawb, dts, xdbb, gpb, gyb, ysc, dub, ddb, dBb,
        dCb, dxsb, dxzacc, abuf, bbuf, hbuf, gbuf, tbuf, ckpt, dacc,
    ) = rest

    def _w(ref):
        return ref[0] if ref.ndim == 3 else ref[...]

    def _acc(ref, val):
        ref[...] += val[None] if ref.ndim == val.ndim + 1 else val

    cd = x_ref.dtype
    f32 = jnp.float32
    prec = (
        lax.Precision.HIGHEST if cd == jnp.float32 else lax.Precision.DEFAULT
    )
    i = pl.program_id(0)

    @pl.when(i % winit == 0)
    def _init():
        for rf in (gin_ref, gconvw_ref, gconvb_ref, gxpw_ref, gdtw_ref,
                   gdtb_ref, gA_ref, gD_ref, goutw_ref):
            rf[...] = jnp.zeros_like(rf)

    inw, convb = _w(inw_ref), _w(convb_ref)
    convw = _w(convw_ref)  # (K, d) fp32
    xpw, dtw, dtb = _w(xpw_ref), _w(dtw_ref), _w(dtb_ref)
    AT, Dw, outw = _w(AT_ref), _w(D_ref), _w(outw_ref)
    K = convw.shape[0]
    Lr = L if Lr is None else Lr  # per-stream rows (partition: padded Ls)
    nq = Lr // Q

    x = x_ref[0]  # (L, h) cd, zero pad rows
    g = g_ref[0]  # (L, h) cd, zero pad rows (so pad-row adjoints vanish)
    xz[...] = jnp.dot(
        x, inw, preferred_element_type=f32, precision=prec
    ).astype(cd)
    dxzacc[...] = jnp.zeros_like(dxzacc)

    for s in range(S):
        Ps = P_ref[s]  # (Lr, L) one-hot, zero pad rows
        # ---- forward recompute of the scan-free segment (MXU, in VMEM) ----
        if ident[s]:
            xsb[...] = xz[...]
        else:
            xsb[...] = jnp.dot(
                Ps, xz[...], preferred_element_type=f32, precision=prec
            ).astype(cd)
        u0 = xsb[:, :d].astype(f32)
        accv = u0 * convw[K - 1][None, :]
        for k in range(K - 1):
            sh = K - 1 - k
            shifted = jnp.concatenate(
                [jnp.zeros((sh, d), f32), u0[: Lr - sh]], axis=0
            )
            accv = accv + shifted * convw[k][None, :]
        preb[...] = accv + convb[0][None, :]
        ub[...] = _silu(preb[...])
        xdbb[...] = jnp.dot(
            ub[...].astype(cd), xpw, preferred_element_type=f32,
            precision=prec,
        )  # (Lr, r + 2n)
        drawb[...] = (
            jnp.dot(
                xdbb[:, :r].astype(cd), dtw, preferred_element_type=f32,
                precision=prec,
            )
            + dtb[0][None, :]
        )
        dts[...] = jax.nn.softplus(drawb[...])

        # ---- incoming gradient for this stream ---------------------------
        # g_y = scale * P_s @ (g @ out_w^T); permuting g first keeps the
        # one-hot selection exact and yields gp for the out_w grad below.
        # quirk: streams keep their own token order, so gp is g (or its
        # feature-flipped copy for the reverse stream) with no row permute.
        if quirk:
            gpb[...] = g if s == 0 else gflip_ref[0]
        elif ident[s]:
            gpb[...] = g
        else:
            gpb[...] = jnp.dot(
                Ps, g, preferred_element_type=f32, precision=prec
            ).astype(cd)
        gyb[...] = (
            lax.dot_general(
                gpb[...], outw, (((1,), (1,)), ((), ())),
                preferred_element_type=f32, precision=prec,
            )
            * scale
        )  # (Lr, d)

        # ---- phase 1: forward scan recompute w/ chunk checkpoints --------
        def fwd_chunk(c, h):
            so = pl.multiple_of(c * Q, Q)
            ckpt[c] = h
            dtq = dts[pl.ds(so, Q), :]
            uq = ub[pl.ds(so, Q), :]
            Bq = xdbb[pl.ds(so, Q), r : r + n]
            abuf[...] = jnp.exp(dtq[:, None, :] * AT[None])
            bbuf[...] = Bq[:, :, None] * (dtq * uq)[:, None, :]

            def step(t, h):
                h = abuf[t] * h + bbuf[t]
                hbuf[t] = h
                return h

            h = lax.fori_loop(0, Q, step, h)
            Cq = xdbb[pl.ds(so, Q), r + n :]
            ysc[pl.ds(so, Q), :] = jnp.sum(hbuf[...] * Cq[:, :, None], axis=1)
            return h

        lax.fori_loop(0, nq, fwd_chunk, jnp.zeros((n, d), f32))

        # ---- gating epilogue adjoints (vectorised) ------------------------
        y = ysc[...] + ub[...] * Dw[0][None, :]
        zv = xsb[:, d:].astype(f32)
        silz = _silu(zv)
        dxsb[:, d:] = gyb[...] * y * _dsilu(zv)  # dz
        yg = y * silz
        gow = lax.dot_general(
            yg.astype(cd), gpb[...], (((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        )
        _acc(goutw_ref, gow * scale)
        gyb[...] = gyb[...] * silz  # dyv
        _acc(gD_ref, jnp.sum(gyb[...] * ub[...], axis=0)[None, :])
        dub[...] = gyb[...] * Dw[0][None, :]  # D-skip; phase 2 adds the rest
        dacc[...] = jnp.zeros_like(dacc)

        # ---- phase 2: reverse sweep over chunks ---------------------------
        def bwd_chunk(ci, carry):
            c = nq - 1 - ci
            so = pl.multiple_of(c * Q, Q)
            dtq = dts[pl.ds(so, Q), :]
            uq = ub[pl.ds(so, Q), :]
            Bq = xdbb[pl.ds(so, Q), r : r + n]
            Cq = xdbb[pl.ds(so, Q), r + n :]
            dyq = gyb[pl.ds(so, Q), :]
            abuf[...] = jnp.exp(dtq[:, None, :] * AT[None])
            tbuf[...] = Bq[:, :, None] * uq[:, None, :]
            bbuf[...] = tbuf[...] * dtq[:, None, :]

            def fstep(t, h):
                h = abuf[t] * h + bbuf[t]
                hbuf[t] = h
                return h

            lax.fori_loop(0, Q, fstep, ckpt[c])
            bbuf[...] = Cq[:, :, None] * dyq[:, None, :]

            def gstep(k, carry):
                t = Q - 1 - k
                gv = bbuf[t] + carry
                gbuf[t] = gv
                return abuf[t] * gv

            carry = lax.fori_loop(0, Q, gstep, carry)

            g_all = gbuf[...]
            h_all = hbuf[...]
            h_prev = jnp.concatenate([ckpt[c][None], h_all[:-1]], axis=0)
            dCb[pl.ds(so, Q), :] = jnp.sum(h_all * dyq[:, None, :], axis=2)
            dBb[pl.ds(so, Q), :] = jnp.sum(
                g_all * (dtq * uq)[:, None, :], axis=2
            )
            gha = g_all * h_prev * abuf[...]
            dacc[...] += jnp.sum(gha * dtq[:, None, :], axis=0)
            ddt = jnp.sum(gha * AT[None], axis=1) + jnp.sum(
                g_all * tbuf[...], axis=1
            )
            sig = jax.nn.sigmoid(drawb[pl.ds(so, Q), :])
            ddb[pl.ds(so, Q), :] = ddt * sig
            dub[pl.ds(so, Q), :] += dtq * jnp.sum(
                g_all * Bq[:, :, None], axis=1
            )
            return carry

        lax.fori_loop(0, nq, bwd_chunk, jnp.zeros((n, d), f32))
        _acc(gA_ref, dacc[...])

        # ---- pre-scan adjoints (MXU, in VMEM) -----------------------------
        _acc(
            gdtw_ref,
            lax.dot_general(
                xdbb[:, :r].astype(cd), ddb[...].astype(cd),
                (((0,), (0,)), ((), ())),
                preferred_element_type=f32, precision=prec,
            ),
        )
        _acc(gdtb_ref, jnp.sum(ddb[...], axis=0)[None, :])
        d_dtr = lax.dot_general(
            ddb[...].astype(cd), dtw, (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        )  # (Lr, r)
        xdbb[...] = jnp.concatenate([d_dtr, dBb[...], dCb[...]], axis=1)
        _acc(
            gxpw_ref,
            lax.dot_general(
                ub[...].astype(cd), xdbb[...].astype(cd),
                (((0,), (0,)), ((), ())),
                preferred_element_type=f32, precision=prec,
            ),
        )
        du_total = dub[...] + lax.dot_general(
            xdbb[...].astype(cd), xpw, (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        )
        dpre = du_total * _dsilu(preb[...])
        _acc(gconvb_ref, jnp.sum(dpre, axis=0)[None, :])
        du0 = convw[K - 1][None, :] * dpre
        gcw = [None] * K
        for k in range(K - 1):
            sh = K - 1 - k
            u0s = jnp.concatenate(
                [jnp.zeros((sh, d), f32), u0[: Lr - sh]], axis=0
            )
            gcw[k] = jnp.sum(u0s * dpre, axis=0)
            dpres = jnp.concatenate(
                [dpre[sh:], jnp.zeros((sh, d), f32)], axis=0
            )
            du0 = du0 + convw[k][None, :] * dpres
        gcw[K - 1] = jnp.sum(u0 * dpre, axis=0)
        _acc(gconvw_ref, jnp.stack(gcw))
        dxsb[:, :d] = du0
        if ident[s]:
            dxzacc[...] += dxsb[...]
        else:
            dxzacc[...] += lax.dot_general(
                Ps, dxsb[...].astype(cd), (((0,), (0,)), ((), ())),
                preferred_element_type=f32, precision=prec,
            )

    _acc(
        gin_ref,
        lax.dot_general(
            x, dxzacc[...].astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec,
        ),
    )
    gx_ref[0] = lax.dot_general(
        dxzacc[...].astype(cd), inw, (((1,), (1,)), ((), ())),
        preferred_element_type=f32, precision=prec,
    ).astype(gx_ref.dtype)


def _monolithic_bwd(spec, x, g, in_w, conv_w, conv_b, xp_w, dt_w, dt_b, A, D,
                    out_w, *, stacked=False):
    """Launcher for the monolithic backward.  ``x``/``g`` are (B, L0, h) or,
    stacked, (M, B, L0, h) with weights carrying a leading M axis.  Returns
    cotangents in the primal argument order."""
    if stacked:
        M, B_, L0, h = x.shape
        G = M * B_
        x = x.reshape(G, L0, h)
        g = g.reshape(G, L0, h)
        m_of = lambda i: i // B_  # noqa: E731
        lead = lambda shape: (1,) + shape  # noqa: E731
        widx = lambda i: (m_of(i), 0, 0)  # noqa: E731
        glead = lambda shape: (M,) + shape  # noqa: E731
        winit = B_
        d = A.shape[1]
        n = A.shape[2]
        r = dt_w.shape[1]
    else:
        B_, L0, h = x.shape
        G = B_
        lead = lambda shape: shape  # noqa: E731
        widx = lambda i: (0, 0)  # noqa: E731
        glead = lambda shape: shape  # noqa: E731
        winit = G
        d = A.shape[0]
        n = A.shape[1]
        r = dt_w.shape[0]
    r2n = r + 2 * n
    K = conv_w.shape[-1]
    S, Ls = spec.fwd.shape
    Q = _CHUNK
    # L and the per-stream row count must be chunk multiples for the
    # checkpointed reverse sweep; pads are benign (g pad rows are zero, so
    # every pad-row adjoint vanishes -- see the kernel docstring).
    L = ((L0 + Q - 1) // Q) * Q
    Lr = L if Ls == spec.seq_len else ((Ls + Q - 1) // Q) * Q
    if L != L0:
        x = jnp.pad(x, ((0, 0), (0, L - L0), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, L - L0), (0, 0)))
    P = jnp.asarray(_perm_matrices(spec, L, Lr)).astype(x.dtype)
    nq = Lr // Q

    quirk = bool(spec.mamba1_vim_quirk)
    if quirk:
        assert not stacked and Lr == L  # vim: full-length streams, single
    kernel = functools.partial(
        _mixer_bwd_kernel, L=L, Q=Q, d=d, r=r, n=n, S=S,
        scale=float(spec.scale), ident=_identity_streams(spec), winit=winit,
        Lr=Lr, quirk=quirk,
    )
    cd = x.dtype
    AT = (
        jnp.transpose(A.astype(jnp.float32), (0, 2, 1))
        if stacked
        else jnp.transpose(A.astype(jnp.float32))
    )
    ops = (
        in_w.astype(cd),
        jnp.swapaxes(conv_w.astype(jnp.float32), -1, -2),  # (.., K, d)
        conv_b.astype(jnp.float32)[..., None, :],
        xp_w.astype(cd),
        dt_w.astype(cd),
        dt_b.astype(jnp.float32)[..., None, :],
        AT,
        D.astype(jnp.float32)[..., None, :],
        out_w.astype(cd),
    )
    wshapes = (
        (h, 2 * d), (K, d), (1, d), (d, r2n), (r, d), (1, d), (n, d),
        (1, d), (d, h),
    )
    wspecs = [
        pl.BlockSpec(lead(s), widx, memory_space=pltpu.VMEM) for s in wshapes
    ]
    gshapes = ((h, 2 * d), (K, d), (1, d), (d, r2n), (r, d), (1, d),
               (n, d), (1, d), (d, h))
    gcast = g.astype(cd)
    row_spec = pl.BlockSpec((1, L, h), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    gflip_inputs = (gcast[..., ::-1],) if quirk else ()
    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            row_spec,
            row_spec,
            *([row_spec] if quirk else []),
            *wspecs,
            pl.BlockSpec((S, Lr, L), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, L, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *[
                pl.BlockSpec(lead(s), widx, memory_space=pltpu.VMEM)
                for s in gshapes
            ],
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, L, h), cd),
            *[jax.ShapeDtypeStruct(glead(s), jnp.float32) for s in gshapes],
        ],
        scratch_shapes=[
            pltpu.VMEM((L, 2 * d), cd),  # xz
            pltpu.VMEM((Lr, 2 * d), cd),  # xsb
            pltpu.VMEM((Lr, d), jnp.float32),  # ub
            pltpu.VMEM((Lr, d), jnp.float32),  # preb
            pltpu.VMEM((Lr, d), jnp.float32),  # drawb
            pltpu.VMEM((Lr, d), jnp.float32),  # dts
            pltpu.VMEM((Lr, r2n), jnp.float32),  # xdbb
            pltpu.VMEM((Lr, h), cd),  # gpb
            pltpu.VMEM((Lr, d), jnp.float32),  # gyb
            pltpu.VMEM((Lr, d), jnp.float32),  # ysc
            pltpu.VMEM((Lr, d), jnp.float32),  # dub
            pltpu.VMEM((Lr, d), jnp.float32),  # ddb
            pltpu.VMEM((Lr, n), jnp.float32),  # dBb
            pltpu.VMEM((Lr, n), jnp.float32),  # dCb
            pltpu.VMEM((Lr, 2 * d), jnp.float32),  # dxsb
            pltpu.VMEM((L, 2 * d), jnp.float32),  # dxzacc
            pltpu.VMEM((Q, n, d), jnp.float32),  # abuf
            pltpu.VMEM((Q, n, d), jnp.float32),  # bbuf
            pltpu.VMEM((Q, n, d), jnp.float32),  # hbuf
            pltpu.VMEM((Q, n, d), jnp.float32),  # gbuf
            pltpu.VMEM((Q, n, d), jnp.float32),  # tbuf
            pltpu.VMEM((nq, n, d), jnp.float32),  # ckpt
            pltpu.VMEM((n, d), jnp.float32),  # dacc
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(x, gcast, *gflip_inputs, *ops, P)
    gx, gin, gconvw, gconvb, gxpw, gdtw, gdtb, gA, gD, goutw = outs
    gx = gx[:, :L0] if L != L0 else gx
    if stacked:
        gx = gx.reshape(-1, B_, L0, h)
    return (
        gx,
        gin.astype(in_w.dtype),
        jnp.swapaxes(gconvw, -1, -2).astype(conv_w.dtype),
        gconvb[..., 0, :].astype(conv_b.dtype),
        gxpw.astype(xp_w.dtype),
        gdtw.astype(dt_w.dtype),
        gdtb[..., 0, :].astype(dt_b.dtype),
        jnp.swapaxes(gA, -1, -2).astype(A.dtype),
        gD[..., 0, :].astype(D.dtype),
        goutw.astype(out_w.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def mamba_dual_mixer_fused(spec: ScanSpec, x12, *stacked):
    """Dual-branch fused mixer: ``x12 (2, B, L, h)`` + weights stacked on a
    leading mixer axis -> ``(2, B, L, h)``.  One launch for both branches."""
    return _dual_fwd_impl(spec, x12, *stacked)


def _use_monolithic_bwd() -> bool:
    """Escape hatch for A/B perf probes: DIFFMA_MIXER_BWD=decomposed routes
    the backward through the round-2 decomposed VJP (``_manual_bwd``)."""
    return os.environ.get("DIFFMA_MIXER_BWD", "monolithic") != "decomposed"


def _dual_vjp_fwd(spec, x12, *stacked):
    if _use_monolithic_bwd():
        return _dual_fwd_impl(spec, x12, *stacked), (x12,) + stacked
    out, merged = _dual_fwd_impl(spec, x12, *stacked, want_merged=True)
    return out, (x12,) + stacked + (merged,)


def _dual_vjp_bwd(spec, res, g):
    if len(res) == 10:  # monolithic: (x12,) + 9 weight tensors
        return _monolithic_bwd(spec, res[0], g, *res[1:], stacked=True)
    x12, merged = res[0], res[-1]
    stacked = res[1:-1]
    grads = [
        _manual_bwd(
            spec, x12[m], *(w[m] for w in stacked), merged[m], g[m]
        )
        for m in range(x12.shape[0])
    ]
    return tuple(
        jnp.stack([grads[0][k], grads[1][k]]) for k in range(len(grads[0]))
    )


mamba_dual_mixer_fused.defvjp(_dual_vjp_fwd, _dual_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def mamba_mixer_fused(
    spec: ScanSpec, x, in_w, conv_w, conv_b, xp_w, dt_w, dt_b, A, D, out_w
):
    """Whole mixer in one kernel: ``x (B, L, h) -> (B, L, h)``.

    ``spec`` must satisfy ``mixer_fused_eligible``.  Weight layouts match the
    Flax params (input-major).  Backward is decomposed: Pallas scan adjoint
    plus autodiff over the scan-free segments (see ``_manual_bwd``)."""
    return _fwd_impl(spec, x, in_w, conv_w, conv_b, xp_w, dt_w, dt_b, A, D, out_w)


def _vjp_fwd(spec, *args):
    # Everything (incl. the 'vim' quirk since round 4) takes the monolithic
    # kernel, which needs no residual beyond the primal inputs; the
    # decomposed VJP stays reachable via DIFFMA_MIXER_BWD=decomposed.
    if not _use_monolithic_bwd():
        out, merged = _fwd_impl(spec, *args, want_merged=True)
        return out, args + (merged,)
    return _fwd_impl(spec, *args), args


def _vjp_bwd(spec, res, g):
    if len(res) == 10:  # monolithic: (x,) + 9 weight tensors
        return _monolithic_bwd(spec, res[0], g, *res[1:])
    return _manual_bwd(spec, *res, g)


mamba_mixer_fused.defvjp(_vjp_fwd, _vjp_bwd)
