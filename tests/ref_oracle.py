"""Pure-torch CPU oracle for the reference DiffMa model.

The reference's denoiser (/root/reference/model.py) imports CUDA/Triton
kernels from ``mamba_ssm`` / ``causal_conv1d`` and ViT pieces from ``timm``;
none are installed here.  This module installs *pure-torch* stand-ins into
``sys.modules`` so the reference's own ``model.py`` / ``block/*.py`` import
and run on CPU, turning the reference into a value-level oracle for
full-model parity tests (the BASELINE.json north star: DDIM pixel MAE <
1e-3 vs PyTorch).

The stand-in semantics follow the reference's own documented fallback paths:

* ``selective_scan_fn`` / ``mamba_inner_fn``: the recurrence spec in the
  no-kernel branch of ``Mamba.step`` (block/mamba.py:435-443) extended over a
  sequence -- h' = exp(dt*A) h + (dt*u) B, y = C.h + D*u, y*silu(z) -- with
  the conv/x_proj/dt_proj/out_proj plumbing of ``Mamba.forward``
  (block/mamba.py:334-401), all in fp32 like the CUDA kernel.
* ``causal_conv1d_fn``: depthwise conv, kernel K, left-pad K-1, silu
  (block/mamba.py:263-271 constructs exactly this nn.Conv1d).
* SSD (``mamba_split_conv1d_scan_combined``): the per-token state update
  spec in the no-kernel branch of ``Mamba2.step`` (block/mamba2.py:746-758)
  run over the sequence, with the [z|x|B|C|dt] split, conv, gated RMSNorm
  and out_proj of ``Mamba2.forward`` (block/mamba2.py:382-404, 347-350).
* ``RMSNormGated``: group-wise rms-norm with silu(z) gating on either side
  of the norm (norm_before_gate), fp32 stats.
* timm ``Attention`` / ``Mlp``: the standard ViT blocks the DiT reproduction
  uses (block/mamba_block.py:400-418).

Only used by tests; never imported by the framework.
"""

from __future__ import annotations

import math
import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F

REFERENCE_ROOT = "/root/reference"

# ---------------------------------------------------------------------------
# Kernel stand-ins (pure torch, fp32 internals)
# ---------------------------------------------------------------------------


def causal_conv1d_fn(x, weight, bias=None, activation=None, **_):
    """x: (B, D, L); weight: (D, K). Depthwise causal conv + optional silu."""
    L = x.shape[-1]
    D, K = weight.shape
    out = F.conv1d(x, weight.unsqueeze(1), bias, padding=K - 1, groups=D)[..., :L]
    if activation in ("silu", "swish"):
        out = F.silu(out)
    return out


def causal_conv1d_update(x, conv_state, weight, bias=None, activation=None):
    """Single-token conv update (decode path, block/mamba.py:420-426 spec)."""
    conv_state.copy_(torch.roll(conv_state, shifts=-1, dims=-1))
    conv_state[:, :, -1] = x
    out = torch.sum(conv_state * weight.unsqueeze(0), dim=-1)
    if bias is not None:
        out = out + bias
    if activation in ("silu", "swish"):
        out = F.silu(out)
    return out.to(x.dtype)


def selective_scan_fn(
    u, delta, A, B, C, D=None, z=None, delta_bias=None, delta_softplus=False,
    return_last_state=False,
):
    """Sequential Mamba1 recurrence (spec: block/mamba.py:435-443).

    u/delta/z: (B, D, L); A: (D, N); B/C: (B, N, L); D/delta_bias: (D,).
    fp32 internals, result cast back to u.dtype.
    """
    dtype_in = u.dtype
    u = u.float()
    delta = delta.float()
    if delta_bias is not None:
        delta = delta + delta_bias.float()[..., None]
    if delta_softplus:
        delta = F.softplus(delta)
    batch, dim, L = u.shape
    n = A.shape[1]
    x = A.new_zeros((batch, dim, n))
    dA = torch.exp(torch.einsum("bdl,dn->bdln", delta, A.float()))
    dBu = torch.einsum("bdl,bnl,bdl->bdln", delta, B.float(), u)
    ys = []
    for i in range(L):
        x = dA[:, :, i] * x + dBu[:, :, i]
        ys.append(torch.einsum("bdn,bn->bd", x, C[:, :, i].float()))
    y = torch.stack(ys, dim=2)  # (B, D, L)
    if D is not None:
        y = y + u * D.float()[:, None]
    if z is not None:
        y = y * F.silu(z.float())
    y = y.to(dtype_in)
    return (y, x) if return_last_state else y


def mamba_inner_fn(
    xz, conv1d_weight, conv1d_bias, x_proj_weight, delta_proj_weight,
    out_proj_weight, out_proj_bias, A, B=None, C=None, D=None,
    delta_bias=None, B_proj_bias=None, C_proj_bias=None, delta_softplus=True,
):
    """Fused Mamba1 inner (plumbing: block/mamba.py:334-401 call sites)."""
    L = xz.shape[-1]
    delta_rank = delta_proj_weight.shape[1]
    d_state = A.shape[-1]
    x, z = xz.chunk(2, dim=1)
    x = causal_conv1d_fn(
        x, conv1d_weight.squeeze(1), conv1d_bias, activation="silu"
    )
    x_dbl = F.linear(x.transpose(1, 2).reshape(-1, x.shape[1]), x_proj_weight)
    # (d, B*L) -> (B, d, L)
    delta = (delta_proj_weight @ x_dbl[:, :delta_rank].t()).t()
    delta = delta.reshape(xz.shape[0], L, -1).transpose(1, 2)
    if B is None:
        B = x_dbl[:, delta_rank : delta_rank + d_state]
        B = B.reshape(xz.shape[0], L, d_state).transpose(1, 2).contiguous()
    if C is None:
        C = x_dbl[:, -d_state:]
        C = C.reshape(xz.shape[0], L, d_state).transpose(1, 2).contiguous()
    y = selective_scan_fn(
        x, delta, A, B, C, D, z=z, delta_bias=delta_bias,
        delta_softplus=delta_softplus,
    )
    return F.linear(y.transpose(1, 2), out_proj_weight, out_proj_bias)


def selective_state_update(
    ssm_state, x, dt, A, B, C, D=None, z=None, dt_bias=None, dt_softplus=False
):
    """Single-token SSM update (spec: block/mamba.py:435-443).

    Mamba1 shapes: state (B,D,N), x/dt (B,D), A (D,N), B/C (B,N).
    Mamba2 shapes (block/mamba2.py:746-758): state (B,H,P,N), x (B,H,P),
    dt (B,H), A (B,H) broadcast from (H,), B/C (B,G,N)."""
    if dt_bias is not None:
        dt = dt + dt_bias
    if dt_softplus:
        dt = F.softplus(dt)
    if ssm_state.dim() == 3:  # Mamba1
        dA = torch.exp(torch.einsum("bd,dn->bdn", dt, A))
        dB = torch.einsum("bd,bn->bdn", dt, B)
        ssm_state.copy_(ssm_state * dA + x.unsqueeze(-1) * dB)
        y = torch.einsum("bdn,bn->bd", ssm_state.to(x.dtype), C)
        if D is not None:
            y = y + D.to(x.dtype) * x
    else:  # Mamba2: (B, H, P, N)
        nheads = ssm_state.shape[1]
        ngroups = B.shape[1]
        rep = nheads // ngroups
        Bh = B.repeat_interleave(rep, dim=1)  # (B,H,N)
        Ch = C.repeat_interleave(rep, dim=1)
        dA = torch.exp(dt * A)[..., None, None]  # (B,H,1,1)
        dBx = torch.einsum("bhn,bhp->bhpn", Bh, dt[..., None] * x)
        ssm_state.copy_(ssm_state * dA + dBx)
        y = torch.einsum("bhpn,bhn->bhp", ssm_state.to(x.dtype), Ch)
        if D is not None:
            y = y + (D[..., None] if D.dim() == 1 else D) * x
    if z is not None:
        y = y * F.silu(z)
    return y


def _ssd_sequential(x, dt, A, B, C, D=None, z=None, dt_bias=None,
                    dt_softplus=True, dt_limit=(0.0, float("inf"))):
    """Sequential SSD recurrence (spec: block/mamba2.py:746-758 over L).

    x: (B,L,H,P); dt: (B,L,H); A: (H,); B/C: (B,L,G,N); D: (H,) or (H,P);
    z: (B,L,H,P) or None.  fp32 internals.
    """
    bsz, L, H, P = x.shape
    G, N = B.shape[2], B.shape[3]
    rep = H // G
    x32, dt32 = x.float(), dt.float()
    if dt_bias is not None:
        dt32 = dt32 + dt_bias.float()
    if dt_softplus:
        dt32 = F.softplus(dt32)
    if dt_limit != (0.0, float("inf")):
        dt32 = dt32.clamp(min=dt_limit[0], max=dt_limit[1])
    Bh = B.float().repeat_interleave(rep, dim=2)  # (B,L,H,N)
    Ch = C.float().repeat_interleave(rep, dim=2)
    dA = torch.exp(dt32 * A.float())  # (B,L,H)
    state = x32.new_zeros((bsz, H, P, N))
    ys = []
    for i in range(L):
        dBx = torch.einsum("bhn,bhp->bhpn", Bh[:, i], dt32[:, i, :, None] * x32[:, i])
        state = state * dA[:, i, :, None, None] + dBx
        ys.append(torch.einsum("bhpn,bhn->bhp", state, Ch[:, i]))
    y = torch.stack(ys, dim=1)  # (B,L,H,P)
    if D is not None:
        Df = D.float()
        y = y + (Df[:, None] if Df.dim() == 1 else Df) * x32
    if z is not None:
        y = y * F.silu(z.float())
    return y.to(x.dtype)


def mamba_chunk_scan_combined(
    x, dt, A, B, C, chunk_size, D=None, z=None, dt_bias=None,
    initial_states=None, seq_idx=None, dt_softplus=True,
    dt_limit=(0.0, float("inf")), return_final_states=False, **_,
):
    assert initial_states is None and seq_idx is None
    y = _ssd_sequential(
        x, dt, A, B, C, D=D, z=z, dt_bias=dt_bias, dt_softplus=dt_softplus,
        dt_limit=dt_limit,
    )
    return (y, None) if return_final_states else y


def _rmsnorm_gated(x, weight, bias, z=None, eps=1e-6, group_size=None,
                   norm_before_gate=True):
    """Group-wise RMS norm with optional silu(z) gate (fp32 stats)."""
    dtype_in = x.dtype
    x = x.float()
    if z is not None and not norm_before_gate:
        x = x * F.silu(z.float())
    if group_size is None:
        group_size = x.shape[-1]
    shape = x.shape
    xg = x.reshape(*shape[:-1], shape[-1] // group_size, group_size)
    rstd = torch.rsqrt(xg.pow(2).mean(-1, keepdim=True) + eps)
    out = (xg * rstd).reshape(shape) * weight.float()
    if bias is not None:
        out = out + bias.float()
    if z is not None and norm_before_gate:
        out = out * F.silu(z.float())
    return out.to(dtype_in)


class RMSNormGated(nn.Module):
    def __init__(self, d, eps=1e-5, norm_before_gate=True, group_size=None,
                 device=None, dtype=None):
        super().__init__()
        self.eps = eps
        self.group_size = group_size
        self.norm_before_gate = norm_before_gate
        self.weight = nn.Parameter(torch.ones(d, device=device, dtype=dtype))

    def forward(self, x, z=None):
        return _rmsnorm_gated(
            x, self.weight, None, z=z, eps=self.eps,
            group_size=self.group_size, norm_before_gate=self.norm_before_gate,
        )


def mamba_split_conv1d_scan_combined(
    zxbcdt, conv1d_weight, conv1d_bias, dt_bias, A, D, chunk_size,
    initial_states=None, seq_idx=None, dt_limit=(0.0, float("inf")),
    activation="silu", rmsnorm_weight=None, rmsnorm_eps=1e-6,
    outproj_weight=None, outproj_bias=None, headdim=None, ngroups=1,
    norm_before_gate=True, **_,
):
    """Whole Mamba2 inner on the [z|x|B|C|dt] projection (call sites:
    block/mamba2.py:392-704)."""
    assert initial_states is None and seq_idx is None
    nheads = A.shape[0]
    if D.dim() == 2:
        headdim = D.shape[1]
    d = nheads * headdim
    dstate = (zxbcdt.shape[-1] - 2 * d - nheads) // (2 * ngroups)
    z, xBC, dt = torch.split(zxbcdt, [d, d + 2 * ngroups * dstate, nheads], dim=-1)
    xBC = causal_conv1d_fn(
        xBC.transpose(1, 2), conv1d_weight, conv1d_bias, activation=activation
    ).transpose(1, 2)
    x, B, C = torch.split(xBC, [d, ngroups * dstate, ngroups * dstate], dim=-1)
    bsz, L = x.shape[0], x.shape[1]
    x = x.reshape(bsz, L, nheads, headdim)
    B = B.reshape(bsz, L, ngroups, dstate)
    C = C.reshape(bsz, L, ngroups, dstate)
    zh = z.reshape(bsz, L, nheads, headdim)
    out = _ssd_sequential(
        x, dt, A, B, C, D=D, z=zh if rmsnorm_weight is None else None,
        dt_bias=dt_bias, dt_softplus=True, dt_limit=dt_limit,
    )
    out = out.reshape(bsz, L, d)
    if rmsnorm_weight is not None:
        out = _rmsnorm_gated(
            out, rmsnorm_weight, None, z=z, eps=rmsnorm_eps,
            group_size=d // ngroups, norm_before_gate=norm_before_gate,
        )
    if outproj_weight is not None:
        out = F.linear(out, outproj_weight, outproj_bias)
    return out


# ---------------------------------------------------------------------------
# Fused-norm stand-ins (block/mamba.py:21-23; only used by mamba_ssm's own
# Block wrapper, not by DiffMa's blocks -- provided for import completeness)
# ---------------------------------------------------------------------------


def layer_norm_fn(x, weight, bias, residual=None, eps=1e-6, prenorm=False,
                  residual_in_fp32=False, **_):
    if residual is not None:
        x = (x.float() + residual.float()) if residual_in_fp32 else x + residual
    out = F.layer_norm(x.float(), (x.shape[-1],), weight.float(),
                       None if bias is None else bias.float(), eps).to(x.dtype)
    return (out, x) if prenorm else out


def rms_norm_fn(x, weight, bias, residual=None, eps=1e-6, prenorm=False,
                residual_in_fp32=False, **_):
    if residual is not None:
        x = (x.float() + residual.float()) if residual_in_fp32 else x + residual
    out = _rmsnorm_gated(x, weight, bias, eps=eps)
    return (out, x) if prenorm else out


class RMSNorm(nn.Module):
    def __init__(self, d, eps=1e-5, device=None, dtype=None):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(d, device=device, dtype=dtype))

    def forward(self, x, residual=None, prenorm=False):
        return rms_norm_fn(x, self.weight, None, residual=residual,
                           eps=self.eps, prenorm=prenorm)


# ---------------------------------------------------------------------------
# timm stand-ins (standard ViT Attention/Mlp, block/mamba_block.py:400-418)
# ---------------------------------------------------------------------------


class Attention(nn.Module):
    def __init__(self, dim, num_heads=8, qkv_bias=False, attn_drop=0.0,
                 proj_drop=0.0, **_):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, C // self.num_heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        x = (attn.softmax(dim=-1) @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class Mlp(nn.Module):
    def __init__(self, in_features, hidden_features=None, out_features=None,
                 act_layer=nn.GELU, drop=0.0, **_):
        super().__init__()
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        self.fc1 = nn.Linear(in_features, hidden_features)
        self.act = act_layer()
        self.fc2 = nn.Linear(hidden_features, out_features)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


def to_2tuple(x):
    return x if isinstance(x, tuple) else (x, x)


class DropPath(nn.Module):
    def __init__(self, drop_prob=0.0):
        super().__init__()

    def forward(self, x):
        return x


# ---------------------------------------------------------------------------
# sys.modules installation + reference import
# ---------------------------------------------------------------------------


def _mod(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_reference_stubs():
    """Install pure-torch stand-ins for mamba_ssm / causal_conv1d / timm."""
    if "mamba_ssm" in sys.modules and not hasattr(
        sys.modules["mamba_ssm"], "_diffma_oracle"
    ):
        raise RuntimeError("a real mamba_ssm is already imported")

    class ColumnParallelLinear(nn.Linear):
        def __init__(self, in_features, out_features, bias=True,
                     process_group=None, sequence_parallel=True, device=None,
                     dtype=None):
            super().__init__(in_features, out_features, bias=bias)

    class RowParallelLinear(ColumnParallelLinear):
        pass

    root = _mod("mamba_ssm")
    root._diffma_oracle = True
    _mod("mamba_ssm.ops")
    _mod(
        "mamba_ssm.ops.selective_scan_interface",
        selective_scan_fn=selective_scan_fn, mamba_inner_fn=mamba_inner_fn,
    )
    _mod("mamba_ssm.ops.triton")
    _mod(
        "mamba_ssm.ops.triton.selective_state_update",
        selective_state_update=selective_state_update,
    )
    _mod(
        "mamba_ssm.ops.triton.layernorm",
        RMSNorm=RMSNorm, layer_norm_fn=layer_norm_fn, rms_norm_fn=rms_norm_fn,
    )
    _mod("mamba_ssm.ops.triton.layernorm_gated", RMSNorm=RMSNormGated)
    _mod(
        "mamba_ssm.ops.triton.ssd_combined",
        mamba_chunk_scan_combined=mamba_chunk_scan_combined,
        mamba_split_conv1d_scan_combined=mamba_split_conv1d_scan_combined,
    )
    _mod("mamba_ssm.distributed")
    _mod(
        "mamba_ssm.distributed.tensor_parallel",
        ColumnParallelLinear=ColumnParallelLinear,
        RowParallelLinear=RowParallelLinear,
    )
    _mod(
        "mamba_ssm.distributed.distributed_utils",
        all_reduce=lambda x, *a, **k: x, reduce_scatter=lambda x, *a, **k: x,
    )
    _mod(
        "causal_conv1d",
        causal_conv1d_fn=causal_conv1d_fn,
        causal_conv1d_update=causal_conv1d_update,
    )
    if "timm" not in sys.modules:
        _mod("timm")
        _mod("timm.models")
        _mod(
            "timm.models.vision_transformer", Attention=Attention, Mlp=Mlp
        )
        _mod("timm.models.layers", DropPath=DropPath, to_2tuple=to_2tuple)


def load_reference_model_module():
    """Import the reference's model.py with the stubs installed."""
    install_reference_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import model as ref_model  # /root/reference/model.py

    return ref_model
