"""The six DiffMa backbone blocks (block/mamba_block.py).

All share the adaLN-Zero interface ``block(x, c, w)``: the conditioning
vector c (N, 2D) produces shift/scale/gate through a zero-initialised
modulation MLP (zeroed at model level, model.py:239-241), so every block is
the identity at initialisation.

* ``SpiralMambaBlock``  (block/mamba_block.py:13-130)  -- the DiffMa novelty:
  dual Mamba branches where the second sees the soft-masked tokens x*w, mixed
  by a learned per-token sigmoid attention.  NOTE on init: the reference
  zero-initialises attention_network in the block constructor
  (block/mamba_block.py:127-130) but DiffMa's later model-level
  ``_basic_init`` sweep re-initialises those same Linears with xavier
  (model.py:219-224 runs after the blocks are built) -- so the *effective*
  init is xavier, which is what we implement.
* ``ZigMambaBlock``     (block/mamba_block.py:137-201)
* ``ViMMambaBlock``     (block/mamba_block.py:208-262)
* ``VMambaMambaBlock``  (block/mamba_block.py:271-336)
* ``EfficientVMambaBlock`` (block/mamba_block.py:343-398)
* ``DiTBlock``          (block/mamba_block.py:400-418) -- attention baseline.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffma_tpu.models.layers import modulate, xavier_uniform
from diffma_tpu.models.mamba import Mamba
from diffma_tpu.models.mamba2 import Mamba2
from diffma_tpu.ops.fused_mixer import mamba_dual_mixer_fused, mixer_fused_eligible
from diffma_tpu.ops.fused_ssd import mamba2_dual_mixer_fused, spiral_block_fused
from diffma_tpu.ops.norm import layer_norm
from diffma_tpu.ops.scan_orders import ScanSpec

__all__ = [
    "SpiralMambaBlock",
    "ZigMambaBlock",
    "ViMMambaBlock",
    "VMambaMambaBlock",
    "EfficientVMambaBlock",
    "DiTBlock",
]


def _mixer(use_mamba2, d_model, d_state, dtype, scan_impl, name,
           mesh=None, tp_axis=None, sp_axis=None):
    cls = Mamba2 if use_mamba2 else Mamba
    return cls(
        d_model=d_model, d_state=d_state, d_conv=4, expand=2,
        dtype=dtype, scan_impl=scan_impl, mesh=mesh, tp_axis=tp_axis,
        sp_axis=sp_axis, name=name,
    )


class _AdaLN(nn.Module):
    """SiLU -> Dense(2D -> k*D), zero-init (identity block at start)."""

    hidden: int
    k: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c):
        mod = nn.Dense(
            self.k * self.hidden, kernel_init=nn.initializers.zeros,
            dtype=self.dtype, name="fc",
        )(jax.nn.silu(c.astype(self.dtype)))
        return jnp.split(mod, self.k, axis=-1)


class _AffineLN(nn.Module):
    """nn.LayerNorm with learned affine (torch default eps 1e-5)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, return_weights: bool = False):
        w = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        if return_weights:
            return w, b
        return layer_norm(x, w, b, eps=self.eps)


class _DenseParams(nn.Module):
    """Raw kernel/bias with nn.Dense's param tree (for fused-kernel paths;
    checkpoints stay interchangeable with the unfused Dense)."""

    fin: int
    fout: int
    kernel_init: object = xavier_uniform

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, (self.fin, self.fout),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.fout,),
                       jnp.float32)
        return k, b


class SpiralMambaBlock(nn.Module):
    hidden: int
    d_state: int = 16
    use_mamba2: bool = False
    scan_impl: str = "auto"
    fuse_block: bool = False  # whole-block Pallas kernels (inference path)
    mesh: Optional[object] = None
    tp_axis: Optional[str] = None
    sp_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c, w, spec: ScanSpec):
        shift, scale, gate = _AdaLN(self.hidden, 3, self.dtype, name="adaLN")(c)

        m1 = _mixer(
            self.use_mamba2, self.hidden, self.d_state, self.dtype,
            self.scan_impl, "mamba1", self.mesh, self.tp_axis, self.sp_axis,
        )
        m2 = _mixer(
            self.use_mamba2, self.hidden, self.d_state, self.dtype,
            self.scan_impl, "mamba2", self.mesh, self.tp_axis, self.sp_axis,
        )
        if (
            self.fuse_block
            and self.use_mamba2
            and self.scan_impl == "fused"
            and self.mesh is None
            and mixer_fused_eligible(spec)
        ):
            # The WHOLE block (LN -> modulate -> both SSD mixers -> learned
            # branch mix -> gate-residual) as two Pallas calls: the block's
            # only HBM traffic is x in / out (ops/fused_ssd.py).  Param tree
            # is identical to the unfused path (raw-weight holders share the
            # submodule names).
            ln1w, ln1b = _AffineLN(self.hidden, name="norm1")(
                None, return_weights=True
            )
            anw, anb = _AffineLN(2 * self.hidden, name="attn_norm")(
                None, return_weights=True
            )
            fc1k, fc1b = _DenseParams(
                2 * self.hidden, self.hidden, name="attn_fc1"
            )()
            fc2k, fc2b = _DenseParams(self.hidden, 1, name="attn_fc2")()
            w1 = m1(None, spec, return_weights=True)
            w2 = m2(None, spec, return_weights=True)
            stacked = tuple(jnp.stack([a, b]) for a, b in zip(w1, w2))
            return spiral_block_fused(
                spec, x.astype(self.dtype), w.astype(jnp.float32),
                shift, scale, gate, ln1w, ln1b, anw, anb, fc1k, fc1b,
                fc2k, fc2b, stacked, tuple(m1.dt_limit), m1.norm_eps,
            )

        x_mod = modulate(_AffineLN(self.hidden, name="norm1")(x), shift, scale)
        w_ssm_in = x_mod * w  # soft mask from the CT encoder

        if (
            self.scan_impl == "fused"
            and self.mesh is None
            and mixer_fused_eligible(spec)
        ):
            # Both branches in ONE stacked kernel launch (the branches are
            # independent, block/mamba_block.py:107-108); params stay under
            # each mixer's own scope.
            w1 = m1(None, spec, return_weights=True)
            w2 = m2(None, spec, return_weights=True)
            x12 = jnp.stack([x_mod, w_ssm_in]).astype(self.dtype)
            if self.use_mamba2:
                stacked = tuple(jnp.stack([a, b]) for a, b in zip(w1, w2))
                o = mamba2_dual_mixer_fused(
                    spec, x12, *stacked,
                    tuple(m1.dt_limit), m1.norm_eps, m1.chunk_size,
                )
            else:
                stacked = tuple(
                    jnp.stack([a, b])
                    for a, b in zip(w1[:6] + w1[7:], w2[:6] + w2[7:])
                )
                A12 = -jnp.exp(jnp.stack([w1[6], w2[6]]).astype(jnp.float32))
                o = mamba_dual_mixer_fused(
                    spec, x12, *stacked[:6], A12, *stacked[6:]
                )
            x_ssm, w_ssm = o[0], o[1]
        else:
            x_ssm = m1(x_mod, spec)
            w_ssm = m2(w_ssm_in, spec)

        # Learned spatial mixing of the two branches
        # (block/mamba_block.py:89-95,111-113).
        combined = jnp.concatenate([x_ssm, w_ssm], axis=-1)
        h = _AffineLN(2 * self.hidden, name="attn_norm")(combined)
        h = nn.Dense(
            self.hidden, kernel_init=xavier_uniform, dtype=self.dtype,
            name="attn_fc1",
        )(h.astype(self.dtype))
        h = jax.nn.silu(h)
        alpha = jax.nn.sigmoid(
            nn.Dense(
                1, kernel_init=xavier_uniform, dtype=self.dtype, name="attn_fc2"
            )(h)
        )
        mixed = alpha * x_ssm + (1.0 - alpha) * w_ssm
        return x + gate[:, None, :] * mixed


class _SingleMixerBlock(nn.Module):
    """Shared shape of Zig/ViM/VMamba/EfficientVMamba blocks."""

    hidden: int
    d_state: int = 16
    use_mamba2: bool = False
    scan_impl: str = "auto"
    mesh: Optional[object] = None
    tp_axis: Optional[str] = None
    sp_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c, w, spec: ScanSpec):
        del w  # only the spiral block consumes the soft mask
        shift, scale, gate = _AdaLN(self.hidden, 3, self.dtype, name="adaLN")(c)
        x_mod = modulate(_AffineLN(self.hidden, name="norm1")(x), shift, scale)
        y = _mixer(
            self.use_mamba2, self.hidden, self.d_state, self.dtype,
            self.scan_impl, "mamba", self.mesh, self.tp_axis, self.sp_axis,
        )(x_mod, spec)
        return x + gate[:, None, :] * y


class ZigMambaBlock(_SingleMixerBlock):
    pass


class ViMMambaBlock(_SingleMixerBlock):
    pass


class VMambaMambaBlock(_SingleMixerBlock):
    pass


class EfficientVMambaBlock(_SingleMixerBlock):
    pass


class _Attention(nn.Module):
    """timm-style MHA (qkv_bias=True); effective init is xavier + zero bias
    via the model-level sweep."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, L, D = x.shape
        H = self.num_heads
        qkv = nn.Dense(
            3 * D, use_bias=True, kernel_init=xavier_uniform, dtype=self.dtype,
            name="qkv",
        )(x.astype(self.dtype))
        q, k, v = jnp.split(qkv.reshape(B, L, 3, H, D // H), 3, axis=2)
        q, k, v = (t.squeeze(2).transpose(0, 2, 1, 3) for t in (q, k, v))
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(D // H).astype(q.dtype)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
        return nn.Dense(
            D, kernel_init=xavier_uniform, dtype=self.dtype, name="proj"
        )(out)


class DiTBlock(nn.Module):
    """DiT reproduction block (block/mamba_block.py:400-418)."""

    hidden: int
    num_heads: int = 8
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c, w, spec: Optional[ScanSpec] = None):
        del w, spec
        mods = _AdaLN(self.hidden, 6, self.dtype, name="adaLN")(c)
        s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = mods
        h = modulate(layer_norm(x, eps=1e-6), s_msa, sc_msa)
        x = x + g_msa[:, None, :] * _Attention(
            self.hidden, self.num_heads, self.dtype, name="attn"
        )(h)
        h = modulate(layer_norm(x, eps=1e-6), s_mlp, sc_mlp)
        h = nn.Dense(
            int(self.hidden * self.mlp_ratio), kernel_init=xavier_uniform,
            dtype=self.dtype, name="mlp_fc1",
        )(h.astype(self.dtype))
        h = jax.nn.gelu(h, approximate=True)
        h = nn.Dense(
            self.hidden, kernel_init=xavier_uniform, dtype=self.dtype,
            name="mlp_fc2",
        )(h)
        return x + g_mlp[:, None, :] * h
