"""DiffMa: conditional latent-diffusion denoiser with Mamba backbones.

Re-implements the reference model (model.py:112-316) and its 80-entry
registry (model.py:634-673) as a Flax module.

Structure (model.py:264-301): patchify -> +2D sincos pos-embed -> depth x
adaLN blocks with U-Net-style long skips -> adaLN final layer -> unpatchify.
The conditioning vector is c = concat(t_emb + y, t_emb + mean(y2)) where y is
the BiomedCLIP global CT embedding and (y2, w) come from the pretrained CT
encoder; w soft-masks the second branch of every Spiral block.

TPU-first deltas from the reference (capability-preserving):
* NHWC internally; the public API stays NCHW for parity with the reference
  pipelines and the channel-split diffusion math.
* Per-layer scan orders are static ScanSpecs traced into XLA gathers; the
  spiral layer indexing keeps the reference's ``(2*i) % 16`` walk cycling
  (model.py:147-150).
* ``dt_rank`` is accepted-but-unused exactly like upstream: the YAML value
  reaches the block constructors but is never forwarded to the mixers
  (block/mamba_block.py:62-71), so Mamba1 uses ceil(hidden/16) = 32.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffma_tpu.models.blocks import (
    DiTBlock,
    EfficientVMambaBlock,
    SpiralMambaBlock,
    ViMMambaBlock,
    VMambaMambaBlock,
    ZigMambaBlock,
)
from diffma_tpu.models.layers import (
    FinalLayer,
    PatchEmbed,
    TimestepEmbed,
    get_2d_sincos_pos_embed,
)
from diffma_tpu.ops.scan_orders import build_scan_spec

__all__ = ["DiffMa", "DiffMa_models", "build_model"]

_BLOCK_CLS = {
    "spiral": SpiralMambaBlock,
    "zig": ZigMambaBlock,
    "vim": ViMMambaBlock,
    "vmamba": VMambaMambaBlock,
    "efficientVMamba": EfficientVMambaBlock,
    "DiT": DiTBlock,
}


class DiffMa(nn.Module):
    input_size: int = 28
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 512
    depth: int = 16
    learn_sigma: bool = True
    block_type: str = "spiral"
    dt_rank: int = 16  # accepted-but-unused (see module docstring)
    d_state: int = 16
    use_mamba2: bool = False
    scan_impl: str = "auto"
    fuse_block: bool = False  # whole-block Pallas kernels (inference path)
    remat: bool = False  # rematerialise blocks: trade FLOPs for HBM at depth
    mesh: Optional[object] = None  # jax Mesh; required for tp_axis/sp_axis
    tp_axis: Optional[str] = None  # tensor-parallel mesh axis for the mixers
    sp_axis: Optional[str] = None  # sequence-parallel mesh axis for the scans
    dtype: jnp.dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @property
    def grid_n(self) -> int:
        return self.input_size // self.patch_size

    def _block(self, i: int):
        cls = _BLOCK_CLS[self.block_type]
        if self.remat:
            # checkpoint each block's activations; the U-skip buffers stay.
            # spec (arg 4) is a static trace-time gather table.
            cls = nn.remat(cls, static_argnums=(4,))
        if self.block_type == "DiT":
            return cls(
                hidden=self.hidden_size, num_heads=8, dtype=self.dtype,
                name=f"block_{i}",
            )
        extra = (
            {"fuse_block": self.fuse_block}
            if self.block_type == "spiral"
            else {}
        )
        return cls(
            hidden=self.hidden_size, d_state=self.d_state,
            use_mamba2=self.use_mamba2, scan_impl=self.scan_impl,
            mesh=self.mesh, tp_axis=self.tp_axis, sp_axis=self.sp_axis,
            dtype=self.dtype, name=f"block_{i}", **extra,
        )

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (N, C, H, W) latent
        t: jax.Array,  # (N,)
        y: jax.Array,  # (N, D)   BiomedCLIP CT embedding
        y2: jax.Array,  # (N, T, D) CT-encoder tokens
        w: jax.Array,  # (N, T, 1) CT-encoder soft mask
    ) -> jax.Array:
        N, C, H, W = x.shape
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC internally
        x = PatchEmbed(
            patch_size=self.patch_size, embed_dim=self.hidden_size,
            dtype=self.dtype, name="x_embedder",
        )(x)
        pos = jnp.asarray(
            get_2d_sincos_pos_embed(self.hidden_size, self.grid_n)
        ).astype(x.dtype)
        x = x + pos[None]

        t_emb = TimestepEmbed(
            hidden_size=self.hidden_size, dtype=self.dtype, name="t_embedder"
        )(t)
        y2_mean = jnp.mean(y2.astype(self.dtype), axis=1)
        c = jnp.concatenate(
            [t_emb + y.astype(self.dtype), t_emb + y2_mean], axis=1
        )  # (N, 2D)
        w = w.astype(self.dtype)

        # Depth loop with U-Net-style long skips (model.py:286-295).
        outputs = []
        for i in range(self.depth):
            spec = (
                None
                if self.block_type == "DiT"
                else build_scan_spec(self.block_type, self.grid_n, i)
            )
            if i == 0:
                inp = x
            elif i > self.depth / 2:
                inp = outputs[-1] + outputs[self.depth - i - 1]
            else:
                inp = outputs[-1]
            out = self._block(i)(inp, c, w, spec)
            outputs.append(out)
        x = outputs[-1]

        x = FinalLayer(
            hidden_size=self.hidden_size, patch_size=self.patch_size,
            out_channels=self.out_channels, dtype=self.dtype, name="final_layer",
        )(x, c)
        return self.unpatchify(x)

    def unpatchify(self, x: jax.Array) -> jax.Array:
        """(N, T, p*p*C) -> (N, C, H, W) (model.py:249-262)."""
        N = x.shape[0]
        p, c, h = self.patch_size, self.out_channels, self.grid_n
        x = x.reshape(N, h, h, p, p, c)
        x = jnp.einsum("nhwpqc->nchpwq", x)
        return x.reshape(N, c, h * p, h * p)

    def forward_with_cfg(
        self, variables, x, t, y, y2, w, cfg_scale: float
    ) -> jax.Array:
        """Classifier-free guidance helper (model.py:304-316): the batch is
        [cond, uncond] halves; guidance applied to the first 3 channels only,
        reproducing the reference's reproducibility quirk."""
        half = x[: x.shape[0] // 2]
        combined = jnp.concatenate([half, half], axis=0)
        out = self.apply(variables, combined, t, y, y2, w)
        eps, rest = out[:, :3], out[:, 3:]
        cond, uncond = jnp.split(eps, 2, axis=0)
        eps_g = uncond + cfg_scale * (cond - uncond)
        eps = jnp.concatenate([eps_g, eps_g], axis=0)
        return jnp.concatenate([eps, rest], axis=1)


def _cfg(depth: int, patch: int, block_type: str):
    def factory(**kwargs):
        # hidden_size is overridable (tests/harnesses shrink it); every
        # registry entry defaults to the reference's 512 (model.py:634-673).
        kwargs.setdefault("hidden_size", 512)
        return DiffMa(
            depth=depth, patch_size=patch, block_type=block_type, **kwargs,
        )

    return factory


def _family(prefix: str, block_type: str, extra: Optional[dict] = None):
    sizes = {"XL": 28, "L": 16, "B": 8, "S": 4}
    if prefix == "DiffMa":
        sizes = {"XXL": 56, **sizes}
    out = {}
    for sz, depth in sizes.items():
        for p in (2, 4, 7):
            out[f"{prefix}-{sz}/{p}"] = _cfg(depth, p, block_type)
    for name, (depth, p) in (extra or {}).items():
        out[f"{prefix}-{name}"] = _cfg(depth, p, block_type)
    return out


#: Registry mirroring model.py:634-673 (80 named configs).
DiffMa_models = {
    **_family("DiffMa", "spiral"),
    **_family("ZigMa", "zig", {"BL/2": (13, 2)}),
    **_family("ViM", "vim", {"BL/2": (13, 2)}),
    **_family("VMamba", "vmamba", {"BL/2": (13, 2)}),
    **_family("EMamba", "efficientVMamba", {"BL/2": (13, 2)}),
    **_family("DiT", "DiT", {"SB/2": (7, 2)}),
}


def build_model(name: str, **kwargs) -> DiffMa:
    """Instantiate a registry entry, e.g. build_model('DiffMa-L/2',
    input_size=28, d_state=16, use_mamba2=False, dtype=jnp.bfloat16)."""
    return DiffMa_models[name](**kwargs)
