"""VALUE-level verification of the SD-VAE and BiomedCLIP weight importers.

Round 1 only checked tree structure; a transposed conv kernel or wrong
flatten order would have passed.  Here minimal pure-torch implementations of
the two external models -- the diffusers ``AutoencoderKL`` layout the
reference loads at train.py:156 and the timm ViT-B/16 trunk + head inside
BiomedCLIP (train.py:176-177) -- run with random weights; the same state
dicts go through ``vae_params_from_torch`` / ``clip_vision_params_from_torch``
and the Flax forwards must match the torch forwards numerically.

The torch modules mirror the documented architectures (SD first-stage KL
autoencoder: GroupNorm(32, eps 1e-6) + silu resnets, asymmetric-pad stride-2
downsample, nearest-2x upsample, single-head mid attention with to_q/k/v
linears; timm ViT: pre-LN blocks, exact GELU, CLS pooling, linear head).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from diffma_tpu.models.clip_vit import VisionTransformer
from diffma_tpu.models.vae import AutoencoderKL
from diffma_tpu.utils.torch_io import (
    clip_vision_params_from_torch,
    vae_params_from_torch,
)

# ---------------------------------------------------------------------------
# Torch mini-VAE in the diffusers AutoencoderKL layout
# ---------------------------------------------------------------------------

CH, CH_MULT, NRES, ZCH = 32, (1, 2), 1, 4


class TResnet(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(32, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TAttn(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.group_norm = nn.GroupNorm(32, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        N, C, H, W = x.shape
        h = self.group_norm(x).reshape(N, C, H * W).transpose(1, 2)  # (N,HW,C)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        att = torch.softmax(q @ k.transpose(1, 2) / math.sqrt(C), dim=-1)
        h = self.to_out[0](att @ v)
        return x + h.transpose(1, 2).reshape(N, C, H, W)


class TDown(nn.Module):
    """diffusers DownEncoderBlock2D downsampler: pad (0,1,0,1), stride-2."""

    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class TMid(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.resnets = nn.ModuleList([TResnet(c, c), TResnet(c, c)])
        self.attentions = nn.ModuleList([TAttn(c)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class TEncoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv_in = nn.Conv2d(3, CH, 3, padding=1)
        blocks = []
        cin = CH
        for lvl, m in enumerate(CH_MULT):
            b = nn.Module()
            resnets = []
            for i in range(NRES):
                resnets.append(TResnet(cin, CH * m))
                cin = CH * m
            b.resnets = nn.ModuleList(resnets)
            if lvl != len(CH_MULT) - 1:
                b.downsamplers = nn.ModuleList([TDown(cin)])
            blocks.append(b)
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = TMid(cin)
        self.conv_norm_out = nn.GroupNorm(32, cin, eps=1e-6)
        self.conv_out = nn.Conv2d(cin, 2 * ZCH, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for b in self.down_blocks:
            for r in b.resnets:
                h = r(h)
            if hasattr(b, "downsamplers"):
                h = b.downsamplers[0](h)
        h = self.mid_block(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TUp(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class TDecoder(nn.Module):
    def __init__(self):
        super().__init__()
        cin = CH * CH_MULT[-1]
        self.conv_in = nn.Conv2d(ZCH, cin, 3, padding=1)
        self.mid_block = TMid(cin)
        blocks = []
        for k, m in enumerate(reversed(CH_MULT)):
            b = nn.Module()
            resnets = []
            for i in range(NRES + 1):
                resnets.append(TResnet(cin, CH * m))
                cin = CH * m
            b.resnets = nn.ModuleList(resnets)
            if k != len(CH_MULT) - 1:
                b.upsamplers = nn.ModuleList([TUp(cin)])
            blocks.append(b)
        self.up_blocks = nn.ModuleList(blocks)
        self.conv_norm_out = nn.GroupNorm(32, cin, eps=1e-6)
        self.conv_out = nn.Conv2d(cin, 3, 3, padding=1)

    def forward(self, z):
        h = self.mid_block(self.conv_in(z))
        for b in self.up_blocks:
            for r in b.resnets:
                h = r(h)
            if hasattr(b, "upsamplers"):
                h = b.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TVAE(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = TEncoder()
        self.decoder = TDecoder()
        self.quant_conv = nn.Conv2d(2 * ZCH, 2 * ZCH, 1)
        self.post_quant_conv = nn.Conv2d(ZCH, ZCH, 1)


def _randomize(model, seed):
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(0.2 * torch.randn(p.shape, generator=gen))
    return model


@pytest.mark.slow
def test_vae_importer_value_parity():
    tvae = _randomize(TVAE(), 0).eval()
    sd = {k: v.numpy() for k, v in tvae.state_dict().items()}
    ours = AutoencoderKL(ch=CH, ch_mult=CH_MULT, num_res_blocks=NRES, z_channels=ZCH)
    variables = jax.tree.map(
        jnp.asarray, vae_params_from_torch(sd, ch_mult=CH_MULT, num_res_blocks=NRES)
    )

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        t_moments = tvae.quant_conv(tvae.encoder(torch.from_numpy(x))).numpy()
    j_dist = ours.apply(variables, jnp.asarray(x), method=AutoencoderKL.encode)
    j_moments = np.concatenate(
        [np.asarray(j_dist.mean), np.asarray(j_dist.logvar)], axis=-1
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(j_moments, t_moments, rtol=2e-4, atol=2e-4)

    z = rng.standard_normal((2, ZCH, 16, 16)).astype(np.float32)
    with torch.no_grad():
        t_img = tvae.decoder(tvae.post_quant_conv(torch.from_numpy(z))).numpy()
    j_img = np.asarray(ours.apply(variables, jnp.asarray(z), method=AutoencoderKL.decode))
    np.testing.assert_allclose(j_img, t_img, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_vae_importer_legacy_attention_keys():
    """Legacy diffusers .bin dumps name the attention projections
    query/key/value/proj_attn; the importer must map them too."""
    tvae = _randomize(TVAE(), 2).eval()
    sd = {}
    for k, v in tvae.state_dict().items():
        k = (
            k.replace(".to_q.", ".query.")
            .replace(".to_k.", ".key.")
            .replace(".to_v.", ".value.")
            .replace(".to_out.0.", ".proj_attn.")
        )
        sd[k] = v.numpy()
    variables = jax.tree.map(
        jnp.asarray, vae_params_from_torch(sd, ch_mult=CH_MULT, num_res_blocks=NRES)
    )
    ours = AutoencoderKL(ch=CH, ch_mult=CH_MULT, num_res_blocks=NRES, z_channels=ZCH)
    x = np.random.default_rng(3).standard_normal((1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        t_moments = tvae.quant_conv(tvae.encoder(torch.from_numpy(x))).numpy()
    j_dist = ours.apply(variables, jnp.asarray(x), method=AutoencoderKL.encode)
    j_moments = np.concatenate(
        [np.asarray(j_dist.mean), np.asarray(j_dist.logvar)], axis=-1
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(j_moments, t_moments, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Torch mini-ViT in the timm / open_clip BiomedCLIP layout
# ---------------------------------------------------------------------------

VIT_W, VIT_DEPTH, VIT_HEADS, VIT_P, VIT_IMG, VIT_OUT = 64, 3, 4, 8, 32, 16


class TViTBlock(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(d, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(d, 3 * d)
        self.attn.proj = nn.Linear(d, d)
        self.norm2 = nn.LayerNorm(d, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(d, 4 * d)
        self.mlp.fc2 = nn.Linear(4 * d, d)
        self.heads = heads

    def forward(self, x):
        B, L, D = x.shape
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(B, L, 3, self.heads, D // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        att = torch.softmax(q @ k.transpose(-2, -1) / math.sqrt(D // self.heads), -1)
        o = (att @ v).transpose(1, 2).reshape(B, L, D)
        x = x + self.attn.proj(o)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))


class TViT(nn.Module):
    """timm VisionTransformer trunk + open_clip projection head, named as in
    a BiomedCLIP checkpoint (visual.trunk.* / visual.head.*)."""

    def __init__(self):
        super().__init__()
        g = VIT_IMG // VIT_P
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, VIT_W, VIT_P, stride=VIT_P)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, VIT_W))
        self.pos_embed = nn.Parameter(torch.zeros(1, g * g + 1, VIT_W))
        self.blocks = nn.ModuleList(
            [TViTBlock(VIT_W, VIT_HEADS) for _ in range(VIT_DEPTH)]
        )
        self.norm = nn.LayerNorm(VIT_W, eps=1e-6)
        self.head = nn.Module()
        self.head.proj = nn.Linear(VIT_W, VIT_OUT, bias=False)

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1) + self.pos_embed
        for b in self.blocks:
            x = b(x)
        return self.head.proj(self.norm(x)[:, 0])


def test_clip_importer_value_parity():
    tvit = _randomize(TViT(), 5).eval()
    sd = {f"visual.trunk.{k}": v.numpy() for k, v in tvit.state_dict().items()
          if not k.startswith("head.")}
    sd["visual.head.proj.weight"] = tvit.head.proj.weight.detach().numpy()
    variables = jax.tree.map(
        jnp.asarray, clip_vision_params_from_torch(sd, depth=VIT_DEPTH)
    )
    ours = VisionTransformer(
        img_size=VIT_IMG, patch_size=VIT_P, width=VIT_W, depth=VIT_DEPTH,
        heads=VIT_HEADS, output_dim=VIT_OUT,
    )
    x = np.random.default_rng(6).standard_normal((2, 3, VIT_IMG, VIT_IMG)).astype(
        np.float32
    )
    with torch.no_grad():
        want = tvit(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
