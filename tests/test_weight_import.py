"""Weight-importer tests against synthetic torch-style state dicts.

No egress in this container, so real sd-vae-ft-ema / BiomedCLIP weights are
unavailable; these tests build state dicts with the exact diffusers/open_clip
key layout (unique arange values), convert, and assert (a) the resulting tree
matches the Flax module's init tree leaf-for-leaf, (b) spot-checked value
placement/transposition, (c) the modules apply cleanly with imported params.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffma_tpu.models.clip_vit import biomedclip_vit_b16
from diffma_tpu.models.vae import AutoencoderKL
from diffma_tpu.utils.torch_io import (
    clip_vision_params_from_torch,
    vae_params_from_torch,
)


def _tree_shapes(t):
    return jax.tree.map(lambda x: tuple(x.shape), t)


def _filled(shape, offset):
    n = int(np.prod(shape))
    return (np.arange(n, dtype=np.float32).reshape(shape) + offset) / max(n, 1)


class _SDBuilder:
    """Build a torch-layout state dict whose shapes invert our converters."""

    def __init__(self):
        self.sd = {}
        self._off = 0.0

    def add(self, key, shape):
        self._off += 1.0
        self.sd[key] = _filled(shape, self._off)

    def conv(self, key, kh_kw_i_o):
        kh, kw, i, o = kh_kw_i_o
        self.add(f"{key}.weight", (o, i, kh, kw))
        self.add(f"{key}.bias", (o,))

    def dense(self, key, i_o, bias=True):
        i, o = i_o
        self.add(f"{key}.weight", (o, i))
        if bias:
            self.add(f"{key}.bias", (o,))

    def norm(self, key, c):
        self.add(f"{key}.weight", (c,))
        self.add(f"{key}.bias", (c,))

    def resnet(self, key, cin, cout):
        self.norm(f"{key}.norm1", cin)
        self.conv(f"{key}.conv1", (3, 3, cin, cout))
        self.norm(f"{key}.norm2", cout)
        self.conv(f"{key}.conv2", (3, 3, cout, cout))
        if cin != cout:
            self.add(f"{key}.conv_shortcut.weight", (cout, cin, 1, 1))
            self.add(f"{key}.conv_shortcut.bias", (cout,))

    def attn(self, key, c):
        self.norm(f"{key}.group_norm", c)
        for n in ("to_q", "to_k", "to_v"):
            self.dense(f"{key}.{n}", (c, c))
        self.dense(f"{key}.to_out.0", (c, c))


def _diffusers_vae_sd(ch=32, ch_mult=(1, 2), z=4):
    b = _SDBuilder()
    chans = [ch * m for m in ch_mult]
    b.conv("encoder.conv_in", (3, 3, 3, chans[0]))
    cin = chans[0]
    for lvl, cout in enumerate(chans):
        for r in range(2):
            b.resnet(f"encoder.down_blocks.{lvl}.resnets.{r}", cin, cout)
            cin = cout
        if lvl != len(chans) - 1:
            b.conv(f"encoder.down_blocks.{lvl}.downsamplers.0.conv",
                   (3, 3, cout, cout))
    b.resnet("encoder.mid_block.resnets.0", cin, cin)
    b.attn("encoder.mid_block.attentions.0", cin)
    b.resnet("encoder.mid_block.resnets.1", cin, cin)
    b.norm("encoder.conv_norm_out", cin)
    b.conv("encoder.conv_out", (3, 3, cin, 2 * z))

    b.conv("decoder.conv_in", (3, 3, z, chans[-1]))
    b.resnet("decoder.mid_block.resnets.0", chans[-1], chans[-1])
    b.attn("decoder.mid_block.attentions.0", chans[-1])
    b.resnet("decoder.mid_block.resnets.1", chans[-1], chans[-1])
    cin = chans[-1]
    for k, lvl in enumerate(reversed(range(len(chans)))):
        cout = chans[lvl]
        for r in range(3):
            b.resnet(f"decoder.up_blocks.{k}.resnets.{r}", cin, cout)
            cin = cout
        if lvl != 0:
            b.conv(f"decoder.up_blocks.{k}.upsamplers.0.conv", (3, 3, cout, cout))
    b.norm("decoder.conv_norm_out", chans[0])
    b.conv("decoder.conv_out", (3, 3, chans[0], 3))

    b.add("quant_conv.weight", (2 * z, 2 * z, 1, 1))
    b.add("quant_conv.bias", (2 * z,))
    b.add("post_quant_conv.weight", (z, z, 1, 1))
    b.add("post_quant_conv.bias", (z,))
    return b.sd


@pytest.mark.slow
def test_vae_import_matches_init_tree():
    sd = _diffusers_vae_sd()
    got = vae_params_from_torch(sd, ch_mult=(1, 2), num_res_blocks=2)

    vae = AutoencoderKL(ch=32, ch_mult=(1, 2))
    x = jnp.zeros((1, 3, 32, 32))
    ref = vae.init(jax.random.PRNGKey(0), jax.random.PRNGKey(1), x)
    assert _tree_shapes(got) == _tree_shapes(ref)

    # placement: decoder up_{1} (first to run) comes from up_blocks.0
    w = sd["decoder.up_blocks.0.resnets.0.conv1.weight"]
    k = got["params"]["decoder"]["up_1_block_0"]["conv1"]["kernel"]
    np.testing.assert_array_equal(k, np.transpose(w, (2, 3, 1, 0)))
    # transposition: 1x1 quant_conv -> Dense
    np.testing.assert_array_equal(
        got["params"]["quant_conv"]["kernel"], sd["quant_conv.weight"][:, :, 0, 0].T
    )

    out = vae.apply(got, jax.random.PRNGKey(2), x)
    assert out.shape == (1, 3, 32, 32)
    assert np.isfinite(np.asarray(out)).all()


def _openclip_vit_sd(width=64, depth=2, patch=16, grid=4, out=32):
    b = _SDBuilder()
    p = "visual.trunk."
    b.conv(p + "patch_embed.proj", (patch, patch, 3, width))
    b.add(p + "cls_token", (1, 1, width))
    b.add(p + "pos_embed", (1, grid * grid + 1, width))
    for i in range(depth):
        blk = f"{p}blocks.{i}"
        b.norm(f"{blk}.norm1", width)
        b.dense(f"{blk}.attn.qkv", (width, 3 * width))
        b.dense(f"{blk}.attn.proj", (width, width))
        b.norm(f"{blk}.norm2", width)
        b.dense(f"{blk}.mlp.fc1", (width, 4 * width))
        b.dense(f"{blk}.mlp.fc2", (4 * width, width))
    b.norm(p + "norm", width)
    b.dense("visual.head.proj", (width, out), bias=False)
    b.add("logit_scale", (1,))
    b.add("text.transformer.embeddings.weight", (10, 8))  # must be ignored
    return b.sd


def test_clip_import_matches_init_tree():
    from diffma_tpu.models.clip_vit import VisionTransformer

    sd = _openclip_vit_sd()
    got = clip_vision_params_from_torch(sd, depth=2)

    vit = VisionTransformer(
        img_size=64, patch_size=16, width=64, depth=2, heads=4, output_dim=32
    )
    x = jnp.zeros((1, 3, 64, 64))
    ref = vit.init(jax.random.PRNGKey(0), x)
    assert _tree_shapes(got) == _tree_shapes(ref)

    # qkv transposition: torch row o of weight == column o of kernel
    np.testing.assert_array_equal(
        got["params"]["block_0"]["qkv"]["kernel"],
        sd["visual.trunk.blocks.0.attn.qkv.weight"].T,
    )

    emb = vit.apply(got, x)
    assert emb.shape == (1, 32)
    assert np.isfinite(np.asarray(emb)).all()
