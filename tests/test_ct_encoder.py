"""CT-encoder parity: import the shipped reference checkpoints and compare
the flax forward against the torch reference module bit-for-bit(ish)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffma_tpu.models.ct_encoder import CTEncoder, VisionEmbedding
from diffma_tpu.utils.torch_io import (
    ct_encoder_params_from_torch,
    load_torch_checkpoint,
)

REF = "/root/reference"
CKPT = os.path.join(REF, "pretrain_ct_vision_embedder", "brain_patch_size_2.pt")
HAS_CKPT = os.path.isfile(CKPT)


def test_ct_encoder_shapes_random_init():
    m = CTEncoder(img_size=28, patch_size=2, in_channels=4, embed_dim=512)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 28, 28))
    vars_ = m.init(jax.random.PRNGKey(1), x)
    weight, tokens = m.apply(vars_, x)
    assert weight.shape == (2, 196, 1)
    assert tokens.shape == (2, 196, 512)
    w = np.asarray(weight)
    assert (w > 0).all() and (w < 1).all()  # sigmoid range


def test_vision_embedding_mask_token():
    m = VisionEmbedding(
        img_size=8, patch_size=2, in_chans=3, embed_dim=16, contain_mask_token=True
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 8, 8))
    vars_ = m.init(jax.random.PRNGKey(1), x)
    # all-masked positions must produce exactly the mask token
    masked = jnp.ones((1, 16))
    out = m.apply(vars_, x, masked_position=masked)
    tok = vars_["params"]["mask_token"]
    np.testing.assert_allclose(np.asarray(out), np.broadcast_to(tok, out.shape))


@pytest.mark.skipif(not HAS_CKPT, reason="reference checkpoints not mounted")
def test_shipped_checkpoint_loads():
    ckpt = load_torch_checkpoint(CKPT)
    assert set(ckpt) >= {"model", "ema", "opt"}
    ema = ckpt["ema"]
    assert ema["vision_embedding.proj.weight"].shape == (512, 4, 2, 2)
    assert ema["fc.0.weight"].shape == (14, 196)


@pytest.mark.skipif(not HAS_CKPT, reason="reference checkpoints not mounted")
def test_parity_with_torch_reference():
    import torch

    sys.path.insert(0, REF)
    from block.CT_encoder import CT_Encoder as TorchCTEncoder

    ema = load_torch_checkpoint(CKPT)["ema"]

    tm = TorchCTEncoder(
        img_size=28, patch_size=2, in_channels=4, embed_dim=512,
        contain_mask_token=True,
    )
    tm.load_state_dict({k: torch.from_numpy(np.array(v)) for k, v in ema.items()})
    tm.eval()

    jm = CTEncoder(
        img_size=28, patch_size=2, in_channels=4, embed_dim=512,
        contain_mask_token=True,
    )
    variables = ct_encoder_params_from_torch(ema)

    x = np.random.default_rng(0).normal(size=(2, 4, 28, 28)).astype(np.float32)
    with torch.no_grad():
        t_weight, t_tokens = tm(torch.from_numpy(x))
    j_weight, j_tokens = jm.apply(
        jax.tree.map(jnp.asarray, variables), jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(j_weight), t_weight.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(j_tokens), t_tokens.numpy(), rtol=1e-4, atol=1e-4
    )
