"""Torch checkpoint import (no GPU, tolerant of missing pickled classes).

The reference ships training checkpoints as torch zip-pickles with keys
``{"model", "ema", "opt", "args"}`` (train.py:290-303); ``args`` holds an
OmegaConf object whose class may not exist here.  ``load_torch_checkpoint``
unpickles tensors via torch-cpu while replacing any unresolvable class with
an inert stub, then converts everything to numpy.

Also hosts the name-mapping converters torch-state-dict -> flax param trees
for the CT encoder (`pretrain_ct_vision_embedder/*.pt`) and DiffMa.
"""

from __future__ import annotations

import io
import pickle
from typing import Any, Dict

import numpy as np

__all__ = [
    "load_torch_checkpoint",
    "ct_encoder_params_from_torch",
    "vae_params_from_torch",
    "clip_vision_params_from_torch",
    "diffma_params_from_torch",
]


class _Stub:
    """Placeholder for unresolvable pickled classes (e.g. omegaconf)."""

    def __init__(self, *a, **k):
        pass

    def __setstate__(self, state):
        self.__dict__["_state"] = state

    def __repr__(self):
        return "<unpickleable stub>"


def _tolerant_pickle_module():
    import torch  # local import: only needed for checkpoint interop

    class TolerantUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except Exception:
                return type(f"Stub_{name}", (_Stub,), {})

    class Shim:
        Unpickler = TolerantUnpickler
        load = staticmethod(pickle.load)
        loads = staticmethod(pickle.loads)
        dump = staticmethod(pickle.dump)
        dumps = staticmethod(pickle.dumps)

    del torch
    return Shim


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a torch checkpoint to nested numpy (tensors -> np.ndarray)."""
    import torch

    ckpt = torch.load(
        path,
        map_location="cpu",
        weights_only=False,
        pickle_module=_tolerant_pickle_module(),
    )

    def to_np(obj):
        if isinstance(obj, torch.Tensor):
            return obj.detach().cpu().numpy()
        if isinstance(obj, dict):
            return {k: to_np(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return type(obj)(to_np(v) for v in obj)
        return obj

    return to_np(ckpt)


def _conv_kernel_to_matmul(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight (O, I, kh, kw) -> our patchify matmul kernel
    (I*kh*kw, O); the flatten order (I-major, then kh, kw) matches the
    patch-vector layout built in PatchEmbed/VisionEmbedding."""
    O = w.shape[0]
    return w.reshape(O, -1).T.copy()


def ct_encoder_params_from_torch(state_dict: Dict[str, np.ndarray]) -> Dict:
    """Map the shipped CT-encoder state dict (keys ``vision_embedding.*``,
    ``fc.*``, ``norm.*``) onto diffma_tpu.models.ct_encoder.CTEncoder."""
    sd = state_dict
    params = {
        "vision_embedding": {
            "kernel": _conv_kernel_to_matmul(sd["vision_embedding.proj.weight"]),
            "bias": sd["vision_embedding.proj.bias"],
        },
        "fc1": {"kernel": sd["fc.0.weight"].T.copy(), "bias": sd["fc.0.bias"]},
        "fc2": {"kernel": sd["fc.2.weight"].T.copy(), "bias": sd["fc.2.bias"]},
        "norm_scale": sd["norm.weight"],
        "norm_bias": sd["norm.bias"],
    }
    if "vision_embedding.mask_token" in sd:
        params["vision_embedding"]["mask_token"] = sd["vision_embedding.mask_token"]
    return {"params": params}


def _conv(sd, key):
    """torch Conv2d (O, I, kh, kw) -> flax nn.Conv {(kh, kw, I, O), (O,)}."""
    return {
        "kernel": np.transpose(sd[f"{key}.weight"], (2, 3, 1, 0)).copy(),
        "bias": sd[f"{key}.bias"],
    }


def _dense(sd, key, bias=True):
    """torch Linear (O, I) -- or 1x1 Conv (O, I, 1, 1) -- -> flax Dense."""
    w = sd[f"{key}.weight"]
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    out = {"kernel": w.T.copy()}
    if bias:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _norm(sd, key):
    """torch GroupNorm/LayerNorm weight/bias -> flax {scale, bias}."""
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _resnet(sd, key):
    p = {
        "norm1": _norm(sd, f"{key}.norm1"),
        "conv1": _conv(sd, f"{key}.conv1"),
        "norm2": _norm(sd, f"{key}.norm2"),
        "conv2": _conv(sd, f"{key}.conv2"),
    }
    if f"{key}.conv_shortcut.weight" in sd:
        p["nin_shortcut"] = _conv(sd, f"{key}.conv_shortcut")
    elif f"{key}.nin_shortcut.weight" in sd:  # CompVis naming
        p["nin_shortcut"] = _conv(sd, f"{key}.nin_shortcut")
    return p


def _sd_attn(sd, key):
    if f"{key}.to_q.weight" in sd:
        names = ("group_norm", "to_q", "to_k", "to_v", "to_out.0")
    elif f"{key}.query.weight" in sd:  # legacy diffusers AutoencoderKL .bin
        names = ("group_norm", "query", "key", "value", "proj_attn")
    else:
        names = ("norm", "q", "k", "v", "proj_out")  # CompVis naming
    return {
        "norm": _norm(sd, f"{key}.{names[0]}"),
        "q": _dense(sd, f"{key}.{names[1]}"),
        "k": _dense(sd, f"{key}.{names[2]}"),
        "v": _dense(sd, f"{key}.{names[3]}"),
        "proj_out": _dense(sd, f"{key}.{names[4]}"),
    }


def vae_params_from_torch(
    state_dict: Dict[str, np.ndarray],
    ch_mult=(1, 2, 4, 4),
    num_res_blocks: int = 2,
) -> Dict:
    """Map a diffusers ``AutoencoderKL`` state dict (sd-vae-ft-ema/mse, the
    codec the reference loads at train.py:156) onto
    ``diffma_tpu.models.vae.AutoencoderKL``.

    Handles the diffusers layout (``encoder.down_blocks.*``); attention
    projections may be Linear or legacy 1x1 convs.
    """
    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}
    n_levels = len(ch_mult)

    enc = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "mid_block_1": _resnet(sd, "encoder.mid_block.resnets.0"),
        "mid_attn_1": _sd_attn(sd, "encoder.mid_block.attentions.0"),
        "mid_block_2": _resnet(sd, "encoder.mid_block.resnets.1"),
        "norm_out": _norm(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
    }
    for lvl in range(n_levels):
        for b in range(num_res_blocks):
            enc[f"down_{lvl}_block_{b}"] = _resnet(
                sd, f"encoder.down_blocks.{lvl}.resnets.{b}"
            )
        if lvl != n_levels - 1:
            enc[f"down_{lvl}_downsample"] = _conv(
                sd, f"encoder.down_blocks.{lvl}.downsamplers.0.conv"
            )

    dec = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid_block_1": _resnet(sd, "decoder.mid_block.resnets.0"),
        "mid_attn_1": _sd_attn(sd, "decoder.mid_block.attentions.0"),
        "mid_block_2": _resnet(sd, "decoder.mid_block.resnets.1"),
        "norm_out": _norm(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
    }
    # diffusers up_blocks run low->high resolution; our decoder names levels
    # high->low (up_{3}..up_{0}), so up_blocks.k == up_{n-1-k}.
    for k in range(n_levels):
        lvl = n_levels - 1 - k
        for b in range(num_res_blocks + 1):
            dec[f"up_{lvl}_block_{b}"] = _resnet(
                sd, f"decoder.up_blocks.{k}.resnets.{b}"
            )
        if lvl != 0:
            dec[f"up_{lvl}_upsample"] = _conv(
                sd, f"decoder.up_blocks.{k}.upsamplers.0.conv"
            )

    return {
        "params": {
            "encoder": enc,
            "decoder": dec,
            "quant_conv": _dense(sd, "quant_conv"),
            "post_quant_conv": _dense(sd, "post_quant_conv"),
        }
    }


def clip_vision_params_from_torch(
    state_dict: Dict[str, np.ndarray], depth: int = 12
) -> Dict:
    """Map the BiomedCLIP image tower (open_clip TimmModel: timm ViT-B/16
    trunk + 512-d projection head; loaded by the reference at
    train.py:176-177) onto ``diffma_tpu.models.clip_vit.VisionTransformer``.

    Accepts full-model state dicts (keys ``visual.trunk.*`` / ``visual.head.*``)
    or already-stripped trunk dicts (``patch_embed.*``, ``blocks.*``).
    """
    sd = {}
    for k, v in state_dict.items():
        k = k.removeprefix("module.")
        if k.startswith("visual.trunk."):
            sd[k.removeprefix("visual.trunk.")] = v
        elif k.startswith("visual.head."):
            sd["head." + k.removeprefix("visual.head.")] = v
        elif not k.startswith(("text.", "logit_scale", "visual.")):
            sd[k] = v

    params = {
        "patch_kernel": _conv_kernel_to_matmul(sd["patch_embed.proj.weight"]),
        "patch_bias": sd["patch_embed.proj.bias"],
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "norm": _norm(sd, "norm"),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        params[f"block_{i}"] = {
            "norm1": _norm(sd, f"{b}.norm1"),
            "qkv": _dense(sd, f"{b}.attn.qkv"),
            "proj": _dense(sd, f"{b}.attn.proj"),
            "norm2": _norm(sd, f"{b}.norm2"),
            "mlp": {
                "fc1": _dense(sd, f"{b}.mlp.fc1"),
                "fc2": _dense(sd, f"{b}.mlp.fc2"),
            },
        }
    head_key = "head.proj" if "head.proj.weight" in sd else "head"
    params["head"] = _dense(sd, head_key, bias=f"{head_key}.bias" in sd)
    return {"params": params}


def _mamba1_from_torch(sd, pfx):
    """mamba_ssm Mamba state dict -> diffma_tpu.models.mamba.Mamba params."""
    return {
        "in_proj": _dense(sd, f"{pfx}.in_proj", bias=False),
        "conv1d_weight": sd[f"{pfx}.conv1d.weight"][:, 0, :],  # (d_in, 1, K)
        "conv1d_bias": sd[f"{pfx}.conv1d.bias"],
        "x_proj": _dense(sd, f"{pfx}.x_proj", bias=False),
        "dt_proj": _dense(sd, f"{pfx}.dt_proj"),
        "A_log": sd[f"{pfx}.A_log"],
        "D": sd[f"{pfx}.D"],
        "out_proj": _dense(sd, f"{pfx}.out_proj", bias=False),
    }


def _mamba2_from_torch(sd, pfx):
    """mamba_ssm Mamba2 state dict -> diffma_tpu.models.mamba2.Mamba2."""
    return {
        "in_proj": _dense(sd, f"{pfx}.in_proj", bias=False),
        "conv1d_weight": sd[f"{pfx}.conv1d.weight"][:, 0, :],
        "conv1d_bias": sd[f"{pfx}.conv1d.bias"],
        "dt_bias": sd[f"{pfx}.dt_bias"],
        "A_log": sd[f"{pfx}.A_log"],
        "D": sd[f"{pfx}.D"],
        "norm_weight": sd[f"{pfx}.norm.weight"],
        "out_proj": _dense(sd, f"{pfx}.out_proj", bias=False),
    }


def diffma_params_from_torch(
    state_dict: Dict[str, np.ndarray],
    depth: int,
    block_type: str = "spiral",
    use_mamba2: bool = False,
) -> Dict:
    """Map a reference DiffMa checkpoint sub-dict ("model" or "ema",
    train.py:290-303) onto ``diffma_tpu.models.diffma.DiffMa``.

    Key layout per the reference modules: ``x_embedder.proj`` (conv patchify,
    model.py:22-46), ``t_embedder.mlp.{0,2}`` (model.py:49-85),
    ``blocks.{i}.{norm1, adaLN_modulation.1, mamba*/attn/mlp,
    attention_network.{0,1,3}}`` (block/mamba_block.py), and
    ``final_layer.{linear, adaLN_modulation.1}`` (model.py:92-109).
    ``pos_embed`` is a fixed buffer, recomputed at trace time here.
    """
    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}
    mixer = _mamba2_from_torch if use_mamba2 else _mamba1_from_torch

    params = {
        "x_embedder": {
            "kernel": _conv_kernel_to_matmul(sd["x_embedder.proj.weight"]),
            "bias": sd["x_embedder.proj.bias"],
        },
        "t_embedder": {
            "fc1": _dense(sd, "t_embedder.mlp.0"),
            "fc2": _dense(sd, "t_embedder.mlp.2"),
        },
        "final_layer": {
            "adaLN": _dense(sd, "final_layer.adaLN_modulation.1"),
            "linear": _dense(sd, "final_layer.linear"),
        },
    }
    for i in range(depth):
        b = f"blocks.{i}"
        blk = {"adaLN": {"fc": _dense(sd, f"{b}.adaLN_modulation.1")}}
        if block_type == "DiT":
            blk["attn"] = {
                "qkv": _dense(sd, f"{b}.attn.qkv"),
                "proj": _dense(sd, f"{b}.attn.proj"),
            }
            blk["mlp_fc1"] = _dense(sd, f"{b}.mlp.fc1")
            blk["mlp_fc2"] = _dense(sd, f"{b}.mlp.fc2")
        elif block_type == "spiral":
            blk["norm1"] = _norm(sd, f"{b}.norm1")
            blk["mamba1"] = mixer(sd, f"{b}.mamba1")
            blk["mamba2"] = mixer(sd, f"{b}.mamba2")
            blk["attn_norm"] = _norm(sd, f"{b}.attention_network.0")
            blk["attn_fc1"] = _dense(sd, f"{b}.attention_network.1")
            blk["attn_fc2"] = _dense(sd, f"{b}.attention_network.3")
        else:
            blk["norm1"] = _norm(sd, f"{b}.norm1")
            blk["mamba"] = mixer(sd, f"{b}.mamba")
        params[f"block_{i}"] = blk
    return {"params": params}
