"""Checkpointing: Orbax save/restore with the reference's logical layout.

The reference writes ``{"model", "ema", "opt", "args"}`` pickles every
ckpt_every steps on rank 0 followed by a barrier (train.py:290-303); loaders
pick the "ema" or "model" sub-dict (train.py:45-62, sample.py:19-27 via
``load_ckpt_type``).  Here the same logical tree {params, ema, opt_state,
step, config} goes through Orbax (multi-host safe, async-capable); plus a
``find_model`` equivalent that reads either our Orbax checkpoints or the
reference's torch pickles (via diffma_tpu.utils.torch_io).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step", "find_model"]


def _ckptr():
    return ocp.StandardCheckpointer()


def save_checkpoint(ckpt_dir: str, step: int, tree: Dict[str, Any]) -> str:
    """Save {params, ema, opt_state, ...} at <ckpt_dir>/<step:07d>.  The
    'args' config entry (strings) is written as a JSON sidecar since
    tensorstore only serialises numerics."""
    import json

    path = os.path.join(os.path.abspath(ckpt_dir), f"{step:07d}")
    tree = dict(tree)
    args = tree.pop("args", None)
    ckptr = _ckptr()
    ckptr.save(path, jax.tree.map(np.asarray, tree), force=True)
    ckptr.wait_until_finished()
    if args is not None:
        with open(path + ".args.json", "w") as f:
            json.dump(args, f, indent=2, default=str)
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, step: int, target=None) -> Dict[str, Any]:
    path = os.path.join(os.path.abspath(ckpt_dir), f"{step:07d}")
    return _ckptr().restore(path, target=target)


def find_model(path: str, load_ckpt_type: str = "ema") -> Dict[str, Any]:
    """Load the 'ema' (or 'model'/'params') sub-tree from either an Orbax
    directory or a reference torch pickle (train.py:45-52 semantics)."""
    if os.path.isdir(path):
        # Orbax/tensorstore requires absolute paths; the reference CLI
        # accepts relative ones (sample.py --ckpt), so normalise here.
        ckpt = _ckptr().restore(os.path.abspath(path))
    else:
        from diffma_tpu.utils.torch_io import load_torch_checkpoint

        ckpt = load_torch_checkpoint(path)
    for key in (load_ckpt_type, "ema", "params", "model"):
        if isinstance(ckpt, dict) and key in ckpt:
            return ckpt[key]
    return ckpt


def load_diffma_params(path: str, model, load_ckpt_type: str = "ema"):
    """``find_model`` + automatic name conversion when the checkpoint is a
    reference torch state dict (flat dotted keys) rather than a Flax tree."""
    tree = find_model(path, load_ckpt_type)
    if isinstance(tree, dict) and any("." in str(k) for k in tree):
        from diffma_tpu.utils.torch_io import diffma_params_from_torch

        tree = diffma_params_from_torch(
            tree, depth=model.depth, block_type=model.block_type,
            use_mamba2=model.use_mamba2,
        )["params"]
    return tree
