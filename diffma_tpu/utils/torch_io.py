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
