"""Mesh + sharding rules.

Replaces the reference's distributed runtime (torchrun + NCCL DDP,
load_data.py:86 / train.py:153) and the latent tensor-parallel hooks in
Mamba2 (ColumnParallelLinear / RowParallelLinear / reduce_scatter,
block/mamba2.py:305-307,355-357,708-710) with the TPU-native recipe:

* one ``jax.sharding.Mesh`` with ``('dp', 'tp')`` axes over all chips
  (ICI within a slice, DCN across slices);
* the batch sharded over ``dp`` (NamedSharding), parameters replicated over
  ``dp`` and -- where the rules below apply -- sharded over ``tp``;
* all collectives (grad psum over dp, activation all-reduce for the
  row-parallel out_proj) are *emitted by XLA* from the shardings; no NCCL
  call sites exist anywhere in this framework.

Tensor-parallel rules mirror the reference's intent: mixer in-projections are
column-parallel (shard the d_inner output axis), the per-channel scan state
is embarrassingly parallel over d_inner, out-projections are row-parallel
(XLA inserts the psum the reference does by hand at block/mamba2.py:708-710).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "param_partition_spec", "shard_params", "shard_batch"]


def make_mesh(dp: Optional[int] = None, tp: int = 1, devices=None) -> Mesh:
    """('dp', 'tp') mesh.  dp defaults to n_devices // tp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        assert n % tp == 0, (n, tp)
        dp = n // tp
    assert dp * tp == n, f"mesh {dp}x{tp} != {n} devices"
    arr = mesh_utils.create_device_mesh((dp, tp), devices=np.asarray(devices))
    return Mesh(arr, ("dp", "tp"))


# Param-name suffix -> (axis to shard over tp). Mixer-internal tensors whose
# leading/trailing axis is d_inner (or nheads for Mamba2) are tp-shardable;
# everything else stays replicated.
_TP_RULES = (
    ("in_proj/kernel", 1),
    ("out_proj/kernel", 0),
    ("x_proj/kernel", 0),
    ("dt_proj/kernel", 1),
    ("dt_proj/bias", 0),
    ("conv1d_weight", 0),
    ("conv1d_bias", 0),
    ("A_log", 0),
    ("D", 0),
    ("dt_bias", 0),
    ("norm_weight", 0),
)


def param_partition_spec(path: str, shape, tp: int) -> P:
    """PartitionSpec for one parameter given its tree path ('/'-joined)."""
    if tp > 1:
        for suffix, axis in _TP_RULES:
            if path.endswith(suffix) and len(shape) > axis and shape[axis] % tp == 0:
                spec = [None] * len(shape)
                spec[axis] = "tp"
                return P(*spec)
    return P()


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/".join(parts)


def shard_params(params, mesh: Mesh):
    """device_put a param tree with tp-aware NamedShardings."""
    tp = mesh.shape["tp"]

    def place(path, p):
        spec = param_partition_spec(_path_str(path), p.shape, tp)
        return jax.device_put(p, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(batch, mesh: Mesh):
    """Shard leading (batch) axis over dp; replicate over tp."""

    def place(x):
        spec = P("dp", *([None] * (x.ndim - 1)))
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, spec), np.asarray(x)
            )
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, batch)
