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

Tensor parallelism is *module-managed*: the mixers run their TP path inside
``shard_map`` over the 'tp' axis (see models/mamba.py / models/mamba2.py),
keeping activations sharded through conv/scan/gate with exactly one psum at
out_proj (the reference's RowParallel intent, block/mamba2.py:708-710) plus
one tiny reduction mid-mixer.  Parameters therefore stay REPLICATED over tp
-- a deliberate trade at this model scale (<=4 MB per projection): TP here
buys compute/activation sharding, and replicated weights make the shard
slicing local and free.  Sequence parallelism ('sp' axis) is likewise
module-managed via diffma_tpu.parallel.sequence.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "param_partition_spec", "shard_params", "shard_batch"]


def make_mesh(
    dp: Optional[int] = None, tp: int = 1, sp: int = 1, devices=None
) -> Mesh:
    """('dp', 'tp', 'sp') mesh.  dp defaults to n_devices // (tp*sp)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        assert n % (tp * sp) == 0, (n, tp, sp)
        dp = n // (tp * sp)
    assert dp * tp * sp == n, f"mesh {dp}x{tp}x{sp} != {n} devices"
    arr = mesh_utils.create_device_mesh((dp, tp, sp), devices=np.asarray(devices))
    return Mesh(arr, ("dp", "tp", "sp"))


def param_partition_spec(path: str, shape, tp: int = 1) -> P:
    """PartitionSpec for one parameter.  Always replicated: TP/SP are
    module-managed (shard_map slices replicated weights locally), and dp
    replicates parameters by definition."""
    del path, shape, tp
    return P()


def shard_params(params, mesh: Mesh):
    """device_put a param tree replicated over the mesh."""

    def place(p):
        return jax.device_put(p, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, params)


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
