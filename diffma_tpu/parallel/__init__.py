"""Device mesh construction and sharding rules (dp / tp / sp over ICI)."""

from diffma_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    shard_params,
    param_partition_spec,
)
from diffma_tpu.parallel.sequence import (  # noqa: F401
    selective_scan_sequence_parallel,
    ssd_sequence_parallel,
)
