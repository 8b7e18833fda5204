"""Compute kernels and static scan-order machinery."""

from diffma_tpu.ops.scan_orders import (  # noqa: F401
    ScanSpec,
    atrous_streams,
    build_scan_spec,
    invert_permutation,
    spiral_orders,
    vmamba_orders,
    zig_order,
)
