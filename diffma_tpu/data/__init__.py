"""Data pipeline: .npy triplet dataset, transforms, per-host sharded loading."""

from diffma_tpu.data.npy_dataset import (  # noqa: F401
    NpyDataset,
    SyntheticTriplets,
    make_loader,
    transform_test,
    transform_train,
)
