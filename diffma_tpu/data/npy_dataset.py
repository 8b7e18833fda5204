"""CT/mask/MRI .npy triplet dataset and per-host sharded loading.

Replaces the reference's ``load_data.py``:

* ``NpyDataset`` (load_data.py:14-38): three parallel folders keyed by shared
  filename; mask remapped via ``(mask + 1) / 2``.
* ``transform_train`` / ``transform_test`` (load_data.py:41-84): PIL resize
  to 224 (bilinear for CT, nearest for mask/MRI), float tensors (C, H, W).
* ``make_loader``: per-host sharded, shuffled, prefetching iterator -- the
  TPU-native replacement for DistributedSampler + DataLoader.  Each JAX
  process reads only its shard (process_index striding, seeded shuffle per
  epoch like sampler.set_epoch, load_data.py:89-91 / train.py:219).  There is
  **no** import-time process-group side effect (the reference initialises
  NCCL when the module is imported, load_data.py:86).

``SyntheticTriplets`` generates deterministic random triplets so every
pipeline runs end-to-end without the SynthRAD dataset mounted.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Callable, Iterator, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "NpyDataset",
    "SyntheticTriplets",
    "transform_train",
    "transform_test",
    "make_loader",
]

Triplet = Tuple[np.ndarray, np.ndarray, np.ndarray]


def _resize(arr: np.ndarray, size: Tuple[int, int], nearest: bool) -> np.ndarray:
    from PIL import Image

    img = Image.fromarray(np.asarray(arr, np.float32), mode="F")
    img = img.resize(
        (size[1], size[0]), Image.NEAREST if nearest else Image.BILINEAR
    )
    return np.asarray(img, np.float32)


def transform_train(image, mask, mri, size=(224, 224)) -> Triplet:
    """CT bilinear, mask/MRI nearest, each to (1, H, W) float32
    (load_data.py:41-68; the commented-out augmentations upstream are off)."""
    return (
        _resize(image, size, nearest=False)[None],
        _resize(mask, size, nearest=True)[None],
        _resize(mri, size, nearest=True)[None],
    )


def transform_test(image, mask, mri, size=(224, 224)) -> Triplet:
    return (
        _resize(image, size, nearest=False)[None],
        _resize(mask, size, nearest=True)[None],
        _resize(mri, size, nearest=True)[None],
    )


class NpyDataset:
    """Triplet .npy dataset keyed by shared filenames (load_data.py:14-38)."""

    def __init__(
        self,
        image_folder: str,
        mask_folder: str,
        mri_folder: str,
        transform: Optional[Callable] = None,
    ):
        self.image_folder = image_folder
        self.mask_folder = mask_folder
        self.mri_folder = mri_folder
        self.transform = transform
        self.images = sorted(os.listdir(image_folder))

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, index: int) -> Triplet:
        name = self.images[index]
        image = np.load(os.path.join(self.image_folder, name))
        mask = np.load(os.path.join(self.mask_folder, name))
        mri = np.load(os.path.join(self.mri_folder, name))
        if self.transform is not None:
            image, mask, mri = self.transform(image, mask, mri)
        mask = (mask + 1) / 2
        return image, mask, mri


class SyntheticTriplets:
    """Deterministic random triplets shaped like the real dataset."""

    def __init__(self, n: int = 64, size: int = 224, seed: int = 0):
        self.n = n
        self.size = size
        self.seed = seed

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, index: int) -> Triplet:
        rng = np.random.default_rng(self.seed * 100003 + index)
        s = self.size
        ct = rng.normal(size=(1, s, s)).astype(np.float32) * 0.5
        mask = (rng.random((1, s, s)) > 0.5).astype(np.float32)
        mri = np.tanh(ct + 0.1 * rng.normal(size=(1, s, s))).astype(np.float32)
        return ct, mask, mri


def make_loader(
    dataset,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    epoch: int = 0,
    process_index: int = 0,
    process_count: int = 1,
    drop_last: bool = True,
    prefetch: int = 2,
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Yield per-host batches of stacked (ct, mask, mri) arrays.

    ``batch_size`` is the per-host batch.  The global index order is shuffled
    with (seed, epoch) identically on every host, then strided by
    process_index -- the same global coverage contract as DistributedSampler.
    A small background thread prefetches batches (replacing DataLoader
    workers; heavy decode belongs to the native loader in
    diffma_tpu/data/native when built).
    """
    order = np.arange(len(dataset))
    if shuffle:
        order = np.random.default_rng((seed, epoch)).permutation(order)
    shard = order[process_index::process_count]
    n_batches = len(shard) // batch_size if drop_last else -(-len(shard) // batch_size)

    batched = hasattr(dataset, "load_batch")  # native C++ loader fast path

    def produce(q: queue.Queue):
        for b in range(n_batches):
            idx = shard[b * batch_size : (b + 1) * batch_size]
            if batched:
                q.put(dataset.load_batch(idx))
            else:
                items = [dataset[int(i)] for i in idx]
                q.put(tuple(np.stack([it[k] for it in items]) for k in range(3)))
        q.put(None)

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    t = threading.Thread(target=produce, args=(q,), daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is None:
            return
        yield item
