"""One-shot 80/20 train/test splitter for the three parallel dataset folders
(reference: split.py:5-48).  Moves files with shared names atomically across
the triplet so the folders stay aligned."""

from __future__ import annotations

import os
import random
import shutil

__all__ = ["split_dataset"]


def split_dataset(
    a_dir: str, b_dir: str, c_dir: str,
    a_train: str, a_test: str, b_train: str, b_test: str,
    c_train: str, c_test: str,
    train_ratio: float = 0.8,
    seed: int | None = None,
) -> None:
    for d in (a_dir, b_dir, c_dir):
        assert os.path.exists(d), f"Directory {d} does not exist."
    for d in (a_train, a_test, b_train, b_test, c_train, c_test):
        os.makedirs(d, exist_ok=True)

    files = [f for f in os.listdir(a_dir) if os.path.isfile(os.path.join(a_dir, f))]
    rng = random.Random(seed)
    rng.shuffle(files)
    split_idx = int(len(files) * train_ratio)

    def move(names, a_dst, b_dst, c_dst):
        for f in names:
            shutil.move(os.path.join(a_dir, f), os.path.join(a_dst, f))
            shutil.move(os.path.join(b_dir, f), os.path.join(b_dst, f))
            shutil.move(os.path.join(c_dir, f), os.path.join(c_dst, f))

    move(files[:split_idx], a_train, b_train, c_train)
    move(files[split_idx:], a_test, b_test, c_test)
