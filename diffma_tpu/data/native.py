"""ctypes bindings for the native C++ data loader (native/npy_loader.cpp).

Replaces the reference's torch DataLoader worker processes (train.py:193,
num_workers) with an in-process threaded C++ pool: .npy decode + PIL-
compatible resize happen off the GIL.  Falls back transparently to the pure
Python path when the shared library has not been built
(``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

__all__ = ["load_native_lib", "NativeTripletLoader", "native_available"]

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libdiffma_loader.so",
)
_lib: Optional[ctypes.CDLL] = None


def load_native_lib(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(_LIB_PATH)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.diffma_load_batch.restype = ctypes.c_int
    lib.diffma_load_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.diffma_load_triplet.restype = ctypes.c_int
    lib.diffma_load_triplet.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return load_native_lib() is not None


class NativeTripletLoader:
    """Batch loader over the three parallel .npy folders using the C++
    threaded pool.  Output layout matches the python path: (B, 1, S, S)
    float32 per stream, mask remapped (m+1)/2."""

    def __init__(self, image_folder: str, mask_folder: str, mri_folder: str,
                 size: int = 224, threads: int = 0):
        self.lib = load_native_lib()
        if self.lib is None:
            raise RuntimeError("native loader not built (make -C native)")
        self.folders = (image_folder, mask_folder, mri_folder)
        self.images = sorted(os.listdir(image_folder))
        self.size = size
        self.threads = threads

    def __len__(self) -> int:
        return len(self.images)

    def load_batch(self, indices) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        names = [self.images[int(i)] for i in indices]
        B, S = len(names), self.size
        bufs = [np.empty((B, S, S), np.float32) for _ in range(3)]
        paths = [
            "\n".join(os.path.join(folder, n) for n in names).encode()
            for folder in self.folders
        ]
        fails = self.lib.diffma_load_batch(
            paths[0], paths[1], paths[2], B, S, self.threads,
            *(b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for b in bufs),
        )
        if fails:
            raise IOError(f"native loader failed on {fails}/{B} files")
        ct, mask, mri = (b[:, None] for b in bufs)
        return ct, mask, mri
