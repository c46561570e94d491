"""Debug dump helpers (utils/debug_utils.py analogue): write images, tiles,
and masks as text/npy files for kernel-level diffing between implementations
(reference :6-86 dumps torch tensors the same way for CUDA-vs-CUDA diffs)."""

from __future__ import annotations

import os

import numpy as np


def dump_image_txt(path: str, image, fmt: str = "%.6f"):
    """(3, H, W) or (H, W) array -> one text file per channel."""
    arr = np.asarray(image)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if arr.ndim == 2:
        np.savetxt(path, arr, fmt=fmt)
    else:
        stem, ext = os.path.splitext(path)
        for c in range(arr.shape[0]):
            np.savetxt(f"{stem}_c{c}{ext or '.txt'}", arr[c], fmt=fmt)


def dump_tile(path: str, image, tile_y: int, tile_x: int, tile_size: int = 16):
    arr = np.asarray(image)
    t = arr[
        ..., tile_y * tile_size : (tile_y + 1) * tile_size,
        tile_x * tile_size : (tile_x + 1) * tile_size,
    ]
    dump_image_txt(path, t)


def dump_mask(path: str, mask):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savetxt(path, np.asarray(mask).astype(np.int32), fmt="%d")


def dump_arrays(path: str, **arrays):
    """npz bundle of named arrays (for allclose diffing across runs)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **{k: np.asarray(v) for k, v in arrays.items()})


def compare_dumps(path_a: str, path_b: str, rtol=1e-5, atol=1e-6):
    """Compare two npz dumps; returns {name: max_abs_diff} for mismatches."""
    a, b = np.load(path_a), np.load(path_b)
    out = {}
    for k in a.files:
        if k not in b.files:
            out[k] = float("inf")
            continue
        if not np.allclose(a[k], b[k], rtol=rtol, atol=atol):
            out[k] = float(np.max(np.abs(a[k] - b[k])))
    return out
