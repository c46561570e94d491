"""K-nearest-neighbor mean squared distance for scale initialization.

TPU-native replacement for simple-knn's ``distCUDA2`` (reference call sites
strategies/*/gaussian_model.py, e.g. clm_offload/gaussian_model.py:60-64): the
mean squared distance from each point to its 3 nearest neighbors, used once at
``create_from_pcd`` time to pick the initial log-scales.

The CUDA version builds an exact spatial structure. Here we use a Morton-order
window approximation: sort points along a 3D Z-curve and take the k nearest
among the 2*WINDOW neighbors in curve order. This is O(N log N + N * WINDOW),
fully static-shaped, runs fine on TPU or host CPU, and is easily accurate
enough for an initialization heuristic (validated against exact KNN in tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

WINDOW = 32


def _morton_interleave(x, y, z):
    """Interleave 3x10-bit ints into a 30-bit Morton code."""

    def spread(v):
        v = v & 0x3FF
        v = (v | (v << 16)) & jnp.uint32(0x30000FF)
        v = (v | (v << 8)) & jnp.uint32(0x300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x30C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x9249249)
        return v

    return spread(x) | (spread(y) << 1) | (spread(z) << 2)


@partial(jax.jit, static_argnames=("k", "window"))
def knn_mean_sq_dist(points, k: int = 3, window: int = WINDOW):
    """(N, 3) points -> (N,) mean squared distance to the k nearest neighbors
    (approximate, Morton-window). Clamped below at 1e-7 like the reference's
    use (clamp before log: clm_offload/gaussian_model.py:60-64)."""
    n = points.shape[0]
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    q = ((points - lo) / jnp.maximum(hi - lo, 1e-9) * 1023.0).astype(jnp.uint32)
    code = _morton_interleave(q[:, 0], q[:, 1], q[:, 2])
    order = jnp.argsort(code)
    inv = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    p = points[order]

    # distances to +-window neighbors in curve order
    d2s = []
    for s in range(1, window + 1):
        fwd = jnp.sum((p - jnp.roll(p, -s, axis=0)) ** 2, axis=1)
        # wrap-around pairs are invalid
        idx = jnp.arange(n)
        fwd = jnp.where(idx < n - s, fwd, jnp.inf)
        bwd = jnp.roll(fwd, s, axis=0)
        bwd = jnp.where(idx >= s, bwd, jnp.inf)
        d2s.append(fwd)
        d2s.append(bwd)
    d2 = jnp.stack(d2s, axis=1)  # (N, 2*window)
    nearest = -jax.lax.top_k(-d2, k)[0]  # k smallest
    # points with fewer than k in-window neighbors (tiny N or array ends):
    # average the finite slots only — zero-filling invalid slots would bias
    # the init scales low.
    finite = jnp.isfinite(nearest)
    n_finite = jnp.maximum(jnp.sum(finite, axis=1), 1)
    mean = jnp.sum(jnp.where(finite, nearest, 0.0), axis=1) / n_finite
    return jnp.maximum(mean[inv], 1e-7)


def knn_mean_sq_dist_exact(points, k: int = 3):
    """O(N^2) exact version for tests / tiny point clouds."""
    d2 = jnp.sum((points[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(jnp.eye(points.shape[0], dtype=bool), jnp.inf, d2)
    nearest = -jax.lax.top_k(-d2, k)[0]
    return jnp.maximum(jnp.mean(nearest, axis=1), 1e-7)
