"""EWA projection of 3D Gaussians to screen space.

TPU-native replacement for gsplat's ``fully_fused_projection`` CUDA kernel
(call sites: reference strategies/base_engine.py:36-47,139-151). This is a
purely elementwise-per-Gaussian computation, so a vectorized JAX formulation is
already optimal on TPU — XLA fuses the whole chain (quat->rotmat->covar->
perspective Jacobian->conic) into a handful of VPU loops over the (C, N) grid;
no Pallas kernel is warranted here.

Differences from the CUDA reference, by design:
  - no "packed" variant: TPU culling uses a dense boolean/radius mask over the
    fixed-capacity Gaussian buffer instead of a dynamic nnz index list
    (SURVEY.md §7.2: nonzero-free masking).
  - dead/padded Gaussians (alive mask False) simply get radius 0.

Math follows the standard 3DGS/gsplat EWA pipeline: covar = R S S^T R^T,
cam-space covar = W covar W^T, cov2d = J covar_cam J^T with the clamped
perspective Jacobian, low-pass blur eps2d added to the diagonal, conic =
inverse(cov2d), radius = ceil(3 sqrt(lambda_max)).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from clm_gs_tpu.utils.general import build_rotation

EPS2D = 0.3
NEAR_PLANE = 0.01
FAR_PLANE = 1e10


class ProjResults(NamedTuple):
    radii: jnp.ndarray  # (C, N) float32 (0 = culled)
    means2d: jnp.ndarray  # (C, N, 2)
    depths: jnp.ndarray  # (C, N)
    conics: jnp.ndarray  # (C, N, 3) inverse-covariance upper triangle (a, b, c)
    compensations: jnp.ndarray  # (C, N) blur compensation factors


def quat_scale_to_covar(quats, scales):
    """(N,4) unnormalized quats + (N,3) activated scales -> (N,3,3) covariance."""
    R = build_rotation(quats)  # (N, 3, 3)
    M = R * scales[..., None, :]
    return M @ jnp.swapaxes(M, -1, -2)


def _project_one_cam(means, covars, viewmat, K, width, height, radius_clip, alive):
    """Project all N Gaussians into one camera. All shapes static."""
    Rcw = viewmat[:3, :3]
    tcw = viewmat[:3, 3]
    p_view = means @ Rcw.T + tcw  # (N, 3)
    z = p_view[:, 2]
    valid = alive & (z > NEAR_PLANE) & (z < FAR_PLANE)
    zs = jnp.where(z == 0, 1e-6, z)

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy
    lim_x_pos = (width - cx) / fx + 0.3 * tan_fovx
    lim_x_neg = cx / fx + 0.3 * tan_fovx
    lim_y_pos = (height - cy) / fy + 0.3 * tan_fovy
    lim_y_neg = cy / fy + 0.3 * tan_fovy

    rz = 1.0 / zs
    rz2 = rz * rz
    tx = zs * jnp.clip(p_view[:, 0] * rz, -lim_x_neg, lim_x_pos)
    ty = zs * jnp.clip(p_view[:, 1] * rz, -lim_y_neg, lim_y_pos)

    # cam-space covariance, then the 2x2 screen covariance via the clamped
    # perspective Jacobian J = [[fx/z, 0, -fx tx/z^2], [0, fy/z, -fy ty/z^2]].
    covar_cam = jnp.einsum("ij,njk,lk->nil", Rcw, covars, Rcw)  # (N, 3, 3)
    j00 = fx * rz
    j02 = -fx * tx * rz2
    j11 = fy * rz
    j12 = -fy * ty * rz2
    c00, c01, c02 = covar_cam[:, 0, 0], covar_cam[:, 0, 1], covar_cam[:, 0, 2]
    c11, c12, c22 = covar_cam[:, 1, 1], covar_cam[:, 1, 2], covar_cam[:, 2, 2]
    # sigma = J C J^T
    sxx = j00 * (j00 * c00 + j02 * c02) + j02 * (j00 * c02 + j02 * c22)
    sxy = j00 * (j11 * c01 + j12 * c02) + j02 * (j11 * c12 + j12 * c22)
    syy = j11 * (j11 * c11 + j12 * c12) + j12 * (j11 * c12 + j12 * c22)

    det_orig = sxx * syy - sxy * sxy
    sxx = sxx + EPS2D
    syy = syy + EPS2D
    det = sxx * syy - sxy * sxy
    valid = valid & (det > 0)
    det_safe = jnp.where(det <= 0, 1.0, det)
    compensation = jnp.sqrt(jnp.maximum(det_orig / det_safe, 0.0))

    inv_det = 1.0 / det_safe
    conic = jnp.stack([syy * inv_det, -sxy * inv_det, sxx * inv_det], axis=-1)

    b = 0.5 * (sxx + syy)
    v1 = b + jnp.sqrt(jnp.maximum(b * b - det_safe, 0.01))
    radius = jnp.ceil(3.0 * jnp.sqrt(v1))

    mean2d = jnp.stack(
        [fx * p_view[:, 0] * rz + cx, fy * p_view[:, 1] * rz + cy], axis=-1
    )
    inside = (
        (mean2d[:, 0] + radius > 0)
        & (mean2d[:, 0] - radius < width)
        & (mean2d[:, 1] + radius > 0)
        & (mean2d[:, 1] - radius < height)
    )
    valid = valid & (radius > radius_clip) & inside
    radius = jnp.where(valid, radius, 0.0)
    return radius, mean2d, z, conic, compensation


@partial(jax.jit, static_argnames=("width", "height"))
def fully_fused_projection(
    means,
    quats,
    scales,
    viewmats,
    Ks,
    width: int,
    height: int,
    radius_clip: float = 0.0,
    alive=None,
) -> ProjResults:
    """Project N Gaussians into C cameras.

    Args:
      means: (N, 3). quats: (N, 4) unnormalized. scales: (N, 3) activated (exp'd).
      viewmats: (C, 4, 4) world-to-view. Ks: (C, 3, 3).
      alive: optional (N,) bool; padded/dead rows get radius 0.

    Returns: ProjResults with (C, N) leading shape (dense; mask = radii > 0).
    """
    if alive is None:
        alive = jnp.ones(means.shape[0], dtype=bool)
    covars = quat_scale_to_covar(quats, scales)
    radii, means2d, depths, conics, comps = jax.vmap(
        lambda vm, K: _project_one_cam(
            means, covars, vm, K, width, height, radius_clip, alive
        )
    )(viewmats, Ks)
    return ProjResults(radii, means2d, depths, conics, comps)


def visibility_mask(
    means, quats, scales, viewmats, Ks, width, height, radius_clip=0.0, alive=None
):
    """Per-camera visibility (the reference's `calculate_filters`,
    base_engine.py:18-76) as a dense (C, N) bool mask — no dynamic index lists."""
    proj = fully_fused_projection(
        means, quats, scales, viewmats, Ks, width, height, radius_clip, alive
    )
    return proj.radii > 0
