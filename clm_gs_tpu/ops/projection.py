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
    """(N,4) unnormalized quats + (N,3) activated scales -> (N,3,3) covariance.

    Reference formulation (tests/oracles). The hot path uses covar_cols: at
    1M Gaussians XLA:TPU lowers these (N,3,3) batched matmuls to bf16
    dot_generals plus ~100 ms/step of layout copies and conversions."""
    R = build_rotation(quats)  # (N, 3, 3)
    M = R * scales[..., None, :]
    return M @ jnp.swapaxes(M, -1, -2)


def _rot_cols(quats):
    """Unnormalized quat columns -> the 9 rotation-matrix entries as (N,)
    columns (build_rotation without the (N,3,3) stacks)."""
    w, x, y, z = quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3]
    inv = jax.lax.rsqrt(w * w + x * x + y * y + z * z + 1e-24)
    w, x, y, z = w * inv, x * inv, y * inv, z * inv
    return (
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    )


def covar_cols(quats, scales):
    """Upper-triangle world covariance as six (N,) columns — pure VPU column
    arithmetic, no (N,3,3) intermediates (see quat_scale_to_covar note)."""
    r = _rot_cols(quats)
    s0 = scales[:, 0] * scales[:, 0]
    s1 = scales[:, 1] * scales[:, 1]
    s2 = scales[:, 2] * scales[:, 2]

    def cv(i, j):
        return (
            r[3 * i] * r[3 * j] * s0
            + r[3 * i + 1] * r[3 * j + 1] * s1
            + r[3 * i + 2] * r[3 * j + 2] * s2
        )

    return cv(0, 0), cv(0, 1), cv(0, 2), cv(1, 1), cv(1, 2), cv(2, 2)


def _project_one_cam(means, covar6, viewmat, K, width, height, radius_clip, alive):
    """Project all N Gaussians into one camera. All shapes static. covar6 is
    the (c00, c01, c02, c11, c12, c22) column tuple from covar_cols."""
    Rcw = viewmat[:3, :3]
    tcw = viewmat[:3, 3]
    # p_view = means @ Rcw.T + tcw, written as column arithmetic (a (N,3) x
    # (3,3) dot_general drags bf16 conversions + layout copies at 1M rows)
    p_view = jnp.stack(
        [
            means[:, 0] * Rcw[i, 0] + means[:, 1] * Rcw[i, 1]
            + means[:, 2] * Rcw[i, 2] + tcw[i]
            for i in range(3)
        ],
        axis=-1,
    )
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

    # cam-space covariance C_cam = R C R^T, then the 2x2 screen covariance via
    # the clamped perspective Jacobian J = [[fx/z, 0, -fx tx/z^2],
    # [0, fy/z, -fy ty/z^2]]. All column arithmetic: R entries are per-camera
    # scalars, C_world arrives as six (N,) upper-triangle columns.
    w00, w01, w02, w11, w12, w22 = covar6
    Cw = ((w00, w01, w02), (w01, w11, w12), (w02, w12, w22))
    # t[i][a] = (R C)[i, a]
    t = [
        [
            Rcw[i, 0] * Cw[0][a] + Rcw[i, 1] * Cw[1][a] + Rcw[i, 2] * Cw[2][a]
            for a in range(3)
        ]
        for i in range(3)
    ]

    def _cam(i, j):
        return t[i][0] * Rcw[j, 0] + t[i][1] * Rcw[j, 1] + t[i][2] * Rcw[j, 2]

    j00 = fx * rz
    j02 = -fx * tx * rz2
    j11 = fy * rz
    j12 = -fy * ty * rz2
    c00, c01, c02 = _cam(0, 0), _cam(0, 1), _cam(0, 2)
    c11, c12, c22 = _cam(1, 1), _cam(1, 2), _cam(2, 2)
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
    covar6 = covar_cols(quats, scales)
    radii, means2d, depths, conics, comps = jax.vmap(
        lambda vm, K: _project_one_cam(
            means, covar6, vm, K, width, height, radius_clip, alive
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
