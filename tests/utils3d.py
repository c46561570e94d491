"""Shared test helpers: tiny synthetic scenes with known geometry."""

import numpy as np

from clm_gs_tpu.data.cameras import Camera


def make_camera(uid=0, width=64, height=48, fov=0.8, dist=4.0, angle=0.0):
    """Camera on a circle of radius `dist` in the xz plane, looking at origin."""
    # cam-to-world rotation: camera looks along +z toward origin
    c, s = np.cos(angle), np.sin(angle)
    pos = np.array([dist * s, 0.0, -dist * c])
    forward = -pos / np.linalg.norm(pos)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, forward)
    right /= np.linalg.norm(right)
    up2 = np.cross(forward, right)
    R = np.stack([right, up2, forward], axis=1)  # cam-to-world
    T = -R.T @ pos  # world-to-view translation
    return Camera(
        uid=uid, image_name=f"cam{uid}", width=width, height=height,
        R=R, T=T, fovx=fov, fovy=fov * height / width,
    )


def random_gaussians(n, rng, extent=1.5):
    xyz = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    log_scales = rng.uniform(-3.5, -2.0, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opacity_logits = rng.uniform(-1.0, 3.0, (n,)).astype(np.float32)
    sh = np.zeros((n, 16, 3), np.float32)
    sh[:, 0, :] = rng.uniform(-1.0, 1.0, (n, 3))
    sh[:, 1:, :] = 0.1 * rng.normal(size=(n, 15, 3))
    return xyz, log_scales, quats, opacity_logits, sh.astype(np.float32)
