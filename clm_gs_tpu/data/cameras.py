"""Camera model.

Matrix conventions match the reference (utils/graphics_utils.py:41-77,
scene/cameras.py:87-126) with one idiomatic change: we store the world-to-view
matrix in plain column-vector convention (``p_cam = viewmat @ [p; 1]``) instead
of torch's row-vector transposed layout, which is what the gsplat-style
projection math consumes directly.

Host-side camera metadata is a frozen dataclass of numpy arrays; batches of
cameras are stacked into a ``CameraBatch`` pytree of jnp arrays for the jitted
train/eval steps (all static per-resolution shapes).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np


def get_world2view(R: np.ndarray, t: np.ndarray, translate=None, scale=1.0) -> np.ndarray:
    """World->view 4x4. R is the COLMAP cam-to-world rotation (reference stores
    R transposed into the matrix, graphics_utils.py:43-53)."""
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else np.asarray(translate)
        C2W = np.linalg.inv(Rt)
        cam_center = (C2W[:3, 3] + translate) * scale
        C2W[:3, 3] = cam_center
        Rt = np.linalg.inv(C2W)
    return Rt.astype(np.float32)


def get_projection_matrix(znear, zfar, fovx, fovy) -> np.ndarray:
    """OpenGL-style projection with z in [0,1] (graphics_utils.py:55-77),
    column-vector convention (not transposed)."""
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / tan_half_fovx
    P[1, 1] = 1.0 / tan_half_fovy
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def fov2focal(fov, pixels):
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal, pixels):
    return 2 * math.atan(pixels / (2 * focal))


def intrinsics_from_fov(fovx, fovy, width, height) -> np.ndarray:
    """K matrix exactly as scene/cameras.py:110-126 builds it."""
    fx = width / (2 * math.tan(fovx * 0.5))
    fy = height / (2 * math.tan(fovy * 0.5))
    return np.array(
        [[fx, 0, width / 2.0], [0, fy, height / 2.0], [0, 0, 1]], dtype=np.float32
    )


@dataclass(frozen=True)
class Camera:
    """One posed camera. Image pixels are loaded lazily by the dataset layer."""

    uid: int
    image_name: str
    width: int
    height: int
    R: np.ndarray  # (3,3) cam-to-world rotation (COLMAP qvec convention)
    T: np.ndarray  # (3,) world-to-view translation
    fovx: float
    fovy: float
    znear: float = 0.01
    zfar: float = 100.0
    image_path: Optional[str] = None
    trans: np.ndarray = field(default_factory=lambda: np.zeros(3, dtype=np.float32))
    scale: float = 1.0

    @property
    def viewmat(self) -> np.ndarray:
        return get_world2view(self.R, self.T, self.trans, self.scale)

    @property
    def K(self) -> np.ndarray:
        return intrinsics_from_fov(self.fovx, self.fovy, self.width, self.height)

    @property
    def camera_center(self) -> np.ndarray:
        return np.linalg.inv(self.viewmat)[:3, 3].astype(np.float32)

    @property
    def full_proj(self) -> np.ndarray:
        return (
            get_projection_matrix(self.znear, self.zfar, self.fovx, self.fovy)
            @ self.viewmat
        ).astype(np.float32)


def nudge_camera(cam: Camera, dx: float = 0.0, dy: float = 0.0, dz: float = 0.0) -> Camera:
    """Move the camera center along its view axes (Camera.update(dx,dy,dz),
    scene/cameras.py:131-160) — interactive inspection helper."""
    vm = cam.viewmat.astype(np.float64)
    c2w = np.linalg.inv(vm)
    c2w[:3, 3] += c2w[:3, :3] @ np.array([dx, dy, dz])
    w2c = np.linalg.inv(c2w)
    from dataclasses import replace as _replace

    return _replace(cam, R=w2c[:3, :3].T, T=w2c[:3, 3])


@dataclass(frozen=True)
class MiniCam:
    """Pose-only camera for novel-view rendering (scene/cameras.py:163-184)."""

    width: int
    height: int
    fovx: float
    fovy: float
    viewmat: np.ndarray  # (4, 4) world-to-view
    znear: float = 0.01
    zfar: float = 100.0

    @property
    def K(self) -> np.ndarray:
        return intrinsics_from_fov(self.fovx, self.fovy, self.width, self.height)

    @property
    def camera_center(self) -> np.ndarray:
        return np.linalg.inv(self.viewmat)[:3, 3].astype(np.float32)


@dataclass(frozen=True)
class CameraBatch:
    """Stacked device-side camera parameters for a batch of B cameras (same
    resolution), the unit consumed by jitted train/eval steps."""

    viewmats: jnp.ndarray  # (B, 4, 4)
    Ks: jnp.ndarray  # (B, 3, 3)
    camtoworlds: jnp.ndarray  # (B, 4, 4)
    width: int
    height: int

    @property
    def camera_centers(self) -> jnp.ndarray:  # (B, 3)
        return self.camtoworlds[:, :3, 3]


def stack_cameras(cams: list[Camera]) -> CameraBatch:
    viewmats = np.stack([c.viewmat for c in cams]).astype(np.float32)
    Ks = np.stack([c.K for c in cams]).astype(np.float32)
    camtoworlds = np.stack([np.linalg.inv(c.viewmat) for c in cams]).astype(np.float32)
    return CameraBatch(
        viewmats=jnp.asarray(viewmats),
        Ks=jnp.asarray(Ks),
        camtoworlds=jnp.asarray(camtoworlds),
        width=cams[0].width,
        height=cams[0].height,
    )


import jax.tree_util as jtu


def _cb_flatten(cb: CameraBatch):
    return (cb.viewmats, cb.Ks, cb.camtoworlds), (cb.width, cb.height)


def _cb_unflatten(aux, children):
    return CameraBatch(children[0], children[1], children[2], aux[0], aux[1])


jtu.register_pytree_node(CameraBatch, _cb_flatten, _cb_unflatten)
