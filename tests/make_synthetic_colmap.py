"""Generate a tiny synthetic COLMAP dataset on disk: a Gaussian scene rendered
from a ring of cameras with the oracle renderer, written as images + COLMAP
sparse binaries. Used by the end-to-end CLI tests and /verify drives."""

import os

import numpy as np


def make_dataset(root, n_points=120, n_cams=10, width=96, height=64, seed=0):
    import jax.numpy as jnp
    from PIL import Image

    from clm_gs_tpu.data import colmap
    from clm_gs_tpu.data.cameras import stack_cameras
    from clm_gs_tpu.models import gaussians as G
    from clm_gs_tpu.ops import sh as sh_ops
    from clm_gs_tpu.ops.projection import fully_fused_projection
    from clm_gs_tpu.ops.rasterize_ref import rasterize_reference
    from tests.utils3d import make_camera, random_gaussians

    rng = np.random.RandomState(seed)
    xyz, log_scales, quats, opacity_logits, sh = random_gaussians(n_points, rng)
    # brighter, denser gaussians for a meaningful image
    opacity_logits = opacity_logits + 1.0

    cams = [
        make_camera(uid=i + 1, width=width, height=height,
                    angle=2 * np.pi * i / n_cams)
        for i in range(n_cams)
    ]
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    sparse = os.path.join(root, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)

    bg = jnp.zeros(3, jnp.float32)
    cb = stack_cameras(cams)
    for i, cam in enumerate(cams):
        proj = fully_fused_projection(
            jnp.asarray(xyz), jnp.asarray(quats), jnp.exp(jnp.asarray(log_scales)),
            cb.viewmats[i : i + 1], cb.Ks[i : i + 1], width, height,
        )
        colors = jnp.maximum(
            sh_ops.spherical_harmonics(
                3, jnp.asarray(xyz) - cb.camera_centers[i], jnp.asarray(sh)
            )
            + 0.5,
            0.0,
        )
        img, _ = rasterize_reference(
            proj.means2d[0], proj.conics[0], colors,
            jnp.asarray(1 / (1 + np.exp(-opacity_logits))),
            proj.depths[0], proj.radii[0], width, height, bg,
        )
        arr = np.asarray(jnp.clip(img, 0, 1) * 255).astype(np.uint8).transpose(1, 2, 0)
        Image.fromarray(arr).save(os.path.join(root, "images", f"img_{i:03d}.png"))

    # COLMAP binaries
    f = cams[0].K[0, 0]
    colmap_cams = {
        1: colmap.ColmapCamera(
            1, "PINHOLE", width, height,
            np.array([cams[0].K[0, 0], cams[0].K[1, 1], width / 2, height / 2]),
        )
    }
    colmap.write_cameras_binary(os.path.join(sparse, "cameras.bin"), colmap_cams)
    imgs = {}
    for i, cam in enumerate(cams):
        # world-to-view rotation as quaternion: viewmat R = cam.R.T
        qvec = colmap.rotmat2qvec(cam.R.T)
        imgs[i + 1] = colmap.ColmapImage(
            i + 1, qvec, cam.T.astype(np.float64), 1, f"img_{i:03d}.png"
        )
    colmap.write_images_binary(os.path.join(sparse, "images.bin"), imgs)
    # init point cloud: the true gaussian centers + noise (SfM-like)
    pts = xyz + 0.02 * rng.normal(size=xyz.shape).astype(np.float32)
    dc_rgb = np.clip(np.asarray(sh[:, 0, :]) * 0.28209479 + 0.5, 0, 1)
    colmap.write_points3d_binary(
        os.path.join(sparse, "points3D.bin"), pts.astype(np.float64),
        (dc_rgb * 255).astype(np.uint8),
    )
    return root
