"""Generate a tiny synthetic COLMAP dataset on disk: a Gaussian scene rendered
from a ring of cameras with the oracle renderer, written as images + COLMAP
sparse binaries. Used by the end-to-end CLI tests and /verify drives."""

import os

import numpy as np


def _make_scene(n_points, seed):
    from tests.utils3d import random_gaussians

    rng = np.random.RandomState(seed)
    xyz, log_scales, quats, opacity_logits, sh = random_gaussians(n_points, rng)
    # brighter, denser gaussians for a meaningful image
    opacity_logits = opacity_logits + 1.0
    return rng, xyz, log_scales, quats, opacity_logits, sh


def _render_images(cams, scene, width, height, out_dir, names):
    """Oracle-render each camera's view of the gaussian scene to a PNG."""
    import jax.numpy as jnp
    from PIL import Image

    from clm_gs_tpu.data.cameras import stack_cameras
    from clm_gs_tpu.ops import sh as sh_ops
    from clm_gs_tpu.ops.projection import fully_fused_projection
    from clm_gs_tpu.ops.rasterize_ref import rasterize_reference

    _, xyz, log_scales, quats, opacity_logits, sh = scene
    os.makedirs(out_dir, exist_ok=True)
    bg = jnp.zeros(3, jnp.float32)
    cb = stack_cameras(cams)
    for i, name in enumerate(names):
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
        Image.fromarray(arr).save(os.path.join(out_dir, name))


def make_dataset(root, n_points=120, n_cams=10, width=96, height=64, seed=0):
    from clm_gs_tpu.data import colmap
    from tests.utils3d import make_camera

    scene = _make_scene(n_points, seed)
    rng, xyz, log_scales, quats, opacity_logits, sh = scene

    cams = [
        make_camera(uid=i + 1, width=width, height=height,
                    angle=2 * np.pi * i / n_cams)
        for i in range(n_cams)
    ]
    sparse = os.path.join(root, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)
    _render_images(cams, scene, width, height, os.path.join(root, "images"),
                   [f"img_{i:03d}.png" for i in range(n_cams)])

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


def make_city_dataset(root, n_points=120, n_train=6, n_test=2, width=96,
                      height=64, seed=0, ocean=False):
    """Same oracle scene in the MatrixCity directory layout (readCityInfo,
    reference scene/dataset_readers.py:496-554): transforms at
    <root>/pose/block_all/transforms_{train,test}.json (frames keyed by
    'file_name', OpenGL c2w matrices), images under <root>/{train,test}/,
    init point cloud as a PLY next to the transforms. With `ocean=True` also
    writes transforms_*_ocean_info.json marking train frame 0 as ocean.
    Returns the source path (the pose/block_all dir) to pass as -s."""
    import dataclasses
    import json

    from clm_gs_tpu.data.cameras import focal2fov, fov2focal
    from clm_gs_tpu.utils.plyio import write_ply_points
    from tests.utils3d import make_camera

    scene = _make_scene(n_points, seed)
    rng, xyz, log_scales, quats, opacity_logits, sh = scene

    src = os.path.join(root, "pose", "block_all")
    os.makedirs(src, exist_ok=True)
    n_all = n_train + n_test
    for split, idxs in (("train", range(n_train)),
                        ("test", range(n_train, n_all))):
        cams, frames, names = [], [], []
        for j, i in enumerate(idxs):
            cam = make_camera(uid=i + 1, width=width, height=height,
                              angle=2 * np.pi * i / n_all)
            # render with the exact fovy the reader will reconstruct from
            # camera_angle_x (focal round-trip, not the linear approximation)
            cam = dataclasses.replace(
                cam, fovy=focal2fov(fov2focal(cam.fovx, width), height))
            name = f"{split}_{j:04d}.png"
            # COLMAP-convention c2w (R is cam-to-world rotation, center
            # -R @ T), then flip the y/z axes back to OpenGL for the JSON —
            # the reader applies c2w[:3,1:3] *= -1 to undo it.
            c2w = np.eye(4)
            c2w[:3, :3] = cam.R
            c2w[:3, 3] = -cam.R @ cam.T
            c2w[:3, 1:3] *= -1
            cams.append(cam)
            frames.append({"file_name": name, "transform_matrix": c2w.tolist()})
            names.append(name)
        _render_images(cams, scene, width, height,
                       os.path.join(root, split), names)
        with open(os.path.join(src, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": cams[0].fovx, "frames": frames}, f)
        if ocean:
            with open(os.path.join(
                    src, f"transforms_{split}_ocean_info.json"), "w") as f:
                json.dump({"frames": [
                    {"file_name": fr["file_name"],
                     "is_ocean": split == "train" and k == 0}
                    for k, fr in enumerate(frames)
                ]}, f)

    pts = xyz + 0.02 * rng.normal(size=xyz.shape).astype(np.float32)
    dc_rgb = np.clip(np.asarray(sh[:, 0, :]) * 0.28209479 + 0.5, 0, 1)
    write_ply_points(os.path.join(src, "point_cloud.ply"), pts, dc_rgb)
    return src


def make_blender_dataset(root, n_points=120, n_train=6, n_test=2, width=96,
                         height=64, seed=0):
    """Same oracle scene in the Blender/NeRF-synthetic layout
    (readNerfSyntheticInfo, reference dataset_readers.py:451-493):
    transforms_{train,test}.json at the root with './split/r_i' file_path
    entries, plus points3d.ply so init uses known points instead of the
    100k-random fallback. Returns the source root."""
    import dataclasses
    import json

    from clm_gs_tpu.data.cameras import focal2fov, fov2focal
    from clm_gs_tpu.utils.plyio import write_ply_points

    from tests.utils3d import make_camera

    scene = _make_scene(n_points, seed)
    rng, xyz, log_scales, quats, opacity_logits, sh = scene

    os.makedirs(root, exist_ok=True)
    n_all = n_train + n_test
    for split, idxs in (("train", range(n_train)),
                        ("test", range(n_train, n_all))):
        cams, frames, names = [], [], []
        for j, i in enumerate(idxs):
            cam = make_camera(uid=i + 1, width=width, height=height,
                              angle=2 * np.pi * i / n_all)
            cam = dataclasses.replace(
                cam, fovy=focal2fov(fov2focal(cam.fovx, width), height))
            c2w = np.eye(4)
            c2w[:3, :3] = cam.R
            c2w[:3, 3] = -cam.R @ cam.T
            c2w[:3, 1:3] *= -1
            cams.append(cam)
            frames.append({"file_path": f"./{split}/r_{j}",
                           "transform_matrix": c2w.tolist()})
            names.append(f"r_{j}.png")
        _render_images(cams, scene, width, height,
                       os.path.join(root, split), names)
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": cams[0].fovx, "frames": frames}, f)

    pts = xyz + 0.02 * rng.normal(size=xyz.shape).astype(np.float32)
    dc_rgb = np.clip(np.asarray(sh[:, 0, :]) * 0.28209479 + 0.5, 0, 1)
    write_ply_points(os.path.join(root, "points3d.ply"), pts, dc_rgb)
    return root
