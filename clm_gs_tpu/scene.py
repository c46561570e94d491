"""Scene orchestration (scene/__init__.py:33-277 analogue).

Loads scene info (COLMAP / MatrixCity / Blender, auto-detected like
sceneLoadTypeCallbacks), optionally truncates camera lists, pre-decodes all
images to the raw disk cache, initializes the Gaussian state (from point cloud
/ PLY / tensor checkpoint), and exposes train/test datasets plus the scene
extent (cameras_extent drives the position LR scale and densification
thresholds).
"""

from __future__ import annotations

import os
import random
from typing import List, Optional

import numpy as np

from clm_gs_tpu.config import Config
from clm_gs_tpu.data import dataset as D
from clm_gs_tpu.data import readers
from clm_gs_tpu.data.cameras import Camera
from clm_gs_tpu.models import gaussians as G
from clm_gs_tpu.utils.general import next_capacity


class Scene:
    def __init__(self, cfg: Config, logger=None):
        self.cfg = cfg
        src = cfg.model.source_path
        log = (logger.write if logger else print)

        scene_type = readers.detect_scene_type(src)
        if scene_type == "city":
            info = readers.read_city_scene(
                src,
                ply_path=cfg.aux.load_ply_path or _find_city_ply(src),
                ocean_mask=cfg.aux.matrixcity_ocean_mask,
            )
        elif scene_type == "blender":
            info = readers.read_blender_scene(
                src, white_background=cfg.model.white_background
            )
        else:
            info = readers.read_colmap_scene(
                src, images_dir=cfg.model.images, eval_split=cfg.model.eval,
                llffhold=cfg.aux.llffhold,
                dense_ply_file=cfg.aux.dense_ply_file,
            )
        self.info = info
        self.cameras_extent = info.nerf_normalization["radius"]

        # viewer-compat camera dump (Scene.__init__ writes cameras.json via
        # camera_to_JSON, reference scene/__init__.py:84-86,
        # utils/camera_utils.py:362-381: c2w position/rotation + focals)
        if cfg.model.model_path:
            import json

            os.makedirs(cfg.model.model_path, exist_ok=True)
            with open(os.path.join(cfg.model.model_path, "cameras.json"), "w") as f:
                json.dump(
                    [camera_json(i, c) for i, c in
                     enumerate(list(info.test_cameras) + list(info.train_cameras))],
                    f,
                )

        # deterministic shuffle like Scene.__init__ (seeded in safe_state)
        train = list(info.train_cameras)
        rng = random.Random(cfg.debug.seed)
        rng.shuffle(train)
        if cfg.opt.num_train_cameras > 0:
            train = train[: cfg.opt.num_train_cameras]
        test = list(info.test_cameras)
        if cfg.opt.num_test_cameras > 0:
            test = test[: cfg.opt.num_test_cameras]
        self.train_cameras: List[Camera] = train
        self.test_cameras: List[Camera] = test

        # pre-decode all images to raw cache at the dataset-min size
        all_cams = train + test
        log(f"Pre-decoding {len(all_cams)} images to {cfg.aux.decode_dataset_path}\n")
        self.width, self.height = D.predecode_dataset_to_disk(
            all_cams, cfg.aux.decode_dataset_path,
            num_workers=None if cfg.aux.multiprocesses_decode_dataset_to_disk else 1,
            white_background=cfg.model.white_background,
        )
        log(f"Image size: {self.width}x{self.height}\n")

        # Gaussian init. clm placement: SH loads straight into a host buffer
        # (self.host_sh, consumed by clm_offload.make_context_from_host) and
        # never lands on device — a (C, 48) device materialization OOMs HBM at
        # BigCity scale (the reference's clm model likewise loads into its
        # pinned buffer, clm_offload/gaussian_model.py:34-44, 236-290).
        host_sh = bool(getattr(cfg.aux, "clm_offload", False))
        self.host_sh = None

        def _unpack(r):
            if host_sh:
                self.host_sh = r[1]
                return r[0]
            return r

        # --prealloc_capacity applies to every init path (the reference sizes
        # its pinned buffer the same way regardless of pcd/ply/pt init,
        # train.py:107-122): at BigCity scale with densification off the
        # default next_capacity headroom (1.25x) wastes GBs of HBM rows.
        cap = (
            cfg.aux.prealloc_capacity
            if cfg.aux.prealloc_capacity > 0
            else None
        )
        if cfg.aux.load_pt_path:
            self.gaussians = _unpack(
                G.load_tensors(cfg.aux.load_pt_path, capacity=cap,
                               host_sh=host_sh)
            )
        elif cfg.aux.load_ply_path and cfg.aux.load_ply_path.endswith(".ply") and _is_model_ply(cfg.aux.load_ply_path):
            self.gaussians = _unpack(
                G.load_ply(cfg.aux.load_ply_path, capacity=cap,
                           host_sh=host_sh)
            )
        else:
            pcd = info.point_cloud
            assert pcd is not None, "no initial point cloud found"
            ratio = cfg.aux.initial_point_cloud_downsampled_ratio
            if getattr(cfg.debug, "drop_initial_3dgs_p", 0.0) > 0:
                ratio = min(ratio, 1.0 - cfg.debug.drop_initial_3dgs_p)
            self.gaussians = _unpack(
                G.create_from_pcd(
                    pcd.points, pcd.colors, capacity=cap,
                    downsample_ratio=ratio,
                    seed=cfg.debug.seed,
                    host_sh=host_sh,
                )
            )
        log(f"Initialized {int(self.gaussians.n_alive)} gaussians "
            f"(capacity {self.gaussians.capacity})\n")

    def train_dataset(self, bsz: int, skip_load: bool = False) -> D.SceneDataset:
        # --num_workers: extra producer threads like the reference DataLoader's
        # workers (train.py:157-167; its scripts use 0-1)
        return D.SceneDataset(
            self.train_cameras, self.cfg.aux.decode_dataset_path,
            self.width, self.height, bsz, seed=self.cfg.debug.seed,
            workers=max(1, self.cfg.aux.num_workers),
            skip_load=skip_load,
        )

    def save(self, iteration: int, logger=None):
        """PLY export with the RAM-bound auto-split heuristic
        (scene/__init__.py:254-277)."""
        out_dir = os.path.join(
            self.cfg.model.model_path, "point_cloud", f"iteration_{iteration}"
        )
        os.makedirs(out_dir, exist_ok=True)
        n = int(self.gaussians.n_alive)
        try:
            import psutil

            avail = psutil.virtual_memory().available
        except Exception:
            avail = 1 << 40
        chunk = None
        if 16 * n * 59 * 4 > avail:  # the reference's 16*N*59*4 heuristic
            chunk = max(1, avail // (16 * 59 * 4 * 2))
        G.save_ply(
            self.gaussians, os.path.join(out_dir, "point_cloud.ply"), chunk_rows=chunk
        )
        if self.cfg.debug.save_tensors:
            G.save_tensors(self.gaussians, os.path.join(out_dir, "tensors.npz"))


def camera_json(idx: int, cam: Camera) -> dict:
    """camera_to_JSON schema (utils/camera_utils.py:362-381): cam-to-world
    position/rotation plus pixel focal lengths."""
    from clm_gs_tpu.data.cameras import fov2focal

    return {
        "id": idx,
        "img_name": cam.image_name,
        "width": int(cam.width),
        "height": int(cam.height),
        "position": cam.camera_center.astype(float).tolist(),
        "rotation": [r.tolist() for r in cam.R.astype(float)],
        "fy": fov2focal(cam.fovy, cam.height),
        "fx": fov2focal(cam.fovx, cam.width),
    }


def _find_city_ply(src: str) -> Optional[str]:
    for cand in ("point_cloud.ply", "points3d.ply", "pcd.ply"):
        p = os.path.join(src, cand)
        if os.path.exists(p):
            return p
    return None


def _is_model_ply(path: str) -> bool:
    """Gaussian-model PLY (59-property schema) vs plain point cloud."""
    try:
        with open(path, "rb") as f:
            header = f.read(4096).decode("ascii", errors="replace")
        return "f_rest_44" in header
    except Exception:
        return False
