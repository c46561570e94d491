"""Dataset reader tests: COLMAP round-trip, MatrixCity transforms layout
(incl. ocean-mask filtering), Blender synthetic layout (incl. RGBA background
compositing in the predecode)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from clm_gs_tpu.data import readers
from clm_gs_tpu.data.dataset import load_raw_image, predecode_dataset_to_disk
from clm_gs_tpu.utils.plyio import write_ply_points
from tests.make_synthetic_colmap import make_dataset


def _write_img(path, w=32, h=24, color=(120, 30, 200), rgba=False):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if rgba:
        img = Image.new("RGBA", (w, h), color + (0,))
        # opaque square in the middle
        for x in range(8, 16):
            for y in range(8, 16):
                img.putpixel((x, y), color + (255,))
    else:
        img = Image.new("RGB", (w, h), color)
    img.save(path)


def _c2w(angle, dist=4.0):
    c, s = np.cos(angle), np.sin(angle)
    pos = np.array([dist * s, 0.0, -dist * c])
    fwd = -pos / np.linalg.norm(pos)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd) / np.linalg.norm(np.cross(up, fwd))
    up2 = np.cross(fwd, right)
    # OpenGL convention: camera looks along -z, y up
    R = np.stack([right, up2, -fwd], axis=1)
    m = np.eye(4)
    m[:3, :3] = R
    m[:3, 3] = pos
    return m


class TestColmap:
    def test_round_trip(self, tmp_path):
        root = make_dataset(str(tmp_path / "scene"), n_cams=6)
        info = readers.read_colmap_scene(root, eval_split=True, llffhold=3)
        assert len(info.train_cameras) == 4 and len(info.test_cameras) == 2
        assert info.point_cloud is not None and len(info.point_cloud.points) == 120
        assert info.nerf_normalization["radius"] > 0
        # all cameras look at the origin-ish scene: centers ~ dist 4
        for c in info.train_cameras:
            assert 3.0 < np.linalg.norm(c.camera_center) < 5.0


class TestCity:
    def _make(self, tmp_path, ocean=False):
        # reference layout: <root>/pose/block_all/transforms_{split}.json,
        # images at <root>/{split}/
        root = tmp_path / "city" / "pose" / "block_all"
        os.makedirs(root, exist_ok=True)
        for split in ("train", "test"):
            frames = []
            for i in range(4):
                name = f"{split}_{i:04d}.png"
                _write_img(str(tmp_path / "city" / split / name))
                frames.append(
                    {
                        "file_name": name,
                        "transform_matrix": _c2w(0.5 * i).tolist(),
                    }
                )
            d = {"camera_angle_x": 0.8, "frames": frames}
            with open(root / f"transforms_{split}.json", "w") as f:
                json.dump(d, f)
            if ocean:
                with open(root / f"transforms_{split}_ocean_info.json", "w") as f:
                    json.dump(
                        {
                            "frames": [
                                {"file_name": fr["file_name"], "is_ocean": i == 0}
                                for i, fr in enumerate(frames)
                            ]
                        },
                        f,
                    )
        write_ply_points(
            str(root / "point_cloud.ply"),
            np.random.RandomState(0).rand(50, 3).astype(np.float32),
            np.random.RandomState(1).rand(50, 3).astype(np.float32),
        )
        return str(root)

    def test_reads_both_splits(self, tmp_path):
        root = self._make(tmp_path)
        info = readers.read_city_scene(root, ply_path=os.path.join(root, "point_cloud.ply"))
        assert len(info.train_cameras) == 4 and len(info.test_cameras) == 4
        assert len(info.point_cloud.points) == 50
        cam = info.train_cameras[0]
        assert cam.width == 32 and cam.height == 24
        assert abs(cam.fovx - 0.8) < 1e-6
        # axes flip: camera center preserved through OpenGL->COLMAP conversion
        np.testing.assert_allclose(
            cam.camera_center, _c2w(0.0)[:3, 3], atol=1e-5
        )

    def test_ocean_mask_filters(self, tmp_path):
        root = self._make(tmp_path, ocean=True)
        info = readers.read_city_scene(
            root, ply_path=os.path.join(root, "point_cloud.ply"), ocean_mask=True
        )
        assert len(info.train_cameras) == 3  # frame 0 dropped


class TestBlender:
    def test_reads_and_composites(self, tmp_path):
        root = tmp_path / "lego"
        for split in ("train", "test"):
            frames = []
            for i in range(3):
                rel = f"./{split}/r_{i}"
                _write_img(str(root / split / f"r_{i}.png"), rgba=True)
                frames.append(
                    {"file_path": rel, "transform_matrix": _c2w(0.7 * i).tolist()}
                )
            with open(root / f"transforms_{split}.json", "w") as f:
                json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
        info = readers.read_blender_scene(str(root), white_background=True)
        assert len(info.train_cameras) == 3 and len(info.test_cameras) == 3
        assert info.point_cloud is not None  # random init

        # predecode composites transparent pixels onto white
        cache = str(tmp_path / "cache")
        w, h = predecode_dataset_to_disk(
            info.train_cameras, cache, num_workers=1, white_background=True
        )
        img = load_raw_image(cache, info.train_cameras[0].image_name, w, h)
        assert img[:, 0, 0].tolist() == [255, 255, 255]  # transparent -> white
        assert img[0, 12, 12] == 120  # opaque square keeps its color


class TestDetectSceneType:
    """Regression for the trajectory tool's City detection (it used to check
    <src>/train/transforms.json, a path no reader produces, so City sources
    fell through to the COLMAP reader and crashed)."""

    def test_city(self, tmp_path):
        root = TestCity()._make(tmp_path)
        assert readers.detect_scene_type(root) == "city"

    def test_blender(self, tmp_path):
        root = tmp_path / "lego"
        os.makedirs(root, exist_ok=True)
        frames = [{"file_path": "./train/r_0", "transform_matrix": _c2w(0).tolist()}]
        with open(root / "transforms_train.json", "w") as f:
            json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
        assert readers.detect_scene_type(str(root)) == "blender"

    def test_colmap(self, tmp_path):
        root = make_dataset(str(tmp_path / "scene"), n_cams=3)
        assert readers.detect_scene_type(root) == "colmap"


def test_dense_ply_file_overrides_init_points(tmp_path):
    """--dense_ply_file replaces the SfM sparse cloud as the init point set
    (readColmapSceneInfo, reference dataset_readers.py:221-225)."""
    root = make_dataset(str(tmp_path / "scene"))
    rng = np.random.RandomState(7)
    dense = str(tmp_path / "dense.ply")
    pts = rng.rand(333, 3).astype(np.float32)
    write_ply_points(dense, pts, rng.rand(333, 3).astype(np.float32))
    info = readers.read_colmap_scene(root, dense_ply_file=dense)
    assert len(info.point_cloud.points) == 333
    np.testing.assert_allclose(info.point_cloud.points, pts, atol=1e-6)
    assert info.ply_path == dense


class TestCityRealSchema:
    """Fixtures transcribed from the reference's MatrixCity parsing branches
    (dataset_readers.py:255-389): per-frame fl_x/fl_y intrinsics (no global
    camera_angle_x), transforms carrying subdirectory paths while the ocean
    file carries bare names (suffix match), length/suffix mismatches
    asserting, and missing image files skipped — the real-data schema
    variants the synthetic city generator never exercises."""

    def _make(self, tmp_path, per_frame_focal=False, subdir_names=False,
              n=4, ocean_names=None, ocean_len=None, drop_image=None):
        root = tmp_path / "city" / "pose" / "block_all"
        os.makedirs(root, exist_ok=True)
        frames = []
        for i in range(n):
            bare = f"{i:04d}.png"
            name = f"block_A/{bare}" if subdir_names else bare
            if drop_image is None or i != drop_image:
                _write_img(str(tmp_path / "city" / "train" / name))
            fr = {"file_name": name,
                  "transform_matrix": _c2w(0.5 * i).tolist()}
            if per_frame_focal:
                # focal in pixels, as real MatrixCity blocks provide
                # (fl_x = fl_y = 16 at w=32 -> fovx = 2*atan(1) = pi/2)
                fr["fl_x"] = 16.0
                fr["fl_y"] = 16.0
            frames.append(fr)
        d = {"frames": frames}
        if not per_frame_focal:
            d["camera_angle_x"] = 0.8
        with open(root / "transforms_train.json", "w") as f:
            json.dump(d, f)
        # test split: minimal single frame
        _write_img(str(tmp_path / "city" / "test" / "t_0000.png"))
        tf = {"camera_angle_x": 0.8,
              "frames": [{"file_name": "t_0000.png",
                          "transform_matrix": _c2w(1.0).tolist()}]}
        with open(root / "transforms_test.json", "w") as f:
            json.dump(tf, f)
        with open(root / "transforms_test_ocean_info.json", "w") as f:
            json.dump({"frames": [{"file_name": "t_0000.png",
                                   "is_ocean": False}]}, f)
        if ocean_names is not None or ocean_len is not None:
            names = ocean_names
            if names is None:
                names = [fr["file_name"].split("/")[-1] for fr in frames]
                names = names[:ocean_len]
            with open(root / "transforms_train_ocean_info.json", "w") as f:
                json.dump(
                    {"frames": [{"file_name": nm, "is_ocean": j == 0}
                                for j, nm in enumerate(names)]}, f)
        write_ply_points(
            str(root / "point_cloud.ply"),
            np.random.RandomState(0).rand(20, 3).astype(np.float32),
            np.random.RandomState(1).rand(20, 3).astype(np.float32),
        )
        return str(root)

    def test_per_frame_focal(self, tmp_path):
        root = self._make(tmp_path, per_frame_focal=True)
        info = readers.read_city_scene(
            root, ply_path=os.path.join(root, "point_cloud.ply"))
        cam = info.train_cameras[0]
        # fovx = 2*atan(w / (2*fl_x)) = 2*atan(1); fovy = 2*atan(h/(2*fl_y))
        assert abs(cam.fovx - 2 * np.arctan(32 / 32.0)) < 1e-6
        assert abs(cam.fovy - 2 * np.arctan(24 / 32.0)) < 1e-6

    def test_subdir_names_with_bare_ocean_names(self, tmp_path):
        root = self._make(tmp_path, subdir_names=True, ocean_len=4)
        info = readers.read_city_scene(
            root, ply_path=os.path.join(root, "point_cloud.ply"),
            ocean_mask=True)
        # frame 0 is ocean -> dropped; suffix match must accept
        # "block_A/0001.png".endswith("0001.png")
        assert len(info.train_cameras) == 3

    def test_ocean_length_mismatch_raises(self, tmp_path):
        root = self._make(tmp_path, ocean_len=3)
        with pytest.raises(AssertionError, match="ocean info"):
            readers.read_city_scene(
                root, ply_path=os.path.join(root, "point_cloud.ply"),
                ocean_mask=True)

    def test_ocean_name_mismatch_raises(self, tmp_path):
        root = self._make(
            tmp_path,
            ocean_names=["9999.png", "0001.png", "0002.png", "0003.png"])
        with pytest.raises(AssertionError, match="index 0"):
            readers.read_city_scene(
                root, ply_path=os.path.join(root, "point_cloud.ply"),
                ocean_mask=True)

    def test_missing_image_skipped(self, tmp_path):
        root = self._make(tmp_path, drop_image=2)
        info = readers.read_city_scene(
            root, ply_path=os.path.join(root, "point_cloud.ply"))
        assert len(info.train_cameras) == 3
        assert all("0002" not in c.image_name for c in info.train_cameras)
