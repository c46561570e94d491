"""Unit tests for SH eval, camera math, projection, and tile binning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clm_gs_tpu.data.cameras import (
    get_world2view,
    intrinsics_from_fov,
    stack_cameras,
)
from clm_gs_tpu.ops import sh as sh_ops
from clm_gs_tpu.ops.projection import fully_fused_projection, quat_scale_to_covar
from clm_gs_tpu.ops.tiles import isect_tiles
from clm_gs_tpu.utils.general import build_rotation, get_expon_lr_func
from tests.utils3d import make_camera, random_gaussians


class TestSH:
    def test_dc_only(self):
        """Degree 0: color = C0 * dc regardless of direction."""
        coeffs = np.zeros((4, 16, 3), np.float32)
        coeffs[:, 0, :] = 2.0
        dirs = np.random.RandomState(0).normal(size=(4, 3)).astype(np.float32)
        out = sh_ops.spherical_harmonics(0, jnp.asarray(dirs), jnp.asarray(coeffs))
        np.testing.assert_allclose(out, 2.0 * sh_ops.C0, rtol=1e-6)

    def test_degree_mask_zeroes_higher_bands(self):
        rng = np.random.RandomState(1)
        coeffs = rng.normal(size=(5, 16, 3)).astype(np.float32)
        dirs = rng.normal(size=(5, 3)).astype(np.float32)
        full = sh_ops.spherical_harmonics(3, dirs, coeffs)
        # manually zero bands > 1 and compare to active_degree=1
        c2 = coeffs.copy()
        c2[:, 4:, :] = 0
        deg1_manual = sh_ops.spherical_harmonics(3, dirs, c2)
        deg1 = sh_ops.spherical_harmonics(1, dirs, coeffs)
        np.testing.assert_allclose(deg1, deg1_manual, rtol=1e-5, atol=1e-6)
        assert not np.allclose(full, deg1)

    def test_rgb_sh_roundtrip(self):
        rgb = np.array([[0.2, 0.5, 0.9]], np.float32)
        np.testing.assert_allclose(
            sh_ops.sh_to_rgb(sh_ops.rgb_to_sh(rgb)), rgb, rtol=1e-6
        )

    def test_basis_is_orthogonal_on_sphere(self):
        """Monte-carlo orthonormality of the real SH basis (sanity of constants)."""
        rng = np.random.RandomState(2)
        d = rng.normal(size=(200000, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        B = np.asarray(sh_ops.sh_basis(jnp.asarray(d, jnp.float32)))
        gram = (B.T @ B) / d.shape[0] * (4 * np.pi)
        np.testing.assert_allclose(gram, np.eye(16), atol=0.15)


class TestCameraMath:
    def test_world2view_roundtrip(self):
        cam = make_camera(angle=0.7)
        vm = cam.viewmat
        # camera center maps to origin in view space
        center = cam.camera_center
        p = vm @ np.append(center, 1.0)
        np.testing.assert_allclose(p[:3], 0.0, atol=1e-5)

    def test_point_on_axis_projects_to_principal_point(self):
        cam = make_camera(width=64, height=48, angle=0.3)
        K = cam.K
        # a point straight ahead of the camera
        vm = cam.viewmat
        inv = np.linalg.inv(vm)
        p_world = (inv @ np.array([0, 0, 2.0, 1.0]))[:3]
        p_view = (vm @ np.append(p_world, 1.0))[:3]
        uv = K @ (p_view / p_view[2])
        np.testing.assert_allclose(uv[:2], [32.0, 24.0], atol=1e-4)

    def test_intrinsics_match_reference_formula(self):
        K = intrinsics_from_fov(0.8, 0.6, 640, 480)
        assert K[0, 2] == 320.0 and K[1, 2] == 240.0
        np.testing.assert_allclose(K[0, 0], 640 / (2 * np.tan(0.4)), rtol=1e-6)


class TestProjection:
    def _setup(self, n=64, seed=0):
        rng = np.random.RandomState(seed)
        xyz, log_scales, quats, _, _ = random_gaussians(n, rng)
        cams = [make_camera(uid=i, angle=0.5 * i) for i in range(3)]
        cb = stack_cameras(cams)
        return xyz, np.exp(log_scales), quats, cb

    def test_covar_psd(self):
        rng = np.random.RandomState(3)
        _, log_scales, quats, _, _ = random_gaussians(16, rng)
        cov = np.asarray(quat_scale_to_covar(jnp.asarray(quats), jnp.exp(log_scales)))
        eig = np.linalg.eigvalsh(cov)
        assert (eig > -1e-7).all()
        # determinant = product of squared scales
        np.testing.assert_allclose(
            np.linalg.det(cov), np.exp(log_scales).prod(1) ** 2, rtol=1e-3
        )

    def test_depths_and_centers(self):
        xyz, scales, quats, cb = self._setup()
        proj = fully_fused_projection(
            xyz, quats, scales, cb.viewmats, cb.Ks, cb.width, cb.height
        )
        # manual depth: z of viewmat @ p
        p = np.concatenate([xyz, np.ones((len(xyz), 1), np.float32)], 1)
        z_manual = np.einsum("cij,nj->cni", np.asarray(cb.viewmats), p)[:, :, 2]
        np.testing.assert_allclose(proj.depths, z_manual, rtol=1e-4, atol=1e-5)
        # visible gaussians project inside a (generous) screen bound
        vis = np.asarray(proj.radii) > 0
        assert vis.sum() > 0
        m2d = np.asarray(proj.means2d)
        assert (m2d[vis][:, 0] > -200).all() and (m2d[vis][:, 0] < 264).all()

    def test_isotropic_conic(self):
        """An isotropic gaussian at the image center has a diagonal conic."""
        xyz = np.array([[0.0, 0.0, 0.0]], np.float32)
        quats = np.array([[1.0, 0, 0, 0]], np.float32)
        scales = np.full((1, 3), 0.1, np.float32)
        cam = make_camera(width=64, height=64)
        cb = stack_cameras([cam])
        proj = fully_fused_projection(xyz, quats, scales, cb.viewmats, cb.Ks, 64, 64)
        conic = np.asarray(proj.conics)[0, 0]
        assert abs(conic[1]) < 1e-5 * abs(conic[0])
        np.testing.assert_allclose(conic[0], conic[2], rtol=1e-3)
        np.testing.assert_allclose(np.asarray(proj.means2d)[0, 0], [32, 32], atol=1e-3)

    def test_behind_camera_culled(self):
        cam = make_camera()
        cb = stack_cameras([cam])
        behind = cb.camera_centers[0] * 2.0  # past the camera, away from origin
        xyz = np.stack([np.zeros(3, np.float32), np.asarray(behind)])
        quats = np.tile([[1.0, 0, 0, 0]], (2, 1)).astype(np.float32)
        scales = np.full((2, 3), 0.1, np.float32)
        proj = fully_fused_projection(
            xyz, quats, scales, cb.viewmats, cb.Ks, cam.width, cam.height
        )
        radii = np.asarray(proj.radii)[0]
        assert radii[0] > 0 and radii[1] == 0

    def test_alive_mask(self):
        xyz, scales, quats, cb = self._setup()
        alive = np.zeros(len(xyz), bool)
        alive[:10] = True
        proj = fully_fused_projection(
            xyz, quats, scales, cb.viewmats, cb.Ks, cb.width, cb.height,
            alive=jnp.asarray(alive),
        )
        assert (np.asarray(proj.radii)[:, 10:] == 0).all()


class TestTiles:
    def test_single_gaussian_bbox(self):
        means2d = jnp.array([[24.0, 24.0]])
        radii = jnp.array([10.0])
        depths = jnp.array([1.0])
        res = isect_tiles(means2d, radii, depths, 16, 4, 3, isect_cap=64)
        # bbox covers tiles x in [0,3), y in [0,3) => 9 instances
        assert int(res.n_isects) == 9
        offs = np.asarray(res.tile_offsets)
        counts = np.diff(offs)
        expected = np.zeros(12, np.int64)
        for ty in range(3):
            for tx in range(3):
                expected[ty * 4 + tx] = 1
        np.testing.assert_array_equal(counts, expected)
        assert (np.asarray(res.gauss_ids)[: 9] == 0).all()

    def test_depth_order_within_tile(self):
        rng = np.random.RandomState(0)
        n = 40
        means2d = jnp.asarray(rng.uniform(0, 64, (n, 2)).astype(np.float32))
        radii = jnp.asarray(rng.uniform(2, 12, (n,)).astype(np.float32))
        depths = jnp.asarray(rng.uniform(0.5, 5.0, (n,)).astype(np.float32))
        res = isect_tiles(means2d, radii, depths, 16, 4, 4, isect_cap=1024)
        offs = np.asarray(res.tile_offsets)
        ids = np.asarray(res.gauss_ids)
        d = np.asarray(depths)
        for t in range(16):
            seg = ids[offs[t] : offs[t + 1]]
            assert (np.diff(d[seg]) >= 0).all(), f"tile {t} not depth sorted"

    def test_culled_excluded_and_overflow_counts(self):
        means2d = jnp.array([[8.0, 8.0], [8.0, 8.0]])
        radii = jnp.array([4.0, 0.0])
        depths = jnp.array([1.0, 0.5])
        res = isect_tiles(means2d, radii, depths, 16, 2, 2, isect_cap=16)
        assert int(res.n_isects) == 1
        assert np.asarray(res.gauss_ids)[0] == 0

    def test_matches_bruteforce(self):
        rng = np.random.RandomState(7)
        n = 30
        means2d = rng.uniform(-10, 70, (n, 2)).astype(np.float32)
        radii = rng.uniform(0, 15, (n,)).astype(np.float32)
        radii[::5] = 0
        depths = rng.uniform(0.1, 9, (n,)).astype(np.float32)
        tw, th, ts = 5, 4, 16
        res = isect_tiles(
            jnp.asarray(means2d), jnp.asarray(radii), jnp.asarray(depths),
            ts, tw, th, isect_cap=2048,
        )
        # brute force instance set
        want = set()
        for i in range(n):
            if radii[i] <= 0:
                continue
            x0 = int(np.clip(np.floor((means2d[i, 0] - radii[i]) / ts), 0, tw))
            x1 = int(np.clip(np.ceil((means2d[i, 0] + radii[i]) / ts), 0, tw))
            y0 = int(np.clip(np.floor((means2d[i, 1] - radii[i]) / ts), 0, th))
            y1 = int(np.clip(np.ceil((means2d[i, 1] + radii[i]) / ts), 0, th))
            for ty in range(y0, y1):
                for tx in range(x0, x1):
                    want.add((ty * tw + tx, i))
        got = set()
        offs = np.asarray(res.tile_offsets)
        ids = np.asarray(res.gauss_ids)
        for t in range(tw * th):
            for s in range(offs[t], offs[t + 1]):
                got.add((t, ids[s]))
        assert got == want


def test_expon_lr_schedule():
    f = get_expon_lr_func(1.6e-4, 1.6e-6, max_steps=30000)
    np.testing.assert_allclose(float(f(0)), 1.6e-4, rtol=1e-5)
    np.testing.assert_allclose(float(f(30000)), 1.6e-6, rtol=1e-5)
    np.testing.assert_allclose(float(f(15000)), np.sqrt(1.6e-4 * 1.6e-6), rtol=1e-4)
    assert float(f(-5)) == 0.0
