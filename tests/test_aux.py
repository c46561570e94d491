"""Auxiliary subsystem tests: SSIM, config, checkpoint, TSP, host Adam,
interval arithmetic, loggers."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from clm_gs_tpu.config import Config, init_config, load_config, parse_config, save_config
from clm_gs_tpu.ops.ssim import combined_loss, l1_loss, ssim
from clm_gs_tpu.utils.general import check_update_at_this_iter, next_capacity
from clm_gs_tpu.utils.native import HostAdam, find_tour


class TestSSIM:
    def test_identical_images(self):
        img = jnp.asarray(np.random.RandomState(0).rand(3, 40, 50).astype(np.float32))
        assert float(ssim(img, img)) > 0.9999

    def test_matches_reference_formula(self):
        """Compare against a direct numpy implementation of the reference's
        windowed SSIM (utils/loss_utils.py:26-85)."""
        rng = np.random.RandomState(1)
        a = rng.rand(3, 32, 36).astype(np.float32)
        b = np.clip(a + 0.1 * rng.randn(3, 32, 36), 0, 1).astype(np.float32)

        # reference formula, brute force per channel with same-padded conv
        xs = np.arange(11) - 5
        g = np.exp(-(xs**2) / (2 * 1.5**2))
        g /= g.sum()
        w = np.outer(g, g)

        def conv(img):
            out = np.zeros_like(img)
            pad = np.pad(img, ((0, 0), (5, 5), (5, 5)))
            for c in range(3):
                for i in range(img.shape[1]):
                    for j in range(img.shape[2]):
                        out[c, i, j] = (pad[c, i : i + 11, j : j + 11] * w).sum()
            return out

        mu1, mu2 = conv(a), conv(b)
        s1 = conv(a * a) - mu1**2
        s2 = conv(b * b) - mu2**2
        s12 = conv(a * b) - mu1 * mu2
        c1, c2 = 0.01**2, 0.03**2
        want = (
            ((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
            / ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))
        ).mean()
        got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_combined_loss_weights(self):
        a = jnp.asarray(np.random.RandomState(2).rand(3, 24, 24).astype(np.float32))
        b = jnp.zeros_like(a)
        want = 0.8 * float(l1_loss(a, b)) + 0.2 * (1 - float(ssim(a, b)))
        np.testing.assert_allclose(float(combined_loss(a, b)), want, rtol=1e-5)

    def test_differentiable(self):
        a = jnp.asarray(np.random.RandomState(3).rand(3, 24, 24).astype(np.float32))
        g = jax.grad(lambda x: combined_loss(x, jnp.zeros_like(x)))(a)
        assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).max()) > 0

    def test_pixelwise_masked_match_torch_reference(self):
        """pixelwise_l1_with_mask / pixelwise_ssim_with_mask vs a direct
        torch re-implementation of the reference formulas
        (utils/loss_utils.py:88-132): per-pixel maps, not reductions."""
        import torch
        import torch.nn.functional as Fc

        from clm_gs_tpu.ops.ssim import (
            pixelwise_l1_with_mask, pixelwise_ssim_with_mask,
        )

        rng = np.random.RandomState(4)
        a = rng.rand(3, 30, 34).astype(np.float32)
        b = np.clip(a + 0.1 * rng.randn(3, 30, 34), 0, 1).astype(np.float32)
        mask = (rng.rand(30, 34) > 0.4)

        got_l1 = np.asarray(
            pixelwise_l1_with_mask(jnp.asarray(a), jnp.asarray(b),
                                   jnp.asarray(mask.astype(np.float32)))
        )
        want_l1 = np.abs(a - b) * mask[None]
        np.testing.assert_allclose(got_l1, want_l1, atol=1e-7)

        # torch reference SSIM map (11x11 gaussian window, sigma 1.5,
        # zero same-padding, depthwise conv)
        xs = torch.arange(11, dtype=torch.float32) - 5
        g = torch.exp(-(xs ** 2) / (2 * 1.5 ** 2))
        g = g / g.sum()
        w = (g[:, None] @ g[None, :]).expand(3, 1, 11, 11).contiguous()
        ta, tb = torch.from_numpy(a)[None], torch.from_numpy(b)[None]

        def conv(x):
            return Fc.conv2d(x, w, padding=5, groups=3)

        mu1, mu2 = conv(ta), conv(tb)
        s1 = conv(ta * ta) - mu1 ** 2
        s2 = conv(tb * tb) - mu2 ** 2
        s12 = conv(ta * tb) - mu1 * mu2
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        want_ssim = (
            ((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
            / ((mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))
        )[0].numpy() * mask[None]
        got_ssim = np.asarray(
            pixelwise_ssim_with_mask(jnp.asarray(a), jnp.asarray(b),
                                     jnp.asarray(mask.astype(np.float32)))
        )
        np.testing.assert_allclose(got_ssim, want_ssim, atol=2e-5)


class TestConfig:
    def test_parse_and_roundtrip(self, tmp_path):
        cfg = parse_config(
            ["-s", "/data/x", "-m", "/out/y", "--clm_offload", "--bsz", "8",
             "--test_iterations", "5", "3", "--sparse_adam"]
        )
        assert cfg.model.source_path == "/data/x"
        assert cfg.strategy == "clm_offload"
        assert cfg.opt.bsz == 8
        assert cfg.aux.test_iterations == [3, 5]
        assert cfg.aux.sparse_adam
        p = str(tmp_path / "args.json")
        save_config(cfg, p)
        cfg2 = load_config(p)
        assert cfg2.opt.bsz == 8 and cfg2.aux.sparse_adam

    def test_exactly_one_strategy(self):
        import pytest

        cfg = Config()
        cfg.aux.no_offload = True
        cfg.aux.clm_offload = True
        with pytest.raises(ValueError):
            init_config(cfg)

    def test_default_strategy_is_clm(self):
        cfg = parse_config(["-s", "a", "-m", "b"])
        assert cfg.strategy == "clm_offload"


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from clm_gs_tpu.models.gaussians import create_from_pcd
        from clm_gs_tpu.optim import init_adam
        from clm_gs_tpu.utils.checkpoint import (
            latest_checkpoint,
            load_checkpoint,
            save_checkpoint,
        )

        rng = np.random.RandomState(0)
        state = create_from_pcd(rng.rand(50, 3), rng.rand(50, 3), capacity=64)
        opt = init_adam(state.params)
        opt = opt.__class__(
            mu=jax.tree.map(lambda x: x + 1.0, opt.mu), nu=opt.nu,
            steps=jnp.asarray(7.0),
        )
        key = jax.random.PRNGKey(3)
        save_checkpoint(str(tmp_path), 100, state, opt, key)
        path = latest_checkpoint(str(tmp_path))
        assert path.endswith("100")
        s2, o2, k2, it = load_checkpoint(path)
        assert it == 100
        assert float(o2.steps) == 7.0
        np.testing.assert_array_equal(
            np.asarray(state.params.xyz), np.asarray(s2.params.xyz)
        )
        np.testing.assert_array_equal(
            jax.random.key_data(key), jax.random.key_data(k2)
        )


class TestTSPAndIntervals:
    def test_tsp_ring(self):
        # points on a circle: optimal open path visits neighbors sequentially
        n = 12
        ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
        pts = np.stack([np.cos(ang), np.sin(ang)], 1)
        d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
        d = (d * 1000).astype(np.int32)
        tour = find_tour(d)
        cost = sum(d[tour[i], tour[i + 1]] for i in range(n - 1))
        ideal = (n - 1) * d[0, 1]
        assert cost <= ideal * 1.05

    def test_check_update_at_this_iter(self):
        # reference semantics: boundary k*interval falls inside [it, it+bsz)
        assert check_update_at_this_iter(100, 4, 100)
        assert check_update_at_this_iter(97, 4, 100)
        assert not check_update_at_this_iter(101, 4, 100)
        assert not check_update_at_this_iter(93, 4, 100)
        assert check_update_at_this_iter(3000, 64, 3000)

    def test_next_capacity_monotone_buckets(self):
        caps = {next_capacity(n) for n in range(1, 3_000_000, 37_111)}
        assert all(c % 65536 == 0 for c in caps)
        assert len(caps) < 15  # coarse lattice -> few recompiles


class TestHostAdamMore:
    def test_dense_matches_sparse_full(self):
        n, cols = 64, 48
        rng = np.random.RandomState(0)
        p1 = rng.randn(n, cols).astype(np.float32)
        g1 = rng.randn(n, cols).astype(np.float32)
        p2, g2 = p1.copy(), g1.copy()
        lr = np.full(cols, 0.01, np.float32)
        a1 = HostAdam(n, cols, lr)
        a2 = HostAdam(n, cols, lr)
        a1.dense_step(p1, g1, n, step=1)
        a2.sparse_step(p2, g2, np.arange(n, dtype=np.int32), step=1)
        np.testing.assert_allclose(p1, p2, rtol=1e-6)
        assert (g1 == 0).all() and (g2 == 0).all()

    def test_noncontiguous_grads(self):
        """The axon TPU client hands back 2-D device arrays as F-ordered
        zero-copy VIEWS (transposed strides); the native AVX2 kernel indexes
        raw row-major buffers, so un-normalized views silently garble every
        multi-column group (observed as a 10.7 dB naive_offload quality
        collapse). sparse_step must yield identical updates for C-ordered and
        F-ordered gradient inputs."""
        n, cols = 96, 3
        rng = np.random.RandomState(1)
        g_c = rng.randn(n, cols).astype(np.float32)
        g_f = np.asfortranarray(g_c)
        assert not g_f.flags["C_CONTIGUOUS"]
        lr = np.full(cols, 0.01, np.float32)
        idx = np.arange(0, n, 2, dtype=np.int32)
        p1 = rng.randn(n, cols).astype(np.float32)
        p2 = p1.copy()
        a1, a2 = HostAdam(n, cols, lr), HostAdam(n, cols, lr)
        a1.sparse_step(p1, g_c.copy(), idx, grad_scale=0.25, step=1)
        a2.sparse_step(p2, g_f, idx, grad_scale=0.25, step=1)
        np.testing.assert_array_equal(p1, p2)
        assert (g_f[idx] == 0).all()  # version=3 zeroing replayed on views


class TestDebugAndCams:
    def test_dump_and_compare(self, tmp_path):
        from clm_gs_tpu.utils.debug import compare_dumps, dump_arrays, dump_image_txt

        img = np.random.RandomState(0).rand(3, 8, 8).astype(np.float32)
        dump_image_txt(str(tmp_path / "img.txt"), img)
        assert (tmp_path / "img_c0.txt").exists()
        dump_arrays(str(tmp_path / "a.npz"), img=img, x=np.ones(3))
        dump_arrays(str(tmp_path / "b.npz"), img=img + 1e-3, x=np.ones(3))
        diffs = compare_dumps(str(tmp_path / "a.npz"), str(tmp_path / "b.npz"))
        assert "img" in diffs and "x" not in diffs

    def test_nudge_camera(self):
        from clm_gs_tpu.data.cameras import nudge_camera
        from tests.utils3d import make_camera

        cam = make_camera(angle=0.5)
        moved = nudge_camera(cam, dz=1.0)
        # moving forward along view axis decreases distance to origin
        assert np.linalg.norm(moved.camera_center) < np.linalg.norm(cam.camera_center)
        # orientation unchanged
        np.testing.assert_allclose(moved.viewmat[:3, :3], cam.viewmat[:3, :3], atol=1e-6)

    def test_minicam(self):
        from clm_gs_tpu.data.cameras import MiniCam
        from tests.utils3d import make_camera

        cam = make_camera()
        mini = MiniCam(cam.width, cam.height, cam.fovx, cam.fovy, cam.viewmat)
        np.testing.assert_allclose(mini.K, cam.K, rtol=1e-6)
        np.testing.assert_allclose(mini.camera_center, cam.camera_center, atol=1e-5)


def test_native_classify_matches_searchsorted():
    """csrc classify_sorted must reproduce the numpy searchsorted merge
    bit-for-bit (H/D/G retention split, clm_offload._classify_transition)."""
    import numpy as np

    from clm_gs_tpu.utils import native

    if not native.have_native_adam():
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(11)
    for na, nb in [(0, 5), (5, 0), (0, 0), (1000, 1300), (4096, 4096)]:
        a = np.sort(rng.choice(10_000, size=na, replace=False)).astype(np.int64)
        b = np.sort(rng.choice(10_000, size=nb, replace=False)).astype(np.int64)
        out = native.classify_sorted(a, b)
        assert out is not None
        pd, pn, gp, hn = out
        # reference merge
        if nb:
            loc = np.searchsorted(b, a)
            locc = np.minimum(loc, nb - 1)
            common = b[locc] == a if na else np.zeros(0, bool)
        else:
            loc = np.zeros(na, np.int64)
            common = np.zeros(na, bool)
        rpd = np.nonzero(common)[0]
        rpn = loc[rpd]
        rgp = np.nonzero(~common)[0]
        mask = np.zeros(nb, bool)
        mask[rpn] = True
        rhn = np.nonzero(~mask)[0]
        np.testing.assert_array_equal(pd, rpd)
        np.testing.assert_array_equal(pn, rpn)
        np.testing.assert_array_equal(gp, rgp)
        np.testing.assert_array_equal(hn, rhn)


def test_native_finish_set_primitives():
    """counting_sort_perm + nonzero_stamp vs numpy (finish-set fast path)."""
    import numpy as np

    from clm_gs_tpu.utils import native

    if not native.have_native_adam():
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(2)
    keys = rng.randint(0, 17, 100_001).astype(np.int16)
    out = native.counting_sort_perm(keys, 17)
    assert out is not None
    perm, counts = out
    np.testing.assert_array_equal(perm, np.argsort(keys, kind="stable"))
    np.testing.assert_array_equal(counts, np.bincount(keys, minlength=17))

    last_use = rng.randint(-1, 8, 300_001).astype(np.int16)
    alive = rng.rand(300_001) < 0.5
    vis = native.nonzero_stamp(last_use, None, 0)
    np.testing.assert_array_equal(vis, np.nonzero(last_use >= 0)[0])
    nev = native.nonzero_stamp(last_use, alive, 1)
    np.testing.assert_array_equal(
        nev, np.nonzero((last_use == -1) & alive)[0]
    )
