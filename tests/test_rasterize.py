"""Rasterizer tests: oracle semantics, Pallas-vs-oracle parity, gradients."""

import jax
import os
import jax.numpy as jnp
import numpy as np
import pytest

from clm_gs_tpu.data.cameras import stack_cameras
from clm_gs_tpu.ops import sh as sh_ops
from clm_gs_tpu.ops.projection import fully_fused_projection
from clm_gs_tpu.ops.rasterize import rasterize
from clm_gs_tpu.ops.rasterize_ref import rasterize_reference
from tests.utils3d import make_camera, random_gaussians


def _projected_scene(n=80, width=64, height=48, seed=0, angle=0.4):
    rng = np.random.RandomState(seed)
    xyz, log_scales, quats, opacity_logits, sh = random_gaussians(n, rng)
    cam = make_camera(width=width, height=height, angle=angle)
    cb = stack_cameras([cam])
    proj = fully_fused_projection(
        jnp.asarray(xyz), jnp.asarray(quats), jnp.exp(log_scales),
        cb.viewmats, cb.Ks, width, height,
    )
    colors = jnp.maximum(
        sh_ops.spherical_harmonics(
            3, jnp.asarray(xyz) - cb.camera_centers[0], jnp.asarray(sh)
        )
        + 0.5,
        0.0,
    )
    opac = jax.nn.sigmoid(jnp.asarray(opacity_logits))
    return (
        proj.means2d[0], proj.conics[0], colors, opac,
        proj.depths[0], proj.radii[0], width, height,
    )


BG = jnp.array([0.1, 0.2, 0.3], jnp.float32)


class TestOracle:
    def test_empty_scene_is_background(self):
        m2d, conics, colors, opac, depths, radii, w, h = _projected_scene()
        img, alpha = rasterize_reference(
            m2d, conics, colors, opac * 0.0, depths, radii * 0.0, w, h, BG
        )
        np.testing.assert_allclose(
            np.asarray(img), np.asarray(BG)[:, None, None] * np.ones((3, h, w)),
            atol=1e-6,
        )
        np.testing.assert_allclose(np.asarray(alpha), 0.0, atol=1e-7)

    def test_single_opaque_gaussian_center(self):
        """A high-opacity gaussian at a known pixel dominates that pixel."""
        m2d = jnp.array([[32.5, 24.5]])  # exactly on the pixel center
        conics = jnp.array([[0.05, 0.0, 0.05]])
        colors = jnp.array([[1.0, 0.0, 0.0]])
        opac = jnp.array([0.99])
        depths = jnp.array([1.0])
        radii = jnp.array([30.0])
        img, alpha = rasterize_reference(m2d, conics, colors, opac, depths, radii, 64, 48, BG)
        img = np.asarray(img)
        # center pixel: alpha ~= 0.99 -> mostly red
        assert img[0, 24, 32] > 0.95
        assert img[1, 24, 32] < 0.05
        a = np.asarray(alpha)
        np.testing.assert_allclose(a[24, 32], 0.99, atol=5e-3)

    def test_front_to_back_ordering(self):
        """Occlusion: the nearer of two coincident gaussians dominates."""
        m2d = jnp.array([[16.0, 16.0], [16.0, 16.0]])
        conics = jnp.tile(jnp.array([[0.5, 0.0, 0.5]]), (2, 1))
        colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        opac = jnp.array([0.9, 0.9])
        radii = jnp.array([10.0, 10.0])
        img1, _ = rasterize_reference(
            m2d, conics, colors, opac, jnp.array([1.0, 2.0]), radii, 32, 32, BG
        )
        img2, _ = rasterize_reference(
            m2d, conics, colors, opac, jnp.array([2.0, 1.0]), radii, 32, 32, BG
        )
        assert np.asarray(img1)[0, 16, 16] > 0.75  # red in front
        assert np.asarray(img2)[1, 16, 16] > 0.75  # green in front
        assert np.asarray(img1)[1, 16, 16] < 0.2  # green occluded
        assert np.asarray(img2)[0, 16, 16] < 0.2  # red occluded

    def test_transmittance_termination(self):
        """Many stacked opaque gaussians: pixel saturates, later ones ignored."""
        n = 30
        m2d = jnp.tile(jnp.array([[8.0, 8.0]]), (n, 1))
        conics = jnp.tile(jnp.array([[0.8, 0.0, 0.8]]), (n, 1))
        colors = jnp.ones((n, 3)) * jnp.linspace(1, 0, n)[:, None]
        opac = jnp.full((n,), 0.95)
        depths = jnp.arange(1, n + 1, dtype=jnp.float32)
        radii = jnp.full((n,), 8.0)
        img, alpha = rasterize_reference(m2d, conics, colors, opac, depths, radii, 16, 16, BG)
        assert float(alpha[8, 8]) > 0.999
        # early (bright) gaussians dominate
        assert float(img[0, 8, 8]) > 0.9


def _maybe_interpret():
    """Pallas kernels only run compiled on TPU; elsewhere use the interpreter."""
    return jax.default_backend() != "tpu"


@pytest.fixture
def exact_grad_regroup(monkeypatch):
    """Pin the bit-exact (unpacked) grad-regroup path. The gate is read at
    TRACE time inside the module-level jitted rasterize, so traces must be
    dropped on BOTH edges — otherwise a later same-shape test silently reuses
    the exact-path trace after monkeypatch restores the default-on env."""
    monkeypatch.setenv("CLMGS_PACK_GRADS", "0")
    jax.clear_caches()
    yield
    jax.clear_caches()


class TestPallasVsOracle:
    @pytest.mark.parametrize("seed,angle", [(0, 0.4), (1, 1.2), (2, 2.5)])
    def test_forward_matches_oracle(self, seed, angle):
        m2d, conics, colors, opac, depths, radii, w, h = _projected_scene(
            seed=seed, angle=angle
        )
        ref_img, ref_alpha = rasterize_reference(
            m2d, conics, colors, opac, depths, radii, w, h, BG
        )
        img, alpha, n_isects = rasterize(
            m2d, conics, colors, opac, depths, radii, w, h, BG, isect_cap=4096
        )
        assert int(n_isects) > 0
        np.testing.assert_allclose(np.asarray(img), np.asarray(ref_img), atol=2e-5)
        np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref_alpha), atol=2e-5)

    def test_grad_matches_oracle(self, exact_grad_regroup):
        # pin the bit-exact regroup path: the oracle comparison is the proof
        # of the hand-derived backward math, independent of the (default-on)
        # bf16 payload packing that test_packed_grad_regroup bounds separately
        m2d, conics, colors, opac, depths, radii, w, h = _projected_scene(seed=3)
        target = jnp.zeros((3, h, w))

        def loss_pallas(m2d, conics, colors, opac, bg):
            img, _, _ = rasterize(
                m2d, conics, colors, opac, depths, radii, w, h, bg, isect_cap=4096
            )
            return jnp.sum((img - target) ** 2)

        def loss_ref(m2d, conics, colors, opac, bg):
            img, _ = rasterize_reference(
                m2d, conics, colors, opac, depths, radii, w, h, bg
            )
            return jnp.sum((img - target) ** 2)

        args = (m2d, conics, colors, opac, BG)
        g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(*args)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
        names = ["means2d", "conics", "colors", "opacities", "background"]
        for name, gp, gr in zip(names, g_pallas, g_ref):
            gp, gr = np.asarray(gp), np.asarray(gr)
            scale = max(np.abs(gr).max(), 1e-3)
            np.testing.assert_allclose(
                gp / scale, gr / scale, atol=5e-4, err_msg=f"grad mismatch: {name}"
            )

    def test_grad_finite_differences(self):
        """Spot-check the hand-derived backward against central differences."""
        m2d, conics, colors, opac, depths, radii, w, h = _projected_scene(
            n=20, width=32, height=32, seed=4
        )

        def loss(opac):
            img, _, _ = rasterize(
                m2d, conics, colors, opac, depths, radii, w, h, BG, isect_cap=2048
            )
            return jnp.sum(img * jnp.cos(jnp.arange(img.size).reshape(img.shape)))

        g = np.asarray(jax.grad(loss)(opac))
        eps = 1e-3
        rng = np.random.RandomState(0)
        # alpha/termination thresholds make the loss piecewise; allow one
        # sampled index to straddle a discontinuity.
        misses = 0
        for i in rng.choice(len(np.asarray(opac)), 6, replace=False):
            e = np.zeros_like(np.asarray(opac))
            e[i] = eps
            fd = (float(loss(opac + e)) - float(loss(opac - e))) / (2 * eps)
            if not np.isclose(g[i], fd, rtol=0.07, atol=2e-3):
                misses += 1
        assert misses <= 1, f"{misses} finite-difference mismatches"

    def test_overflow_capacity_still_renders(self):
        """isect_cap smaller than the true instance count: renders, reports."""
        m2d, conics, colors, opac, depths, radii, w, h = _projected_scene(seed=0)
        img, _, n_isects = rasterize(
            m2d, conics, colors, opac, depths, radii, w, h, BG, isect_cap=64
        )
        assert int(n_isects) > 64
        assert np.isfinite(np.asarray(img)).all()

    def test_grad_deep_stack_early_termination(self, exact_grad_regroup):
        """Hundreds of near-opaque gaussians piled on a few tiles: every tile
        terminates well before its last K-chunk, so the backward's dead-chunk
        compaction (live-prefix grid + never-visited grad-block masking) is
        on the hot path. Gradients must still match the oracle exactly —
        post-termination instances get zero gradient in both."""
        n = 700  # >> K instances per tile -> multiple chunks
        rng = np.random.RandomState(7)
        w, h = 64, 48
        # broad splats spread over the whole image: every pixel is covered by
        # many near-opaque instances, so every tile's pixels all saturate
        # within the first chunk while owning 2-3 chunks of instances
        m2d = jnp.asarray(
            np.stack([rng.rand(n) * w, rng.rand(n) * h], 1), jnp.float32
        )
        conics = jnp.tile(jnp.array([[0.02, 0.0, 0.02]], jnp.float32), (n, 1))
        colors = jnp.asarray(rng.rand(n, 3), jnp.float32)
        opac = jnp.asarray(0.6 + 0.39 * rng.rand(n), jnp.float32)
        depths = jnp.asarray(1.0 + rng.rand(n), jnp.float32)
        radii = jnp.full((n,), 30.0, jnp.float32)
        target = jnp.zeros((3, h, w))

        def loss(fn, m2d, colors, opac, bg):
            out = fn(m2d, conics, colors, opac, depths, radii, w, h, bg)
            return jnp.sum((out[0] - target) ** 2)

        gp = jax.grad(
            lambda *a: loss(
                lambda *r: rasterize(*r, isect_cap=16384), *a
            ),
            argnums=(0, 1, 2, 3),
        )(m2d, colors, opac, BG)
        gr = jax.grad(
            lambda *a: loss(rasterize_reference, *a), argnums=(0, 1, 2, 3)
        )(m2d, colors, opac, BG)
        for name, a, b in zip(["means2d", "colors", "opac", "bg"], gp, gr):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(b).max(), 1e-3)
            np.testing.assert_allclose(
                a / scale, b / scale, atol=5e-4, err_msg=f"grad mismatch: {name}"
            )
        # sanity: termination actually kicked in (grads of deep instances 0)
        order = np.argsort(np.asarray(depths))
        assert np.abs(np.asarray(gp[2])[order[-50:]]).max() == 0.0


class TestGolden:
    """Golden-image regression: any semantic drift in the render pipeline
    (projection constants, compositing thresholds, SH basis) breaks this."""

    def test_golden_render_stats(self):
        m2d, conics, colors, opac, depths, radii, w, h = _projected_scene(
            n=80, width=64, height=48, seed=11, angle=0.9
        )
        img, alpha, _ = rasterize(
            m2d, conics, colors, opac, depths, radii, w, h, BG, isect_cap=8192
        )
        img = np.asarray(img)
        # frozen statistics of the reference implementation (regenerate only
        # with a deliberate, justified semantics change)
        stats = np.array(
            [img.mean(), img.std(), img[:, ::7, ::11].sum(), np.asarray(alpha).mean()]
        )
        golden_path = os.path.join(os.path.dirname(__file__), "golden_render.npy")
        if not os.path.exists(golden_path):
            np.save(golden_path, stats)
        golden = np.load(golden_path)
        np.testing.assert_allclose(stats, golden, rtol=1e-4, atol=1e-5)


def test_packed_grad_regroup_close_to_exact(monkeypatch):
    """CLMGS_PACK_GRADS=1 rides the per-gaussian grad-regroup sort with bf16
    pair-packed payloads (6 sorted operands instead of 10). Gradients must
    stay within bf16 rounding (~0.4% relative) of the exact path."""
    m2d, conics, colors, opac, depths, radii, w, h = _projected_scene(seed=5)
    target = jnp.zeros((3, h, w))

    def loss(m2d, conics, colors, opac):
        img, _, _ = rasterize(
            m2d, conics, colors, opac, depths, radii, w, h, BG, isect_cap=4096
        )
        return jnp.sum((img - target) ** 2)

    monkeypatch.setenv("CLMGS_PACK_GRADS", "0")
    jax.clear_caches()  # env is read at trace time
    g_exact = jax.grad(loss, argnums=(0, 1, 2, 3))(m2d, conics, colors, opac)
    monkeypatch.setenv("CLMGS_PACK_GRADS", "1")
    jax.clear_caches()
    g_packed = jax.grad(loss, argnums=(0, 1, 2, 3))(m2d, conics, colors, opac)
    monkeypatch.delenv("CLMGS_PACK_GRADS")
    jax.clear_caches()
    for name, gp, ge in zip(["means2d", "conics", "colors", "opac"],
                            g_packed, g_exact):
        gp, ge = np.asarray(gp), np.asarray(ge)
        scale = max(np.abs(ge).max(), 1e-3)
        np.testing.assert_allclose(
            gp / scale, ge / scale, atol=8e-3, err_msg=f"packed grads: {name}"
        )


def test_mxu_geom_close_to_exact(monkeypatch):
    """CLMGS_MXU_GEOM=1 computes sigma as a tile-local rank-6 bilinear form on
    the MXU and the conic/mean gradients via pixel-monomial moments. Forward
    image and gradients must stay within f32-reassociation tolerance of the
    direct dx/dy path."""
    m2d, conics, colors, opac, depths, radii, w, h = _projected_scene(seed=7)
    target = jnp.zeros((3, h, w))

    def loss(m2d, conics, colors, opac):
        img, _, _ = rasterize(
            m2d, conics, colors, opac, depths, radii, w, h, BG, isect_cap=4096
        )
        return jnp.sum((img - target) ** 2), img

    (l_e, img_e), g_exact = jax.value_and_grad(
        loss, argnums=(0, 1, 2, 3), has_aux=True
    )(m2d, conics, colors, opac)
    monkeypatch.setenv("CLMGS_MXU_GEOM", "1")
    jax.clear_caches()  # env is read at trace time
    (l_m, img_m), g_mxu = jax.value_and_grad(
        loss, argnums=(0, 1, 2, 3), has_aux=True
    )(m2d, conics, colors, opac)
    monkeypatch.delenv("CLMGS_MXU_GEOM")
    jax.clear_caches()
    np.testing.assert_allclose(
        np.asarray(img_m), np.asarray(img_e), atol=2e-4,
        err_msg="mxu-geom forward image",
    )
    for name, gm, ge in zip(["means2d", "conics", "colors", "opac"],
                            g_mxu, g_exact):
        gm, ge = np.asarray(gm), np.asarray(ge)
        scale = max(np.abs(ge).max(), 1e-3)
        np.testing.assert_allclose(
            gm / scale, ge / scale, atol=2e-3, err_msg=f"mxu-geom grads: {name}"
        )


def test_tile_cull_bit_exact(monkeypatch):
    """CLMGS_TILE_CULL=1 demotes instances whose in-tile max alpha is below
    the kernel's 1/255 threshold to dummies. Those rows contribute exactly
    zero to compositing (alpha == 0 => om == 1.0) and are grad_ok-masked in
    the backward; the only numeric effect is reassociation inside the chunk
    reduction trees (kept rows shift lanes), so forward image and gradients
    must agree to ~1 ulp while the kept instance count actually drops."""
    m2d, conics, colors, opac, depths, radii, w, h = _projected_scene(
        n=120, seed=11
    )
    target = jnp.zeros((3, h, w))

    def loss(m2d, conics, colors, opac):
        img, _, _ = rasterize(
            m2d, conics, colors, opac, depths, radii, w, h, BG, isect_cap=4096
        )
        return jnp.sum((img - target) ** 2), img

    (l_e, img_e), g_exact = jax.value_and_grad(
        loss, argnums=(0, 1, 2, 3), has_aux=True
    )(m2d, conics, colors, opac)
    monkeypatch.setenv("CLMGS_TILE_CULL", "1")
    jax.clear_caches()  # env is read at trace time
    (l_c, img_c), g_cull = jax.value_and_grad(
        loss, argnums=(0, 1, 2, 3), has_aux=True
    )(m2d, conics, colors, opac)
    monkeypatch.delenv("CLMGS_TILE_CULL")
    jax.clear_caches()
    np.testing.assert_allclose(
        np.asarray(img_c), np.asarray(img_e), atol=5e-7, rtol=0
    )
    for name, gc, ge in zip(["means2d", "conics", "colors", "opac"],
                            g_cull, g_exact):
        gc, ge = np.asarray(gc), np.asarray(ge)
        scale = max(np.abs(ge).max(), 1e-3)
        np.testing.assert_allclose(
            gc / scale, ge / scale, atol=1e-5,
            err_msg=f"tile-cull grads: {name}",
        )


def test_tile_cull_kept_counts_consistent(monkeypatch):
    """The culled binning's counts must (a) sum consistently with its
    per-gaussian counts_orig and (b) never exceed the uncull counts."""
    from clm_gs_tpu.ops.tiles import isect_tiles_aligned, tight_extents

    m2d, conics, colors, opac, depths, radii, w, h = _projected_scene(
        n=150, seed=3
    )
    tw, th = -(-w // 32), -(-h // 16)
    ext = tight_extents(conics, opac, radii)
    base = isect_tiles_aligned(
        m2d, radii, depths, (32, 16), tw, th, 4096, 256, extents=ext
    )
    culled = isect_tiles_aligned(
        m2d, radii, depths, (32, 16), tw, th, 4096, 256, extents=ext,
        cull=(conics, opac),
    )
    kept_t = np.asarray(culled.counts)
    base_t = np.asarray(base.counts)
    assert (kept_t <= base_t).all()
    assert kept_t.sum() < base_t.sum()  # some instances actually culled
    assert kept_t.sum() == np.asarray(culled.counts_orig).sum()
    # layout (starts / ids buffer size) unchanged
    np.testing.assert_array_equal(
        np.asarray(culled.starts), np.asarray(base.starts)
    )
    assert culled.ids.shape == base.ids.shape
    # every kept id appears in the same tile segment as in the base layout,
    # in the same relative (depth) order
    starts = np.asarray(base.starts)
    for t in range(tw * th):
        seg_b = np.asarray(base.ids[starts[t]:starts[t + 1]])
        seg_c = np.asarray(culled.ids[starts[t]:starts[t + 1]])
        kept = seg_c[seg_c >= 0]
        assert len(kept) == kept_t[t]
        # kept sequence is a subsequence of the base segment's reals
        reals_b = seg_b[seg_b >= 0].tolist()
        it = iter(reals_b)
        assert all(any(x == y for y in it) for x in kept.tolist())


def test_tile_min_sigma_lower_bounds_grid():
    """Property: the analytic rectangle minimum of sigma must lower-bound the
    minimum over every pixel center in the rectangle (this is what makes the
    cull conservative), for PSD and degenerate/indefinite conics alike."""
    from clm_gs_tpu.ops.tiles import _tile_min_sigma

    rng = np.random.RandomState(0)
    n = 4096
    # mix of well-conditioned PSD, near-degenerate, and indefinite conics
    a = rng.uniform(0.001, 2.0, n).astype(np.float32)
    c = rng.uniform(0.001, 2.0, n).astype(np.float32)
    b = rng.uniform(-1.5, 1.5, n).astype(np.float32) * np.sqrt(a * c)
    a[::7] = 1e-9  # degenerate
    b[::11] *= 3.0  # indefinite
    # mean-relative pixel-center bounds of a 32x16 tile at random offsets
    lx0 = rng.uniform(-64, 64, n).astype(np.float32)
    ly0 = rng.uniform(-64, 64, n).astype(np.float32)
    lx1, ly1 = lx0 + 31.0, ly0 + 15.0
    smin = np.asarray(
        _tile_min_sigma(
            jnp.asarray(lx0), jnp.asarray(lx1), jnp.asarray(ly0),
            jnp.asarray(ly1), jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
        )
    )
    gx = lx0[:, None, None] + np.arange(32, dtype=np.float32)[None, :, None]
    gy = ly0[:, None, None] + np.arange(16, dtype=np.float32)[None, None, :]
    grid = (
        0.5 * (a[:, None, None] * gx * gx + c[:, None, None] * gy * gy)
        + b[:, None, None] * gx * gy
    ).reshape(n, -1).min(axis=1)
    # allow fp slack well inside the cull margin (1e-2)
    assert (smin <= grid + 1e-3 + 1e-6 * np.abs(grid)).all()


def test_block_scan_close_to_exact(monkeypatch):
    """CLMGS_BLOCK_SCAN=1 re-associates the in-kernel cumulative
    product/sum chains (two-level 32-row blocked scan); forward image and
    gradients must stay within f32-reassociation tolerance."""
    m2d, conics, colors, opac, depths, radii, w, h = _projected_scene(seed=5)
    target = jnp.zeros((3, h, w))

    def loss(m2d, conics, colors, opac):
        img, _, _ = rasterize(
            m2d, conics, colors, opac, depths, radii, w, h, BG, isect_cap=4096
        )
        return jnp.sum((img - target) ** 2), img

    (l_e, img_e), g_exact = jax.value_and_grad(
        loss, argnums=(0, 1, 2, 3), has_aux=True
    )(m2d, conics, colors, opac)
    monkeypatch.setenv("CLMGS_BLOCK_SCAN", "1")
    jax.clear_caches()  # env is read at trace time
    (l_b, img_b), g_blk = jax.value_and_grad(
        loss, argnums=(0, 1, 2, 3), has_aux=True
    )(m2d, conics, colors, opac)
    monkeypatch.delenv("CLMGS_BLOCK_SCAN")
    jax.clear_caches()
    np.testing.assert_allclose(
        np.asarray(img_b), np.asarray(img_e), atol=1e-6, rtol=0
    )
    for name, gb, ge in zip(["means2d", "conics", "colors", "opac"],
                            g_blk, g_exact):
        gb, ge = np.asarray(gb), np.asarray(ge)
        scale = max(np.abs(ge).max(), 1e-3)
        np.testing.assert_allclose(
            gb / scale, ge / scale, atol=1e-5,
            err_msg=f"block-scan grads: {name}",
        )


def test_tile_cull_overflow_consistent(monkeypatch):
    """When true instance demand exceeds isect_cap (the adaptive-growth step
    still renders from the truncated buffer), the culled binning must stay
    internally consistent: kept counts within layout segments, n_isects
    reporting true (bbox) demand, and the render finishing without error."""
    from clm_gs_tpu.ops.tiles import isect_tiles_aligned, tight_extents

    from clm_gs_tpu.ops.rasterize import ALIGN, TILE_H, TILE_W

    m2d, conics, colors, opac, depths, radii, w, h = _projected_scene(
        n=300, seed=13
    )
    # the reference binning must use rasterize's own tile geometry so the
    # end-to-end n_isects comparison below is apples-to-apples
    tw, th = -(-w // TILE_W), -(-h // TILE_H)
    ext = tight_extents(conics, opac, radii)
    small_cap = 256  # force overflow
    base = isect_tiles_aligned(
        m2d, radii, depths, (TILE_W, TILE_H), tw, th, small_cap, ALIGN,
        extents=ext,
    )
    culled = isect_tiles_aligned(
        m2d, radii, depths, (TILE_W, TILE_H), tw, th, small_cap, ALIGN,
        extents=ext, cull=(conics, opac),
    )
    assert int(base.n_isects) > small_cap  # overflow actually happened
    assert int(culled.n_isects) == int(base.n_isects)
    seg = np.diff(np.asarray(culled.starts))
    assert (np.asarray(culled.counts) <= seg).all()
    assert (np.asarray(culled.counts) <= np.asarray(base.counts)).all()
    # end-to-end render at the overflowing cap still runs under the gate
    monkeypatch.setenv("CLMGS_TILE_CULL", "1")
    jax.clear_caches()
    img, alpha, n = rasterize(
        m2d, conics, colors, opac, depths, radii, w, h, BG, isect_cap=small_cap
    )
    monkeypatch.delenv("CLMGS_TILE_CULL")
    jax.clear_caches()
    assert np.isfinite(np.asarray(img)).all()
    assert int(n) == int(base.n_isects)


def test_mxu_geom_peak_pixel_not_dropped(monkeypatch):
    """Regression: the expanded bilinear sigma can round slightly negative at
    a splat's PEAK pixel (true sigma ~ 0) under f32 cancellation; the ok
    mask's sigma >= 0 guard must not zero the brightest pixel (snap tol)."""
    # elongated rotated conic with the mean just off a pixel center
    m2d = jnp.array([[27.49, 2.43]])
    conics = jnp.array([[0.145, -0.0158, 0.00174]])
    colors = jnp.array([[1.0, 0.0, 0.0]])
    opac = jnp.array([0.95])
    depths = jnp.array([1.0])
    radii = jnp.array([200])
    w, h = 64, 48

    def render():
        img, _, _ = rasterize(
            m2d, conics, colors, opac, depths, radii, w, h, BG,
            isect_cap=4096,
        )
        return np.asarray(img)

    img_e = render()
    monkeypatch.setenv("CLMGS_MXU_GEOM", "1")
    jax.clear_caches()
    img_m = render()
    monkeypatch.delenv("CLMGS_MXU_GEOM")
    jax.clear_caches()
    # the peak pixel must render the splat in both paths
    py, px = 2, 27
    assert img_e[0, py, px] > 0.9
    np.testing.assert_allclose(img_m, img_e, atol=1e-2)


def test_forward_fill_pallas_matches_xla_fill():
    """The Pallas VMEM forward-fill (the TPU-path replacement for the blocked
    XLA doubling in ops/tiles._forward_fill) is semantically identical:
    rightmost-valid fill with validity = channel 0 nonzero, zeros before the
    first valid slot. Interpret mode here; chip parity is validated by
    tools/fill_probe.py and the oracle render tests."""
    from clm_gs_tpu.ops.fill_pallas import forward_fill_pallas

    rng = np.random.default_rng(7)
    for n in (777, 4096, 200_000):
        # leading invalid prefix: first 50 slots forced invalid
        a = rng.integers(0, 4, size=n).astype(np.int32)
        a[:50] = 0
        b = rng.integers(-(1 << 20), 1 << 20, size=n).astype(np.int32)
        c = rng.integers(0, 1 << 20, size=n).astype(np.int32)
        out = forward_fill_pallas(tuple(map(jnp.asarray, (a, b, c))))
        # independent numpy oracle: rightmost-valid fill, validity = a != 0
        valid = a != 0
        for ch, got in zip((a, b, c), out):
            exp = np.zeros_like(ch)
            for i in range(n):
                if valid[i]:
                    exp[i] = ch[i]
                elif i:
                    exp[i] = exp[i - 1]
            np.testing.assert_array_equal(np.asarray(got), exp)


def test_pixel_slab_matches_unslabbed(monkeypatch):
    """CLMGS_SLAB_P splits each chunk step's pixel work into (K, PS) slabs
    (the VMEM lever that unlocks P > 2048 tiles). Forward must be bitwise
    slab-invariant (pure per-pixel math); backward per-instance sums
    reassociate across slabs, so gradients match to fp tolerance."""
    from clm_gs_tpu.ops.rasterize import P

    if P < 512:
        pytest.skip("tile too small to slab")
    m2d, conics, colors, opac, depths, radii, w, h = _projected_scene(
        n=300, seed=5
    )

    def render(op):
        img, alpha, n = rasterize(
            m2d, conics, colors, op, depths, radii, w, h, BG, isect_cap=8192
        )
        return img

    def loss_grad(op):
        return jax.grad(lambda o: jnp.sum(render(o) ** 2))(op)

    base_img = np.asarray(render(opac))
    base_g = np.asarray(loss_grad(opac))
    monkeypatch.setenv("CLMGS_SLAB_P", "256")
    jax.clear_caches()  # slab width is read at trace time
    slab_img = np.asarray(render(opac))
    slab_g = np.asarray(loss_grad(opac))
    monkeypatch.delenv("CLMGS_SLAB_P")
    jax.clear_caches()
    np.testing.assert_array_equal(slab_img, base_img)
    np.testing.assert_allclose(slab_g, base_g, rtol=1e-5, atol=1e-6)


def test_update_cap_budget_semantics():
    """update_cap budgets the binning expansion's scatter updates: with any
    budget covering the instance-producing gaussians the render is bitwise
    identical; an over-tight budget drops only the DEEPEST gaussians (the
    adapt-and-retry condition, like an isect_cap overflow)."""
    m2d, conics, colors, opac, depths, radii, w, h = _projected_scene(
        n=120, seed=9
    )
    full = rasterize(
        m2d, conics, colors, opac, depths, radii, w, h, BG, isect_cap=8192
    )
    ample = rasterize(
        m2d, conics, colors, opac, depths, radii, w, h, BG, isect_cap=8192,
        update_cap=120,
    )
    np.testing.assert_array_equal(np.asarray(full[0]), np.asarray(ample[0]))
    assert int(full[2]) == int(ample[2])

    # over-tight budget: keep only the 30 nearest gaussians; the result must
    # equal rendering those 30 alone (deepest-dropped semantics)
    tight = rasterize(
        m2d, conics, colors, opac, depths, radii, w, h, BG, isect_cap=8192,
        update_cap=30,
    )
    from clm_gs_tpu.ops.rasterize import ALIGN, TILE_H, TILE_W
    from clm_gs_tpu.ops.tiles import tight_extents, tile_bbox

    # the budget prefix is depth-sorted over INSTANCE-PRODUCING gaussians
    # (tight-extents validity and a nonempty tile bbox), not radii > 0
    rx, ry = tight_extents(conics, opac, radii)
    tw, th = -(-w // TILE_W), -(-h // TILE_H)
    x0, x1, y0, y1 = tile_bbox(m2d, rx, ry, (TILE_W, TILE_H), tw, th)
    cnt = np.asarray(
        jnp.where((radii > 0) & (rx > 0) & (ry > 0), (x1 - x0) * (y1 - y0), 0)
    )
    order = np.argsort(
        np.where(cnt > 0, np.asarray(depths), np.inf), kind="stable"
    )
    keep = np.zeros(120, bool)
    keep[order[:30]] = True
    keep &= cnt > 0
    radii_kept = jnp.asarray(np.where(keep, np.asarray(radii), 0.0))
    ref = rasterize(
        m2d, conics, colors, opac, depths, radii_kept, w, h, BG,
        isect_cap=8192,
    )
    np.testing.assert_allclose(
        np.asarray(tight[0]), np.asarray(ref[0]), atol=1e-6
    )


def test_rasterize_batch_parity():
    """rasterize_batch (one-dispatch multi-camera binning/gather) must match
    per-camera rasterize bit-for-bit in the forward and to reassociation
    tolerance in the gradients (the batched layout bakes per-camera offsets
    into one flat sort/fill/gather pipeline; ops/tiles.isect_tiles_aligned
    is its per-camera oracle)."""
    from clm_gs_tpu.ops.rasterize import rasterize_batch

    rng = np.random.default_rng(0)
    B, N, W, H = 3, 400, 96, 64
    means2d = jnp.asarray(rng.uniform(-10, 100, (B, N, 2)).astype(np.float32))
    L = rng.normal(0, 1, (B, N, 2, 2)).astype(np.float32)
    cov = L @ np.swapaxes(L, -1, -2) + np.eye(2)[None, None] * 0.5
    icov = np.linalg.inv(cov)
    conics = jnp.asarray(
        np.stack([icov[..., 0, 0], icov[..., 0, 1], icov[..., 1, 1]], -1)
    )
    colors = jnp.asarray(rng.uniform(0, 1, (B, N, 3)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.05, 0.9, (B, N)).astype(np.float32))
    depths = jnp.asarray(rng.uniform(0.5, 10, (B, N)).astype(np.float32))
    radii = jnp.asarray(rng.integers(0, 12, (B, N)).astype(np.float32))
    cap = 16384

    imgs_b, alphas_b, ni_b = rasterize_batch(
        means2d, conics, colors, opac, depths, radii, W, H, BG, cap
    )
    for b in range(B):
        img, alpha, ni = rasterize(
            means2d[b], conics[b], colors[b], opac[b], depths[b], radii[b],
            W, H, BG, cap,
        )
        np.testing.assert_array_equal(np.asarray(imgs_b[b]), np.asarray(img))
        np.testing.assert_array_equal(np.asarray(alphas_b[b]), np.asarray(alpha))
        assert int(ni) == int(ni_b[b])

    def loss_b(t):
        m2, cn, cl, op = t
        i, _, _ = rasterize_batch(m2, cn, cl, op, depths, radii, W, H, BG, cap)
        return jnp.sum(i * jnp.cos(jnp.arange(i.size).reshape(i.shape) * 0.13))

    gb = jax.grad(loss_b)((means2d, conics, colors, opac))

    def loss_s(t, b):
        m2, cn, cl, op = t
        i, _, _ = rasterize(m2, cn, cl, op, depths[b], radii[b], W, H, BG, cap)
        w3 = jnp.cos(
            jnp.arange(B * i.size).reshape((B,) + i.shape) * 0.13
        )[b]
        return jnp.sum(i * w3)

    for b in range(B):
        gs = jax.grad(loss_s)((means2d[b], conics[b], colors[b], opac[b]), b)
        for j in range(4):
            sc = float(jnp.max(jnp.abs(gs[j]))) + 1e-9
            d = float(jnp.max(jnp.abs(gb[j][b] - gs[j])))
            assert d / sc < 1e-4, (b, j, d, sc)


class TestLargeCapPlan:
    """The packed chunk plan's large-cap mode (chunk_cap > COMPACT_MAX_CHUNKS
    -> no backward compaction, identity block mapping): fwd AND grads must
    match the compacted small-cap path bitwise-or-close on the same scene.
    Exercised by shrinking the threshold, not by allocating 96k chunks."""

    def test_identity_mode_matches_compacted(self, monkeypatch):
        from clm_gs_tpu.ops import rasterize as R

        m2d, conics, colors, opac, depths, radii, w, h = _projected_scene(
            n=120, width=80, height=64, seed=5, angle=1.7
        )
        target = jnp.zeros((3, h, w))

        def loss(cap, m2d, conics, colors, opac, bg):
            img, _, _ = rasterize(
                m2d, conics, colors, opac, depths, radii, w, h, bg,
                isect_cap=cap,
            )
            return jnp.sum((img - target) ** 2), img

        args = (m2d, conics, colors, opac, BG)
        # isect_cap 4096 and 4224 give different chunk_caps -> distinct jit
        # cache entries, so the monkeypatched threshold takes effect
        (l_c, img_c), g_c = jax.value_and_grad(
            lambda *a: loss(4096, *a), argnums=(0, 1, 2, 3), has_aux=True
        )(*args)
        monkeypatch.setattr(R, "COMPACT_MAX_CHUNKS", 1)
        (l_i, img_i), g_i = jax.value_and_grad(
            lambda *a: loss(4224, *a), argnums=(0, 1, 2, 3), has_aux=True
        )(*args)
        np.testing.assert_allclose(np.asarray(img_i), np.asarray(img_c),
                                   atol=1e-6)
        for a, b in zip(g_i, g_c):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
