"""Tests for Gaussian state, IO, KNN init, optimizer, and densification."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clm_gs_tpu.models import densify as D
from clm_gs_tpu.models import gaussians as G
from clm_gs_tpu.ops.knn import knn_mean_sq_dist, knn_mean_sq_dist_exact
from clm_gs_tpu.optim import (
    AdamConfig,
    adam_step,
    init_adam,
    lr_batch_scale,
    sh_column_lr,
)


class TestKNN:
    def test_window_close_to_exact(self):
        rng = np.random.RandomState(0)
        pts = jnp.asarray(rng.rand(500, 3).astype(np.float32))
        approx = np.asarray(knn_mean_sq_dist(pts))
        exact = np.asarray(knn_mean_sq_dist_exact(pts))
        # approximation within 2x for the vast majority of points
        ratio = approx / exact
        assert np.median(ratio) < 1.3
        assert (ratio >= 0.999).all()  # window knn can only overestimate

    def test_uniform_grid(self):
        """On a uniform grid with spacing h, 3-NN mean sq dist == h^2."""
        xs = np.arange(8, dtype=np.float32) * 0.5
        pts = np.stack(np.meshgrid(xs, xs, xs), -1).reshape(-1, 3)
        d = np.asarray(knn_mean_sq_dist(jnp.asarray(pts)))
        np.testing.assert_allclose(np.median(d), 0.25, rtol=1e-4)


class TestState:
    def _mk(self, n=100, cap=256):
        rng = np.random.RandomState(0)
        pts = rng.rand(n, 3).astype(np.float32)
        cols = rng.rand(n, 3).astype(np.float32)
        return G.create_from_pcd(pts, cols, capacity=cap), pts, cols

    def test_create_from_pcd(self):
        state, pts, cols = self._mk()
        assert int(state.n_alive) == 100
        assert state.capacity == 256
        assert bool(state.alive[:100].all()) and not bool(state.alive[100:].any())
        np.testing.assert_allclose(np.asarray(state.params.xyz[:100]), pts)
        # opacity init: sigmoid(op) == 0.1
        np.testing.assert_allclose(
            jax.nn.sigmoid(state.params.opacity[:100]), 0.1, rtol=1e-5
        )
        # dc coeffs recover colors
        from clm_gs_tpu.ops.sh import sh_to_rgb

        np.testing.assert_allclose(
            np.asarray(sh_to_rgb(state.params.sh[:100, 0:3])), cols, rtol=1e-5
        )
        assert (np.asarray(state.params.sh[:100, 3:]) == 0).all()

    def test_ply_roundtrip(self, tmp_path):
        state, _, _ = self._mk()
        p = str(tmp_path / "model.ply")
        G.save_ply(state, p)
        state2 = G.load_ply(p, capacity=256)
        for a, b in zip(state.params.astuple(), state2.params.astuple()):
            np.testing.assert_allclose(
                np.asarray(a)[:100], np.asarray(b)[:100], rtol=1e-6
            )
        assert int(state2.n_alive) == 100

    def test_ply_chunked(self, tmp_path):
        state, _, _ = self._mk()
        stem = str(tmp_path / "model")
        G.save_ply(state, stem + ".ply", chunk_rows=30)
        files = sorted(os.listdir(tmp_path))
        assert len(files) == 4  # ceil(100/30)
        assert all("_rk" in f and "_ws4" in f for f in files)

    def test_tensors_roundtrip(self, tmp_path):
        state, _, _ = self._mk()
        p = str(tmp_path / "model.npz")
        G.save_tensors(state, p)
        state2 = G.load_tensors(p, capacity=512)
        np.testing.assert_allclose(
            np.asarray(state.params.sh[:100]), np.asarray(state2.params.sh[:100])
        )

    def test_grow_capacity(self):
        state, _, _ = self._mk()
        bigger = G.grow_capacity(state, 512)
        assert bigger.capacity == 512
        assert int(bigger.n_alive) == 100
        np.testing.assert_allclose(
            np.asarray(bigger.params.xyz[:100]), np.asarray(state.params.xyz[:100])
        )


class TestAdam:
    def test_matches_torch_reference_math(self):
        """One dense step equals the analytic Adam update (eps 1e-15)."""
        rng = np.random.RandomState(0)
        n = 16
        state, _, _ = TestState()._mk(n, cap=n)
        params = state.params
        opt = init_adam(params)
        grads = jax.tree.map(
            lambda x: jnp.asarray(rng.normal(size=x.shape).astype(np.float32)), params
        )
        lrs = {
            "xyz": jnp.float32(0.01), "opacity": jnp.float32(0.05),
            "log_scale": jnp.float32(0.005), "quat": jnp.float32(0.001),
            "sh": sh_column_lr(0.0025),
        }
        cfg = AdamConfig()
        mask = jnp.ones(n, bool)
        new_params, new_opt = adam_step(params, grads, opt, lrs, cfg, mask)
        # step 1: mhat = g, vhat = g^2 -> update = lr * g/(|g| + eps) = lr*sign
        got = np.asarray(params.xyz - new_params.xyz)
        want = 0.01 * np.sign(np.asarray(grads.xyz))
        np.testing.assert_allclose(got, want, rtol=1e-4)
        # per-column sh lr: dc columns moved 20x more than rest
        dsh = np.abs(np.asarray(params.sh - new_params.sh))
        np.testing.assert_allclose(dsh[:, 0:3], 0.0025, rtol=1e-3)
        np.testing.assert_allclose(dsh[:, 3:], 0.000125, rtol=1e-3)

    def test_selective_rows_untouched(self):
        n = 8
        state, _, _ = TestState()._mk(n, cap=n)
        params = state.params
        opt = init_adam(params)
        grads = jax.tree.map(jnp.ones_like, params)
        lrs = {k: jnp.float32(0.1) for k in ("xyz", "opacity", "log_scale", "quat")}
        lrs["sh"] = sh_column_lr(0.1)
        mask = jnp.asarray([True] * 4 + [False] * 4)
        new_params, new_opt = adam_step(params, grads, opt, lrs, AdamConfig(), mask)
        np.testing.assert_array_equal(
            np.asarray(new_params.xyz[4:]), np.asarray(params.xyz[4:])
        )
        assert (np.asarray(new_opt.mu.xyz[4:]) == 0).all()
        assert not (np.asarray(new_params.xyz[:4]) == np.asarray(params.xyz[:4])).all()

    def test_bsz_scaling_rules(self):
        cfg = AdamConfig().scaled(4, "sqrt")
        np.testing.assert_allclose(cfg.betas, (0.9**4, 0.999**4))
        np.testing.assert_allclose(cfg.eps, 1e-15 / 2)
        assert lr_batch_scale(4, "sqrt") == 2.0
        assert lr_batch_scale(4, "linear") == 4.0
        assert lr_batch_scale(4, "accumu") == 1.0


class TestDensify:
    def _mk(self, cap=64):
        state, _, _ = TestState()._mk(20, cap=cap)
        return state

    def test_clone_small_high_grad(self):
        state = self._mk()
        # give rows 0..4 high accumulated grads; all scales are small by init
        state = state.__class__(
            params=state.params, alive=state.alive, n_alive=state.n_alive,
            xyz_grad_accum=jnp.zeros(64).at[0:5].set(10.0),
            denom=jnp.ones(64), max_radii2d=state.max_radii2d,
        )
        opt = init_adam(state.params)
        new_state, new_opt, info = D.densify_and_prune(
            state, opt, jax.random.PRNGKey(0), 1e-4, 0.005, 100.0, 0.01,
            jnp.asarray(False),
        )
        assert int(info.n_cloned) == 5
        assert int(info.n_split) == 0
        assert int(info.n_alive) == 25
        assert not bool(info.overflow)
        # clones duplicate the source xyz
        xyz = np.asarray(new_state.params.xyz)
        alive = np.asarray(new_state.alive)
        assert alive.sum() == 25
        for i in range(5):
            matches = (np.abs(xyz[alive] - xyz[i]) < 1e-6).all(1).sum()
            assert matches == 2, f"row {i} not cloned"
        # stats reset
        assert (np.asarray(new_state.xyz_grad_accum) == 0).all()

    def test_split_large_high_grad(self):
        state = self._mk()
        p = state.params
        big_scale = p.log_scale.at[0:3].set(jnp.log(5.0))
        state = state.__class__(
            params=p.__class__(p.xyz, p.opacity, big_scale, p.quat, p.sh),
            alive=state.alive, n_alive=state.n_alive,
            xyz_grad_accum=jnp.zeros(64).at[0:3].set(10.0),
            denom=jnp.ones(64), max_radii2d=state.max_radii2d,
        )
        opt = init_adam(state.params)
        new_state, _, info = D.densify_and_prune(
            state, opt, jax.random.PRNGKey(1), 1e-4, 0.005, 100.0, 0.01,
            jnp.asarray(False),
        )
        assert int(info.n_split) == 3
        # 20 - 3 sources + 6 children = 23
        assert int(info.n_alive) == 23
        ls = np.asarray(new_state.params.log_scale)
        alive = np.asarray(new_state.alive)
        # children have scale / 1.6
        n_children = np.isclose(ls[alive][:, 0], np.log(5.0 / 1.6), atol=1e-5).sum()
        assert n_children == 6

    def test_prune_low_opacity(self):
        state = self._mk()
        from clm_gs_tpu.utils.general import inverse_sigmoid

        p = state.params
        low = p.opacity.at[0:7].set(float(inverse_sigmoid(0.001)))
        state = state.__class__(
            params=p.__class__(p.xyz, low, p.log_scale, p.quat, p.sh),
            alive=state.alive, n_alive=state.n_alive,
            xyz_grad_accum=jnp.zeros(64), denom=jnp.ones(64),
            max_radii2d=state.max_radii2d,
        )
        opt = init_adam(state.params)
        new_state, _, info = D.densify_and_prune(
            state, opt, jax.random.PRNGKey(2), 1e9, 0.005, 100.0, 0.01,
            jnp.asarray(False),
        )
        assert int(info.n_pruned) == 7
        assert int(info.n_alive) == 13

    def test_overflow_reports(self):
        state = self._mk(cap=21)  # only 1 free slot
        state = state.__class__(
            params=state.params, alive=state.alive, n_alive=state.n_alive,
            xyz_grad_accum=jnp.zeros(21).at[0:5].set(10.0),
            denom=jnp.ones(21), max_radii2d=state.max_radii2d,
        )
        opt = init_adam(state.params)
        n_new = int(D.count_densify(state, 1e-4, 0.01, 100.0))
        assert n_new == 5
        _, _, info = D.densify_and_prune(
            state, opt, jax.random.PRNGKey(0), 1e-4, 0.005, 100.0, 0.01,
            jnp.asarray(False),
        )
        assert bool(info.overflow)

    def test_reset_opacity(self):
        state = self._mk()
        opt = init_adam(state.params)
        opt = opt.__class__(
            mu=jax.tree.map(jnp.ones_like, opt.mu),
            nu=jax.tree.map(jnp.ones_like, opt.nu), steps=opt.steps,
        )
        new_state, new_opt = D.reset_opacity(state, opt)
        op = jax.nn.sigmoid(np.asarray(new_state.params.opacity))
        alive = np.asarray(new_state.alive)
        assert (op[alive] <= 0.0101).all()
        assert (np.asarray(new_opt.mu.opacity)[alive] == 0).all()
        # other groups' moments untouched
        assert (np.asarray(new_opt.mu.xyz) == 1).all()


class TestKNNSmallN:
    def test_fewer_than_k_neighbors_not_zero_biased(self):
        """Points with fewer than k in-window neighbors must average the
        finite slots only (regression: inf slots were replaced by 0 and
        included in the mean, biasing init scales low)."""
        pts = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
        d = np.asarray(knn_mean_sq_dist(pts, k=3))
        np.testing.assert_allclose(d, [1.0, 1.0], rtol=1e-6)


class TestResizeRows:
    def _state(self, n=10):
        rng = np.random.RandomState(3)
        from tests.utils3d import random_gaussians
        from clm_gs_tpu.models.gaussians import create_from_pcd

        xyz, _, _, _, _ = random_gaussians(n, rng)
        return create_from_pcd(xyz, rng.rand(n, 3).astype(np.float32), capacity=64)

    def test_truncate(self):
        from clm_gs_tpu.models import gaussians as G

        st = self._state(10)
        out = G.resize_rows(st, 0.5)
        assert int(out.n_alive) == 5
        np.testing.assert_allclose(
            np.asarray(out.params.xyz)[:5], np.asarray(st.params.xyz)[:5]
        )

    def test_tile_duplicates(self):
        from clm_gs_tpu.models import gaussians as G

        st = self._state(10)
        out = G.resize_rows(st, 1.5)
        assert int(out.n_alive) == 15
        x = np.asarray(out.params.xyz)
        # rows 10..14 repeat rows 0..4 (arange(15) % 10 semantics)
        np.testing.assert_allclose(x[10:15], x[0:5])
        # stats reset
        assert float(np.abs(np.asarray(out.xyz_grad_accum)).max()) == 0.0
