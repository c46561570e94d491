"""Strategy parity: no_offload is the ground truth; naive_offload and
clm_offload must produce equivalent training trajectories (the reference's
primary correctness oracle, SURVEY.md §4: "mathematically identical rendering
formula", PSNR within noise)."""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clm_gs_tpu.config import Config, init_config
from clm_gs_tpu.models import gaussians as G
from clm_gs_tpu.optim import AdamConfig, init_adam, sh_column_lr
from clm_gs_tpu.strategies import clm_offload, naive_offload, no_offload
from tests.test_train_synthetic import _render_gts, _scene, BG, CAP, H, ISECT_CAP, LRS, W


def _perturbed(seed=0):
    state, cb = _scene(seed=seed)
    gts = _render_gts(state, cb)
    rng = jax.random.PRNGKey(7)
    p = state.params
    p = G.GaussianParams(
        xyz=p.xyz + 0.02 * jax.random.normal(rng, p.xyz.shape),
        opacity=p.opacity - 0.3, log_scale=p.log_scale + 0.1, quat=p.quat,
        sh=p.sh * 0.8,
    )
    return replace(state, params=p), cb, gts


def _mk_cfg(strategy, bsz=4, sparse=False):
    cfg = Config()
    setattr(cfg.aux, strategy, True)
    cfg.aux.sparse_adam = sparse
    cfg.opt.bsz = bsz
    cfg.opt.lr_scale_mode = "accumu"  # keep LR identical across tests
    init_config(cfg)
    return cfg


N_STEPS = 8


def _run_no_offload(state, cb, gts, sparse=False):
    opt = init_adam(state.params)
    losses = []
    for _ in range(N_STEPS):
        state, opt, out = no_offload.train_step(
            state, opt, cb, gts, 3, LRS, AdamConfig(), BG, W, H, ISECT_CAP,
            sparse_adam=sparse,
        )
        losses.append(np.asarray(out.losses))
    return state, np.array(losses)


def _run_naive(state, cb, gts, sparse=False):
    cfg = _mk_cfg("naive_offload", sparse=sparse)
    ctx = naive_offload.make_context(cfg, state, AdamConfig())
    losses = []
    for _ in range(N_STEPS):
        state, _, ctx, out = naive_offload.train_one_batch(
            state, None, ctx, cb, gts, 3, LRS, AdamConfig(), BG, W, H,
            ISECT_CAP, cfg,
        )
        losses.append(np.asarray(out.losses))
    # train_one_batch returns a stripped state (device params freed per batch)
    return naive_offload.materialize(state, ctx), np.array(losses)


def _run_clm(state, cb, gts, sparse=False):
    cfg = _mk_cfg("clm_offload", sparse=sparse)
    ctx = clm_offload.make_context(cfg, state, AdamConfig())
    state = clm_offload.strip_device_sh(state)
    opt = init_adam(state.params)
    losses = []
    for _ in range(N_STEPS):
        state, opt, ctx, out = clm_offload.train_one_batch(
            state, opt, ctx, cb, gts, 3, LRS, AdamConfig(), BG, W, H,
            ISECT_CAP, cfg,
        )
        losses.append(np.asarray(out.losses))
    return clm_offload.materialize(state, ctx), np.array(losses)


class TestStrategyParity:
    def test_naive_matches_no_offload(self):
        state, cb, gts = _perturbed()
        s_no, loss_no = _run_no_offload(state, cb, gts)
        s_nv, loss_nv = _run_naive(state, cb, gts)
        # per-batch mean losses track closely (fp32 accumulation-order noise)
        np.testing.assert_allclose(
            loss_nv.mean(1), loss_no.mean(1), rtol=5e-3, atol=5e-4
        )
        # final params close
        for name in ("xyz", "opacity", "log_scale", "quat", "sh"):
            a = np.asarray(getattr(s_no.params, name))
            b = np.asarray(getattr(s_nv.params, name))
            np.testing.assert_allclose(a, b, rtol=0.05, atol=2e-3, err_msg=name)

    def test_clm_matches_no_offload(self):
        state, cb, gts = _perturbed()
        s_no, loss_no = _run_no_offload(state, cb, gts)
        s_clm, loss_clm = _run_clm(state, cb, gts)
        # clm's TSP reorders cameras inside the batch: compare per-batch sums
        np.testing.assert_allclose(
            np.sort(loss_clm, axis=1), np.sort(loss_no, axis=1), rtol=5e-3,
            atol=1e-3,
        )
        for name in ("xyz", "opacity", "log_scale", "quat", "sh"):
            a = np.asarray(getattr(s_no.params, name))
            b = np.asarray(getattr(s_clm.params, name))
            np.testing.assert_allclose(a, b, rtol=0.05, atol=2e-3, err_msg=name)

    def test_clm_sparse_adam(self):
        state, cb, gts = _perturbed(seed=1)
        s, losses = _run_clm(state, cb, gts, sparse=True)
        assert losses[-1].mean() < losses[0].mean()
        assert np.isfinite(losses).all()

    def test_clm_device_memory_excludes_sh(self):
        state, cb, gts = _perturbed()
        cfg = _mk_cfg("clm_offload")
        ctx = clm_offload.make_context(cfg, state, AdamConfig())
        stripped = clm_offload.strip_device_sh(state)
        assert stripped.params.sh.shape == (1, 48)
        assert ctx.sh_host.shape == (CAP, 48)
        # materialize restores
        full = clm_offload.materialize(stripped, ctx)
        np.testing.assert_array_equal(
            np.asarray(full.params.sh), np.asarray(state.params.sh)
        )


class TestRetention:
    def test_retention_matches_full_regather(self):
        """H/D/G delta transfers must be numerically identical to re-fetching
        every camera's full visible set (they only change traffic)."""
        def run(retention):
            # fresh state per run: train_one_batch's _adam_tail DONATES the
            # caller's params/opt buffers (by design — the transient
            # old+new copy OOM'd the 25M record run)
            state, cb, gts = _perturbed(seed=2)
            cfg = _mk_cfg("clm_offload")
            cfg.tpu.retention = retention
            ctx = clm_offload.make_context(cfg, state, AdamConfig())
            s = clm_offload.strip_device_sh(state)
            opt = init_adam(s.params)
            for _ in range(4):
                s, opt, ctx, out = clm_offload.train_one_batch(
                    s, opt, ctx, cb, gts, 3, LRS, AdamConfig(), BG, W, H,
                    ISECT_CAP, cfg,
                )
            return clm_offload.materialize(s, ctx)

        s_ret = run(True)
        s_full = run(False)
        for name in ("xyz", "opacity", "log_scale", "quat", "sh"):
            np.testing.assert_allclose(
                np.asarray(getattr(s_ret.params, name)),
                np.asarray(getattr(s_full.params, name)),
                rtol=1e-5, atol=1e-6, err_msg=name,
            )


class TestEvalBatch:
    def test_eval_batch_matches_eval_one_cam(self):
        """Batched eval (one dispatch per batch) must agree with the
        per-camera path it replaces (reference evaluates sequentially,
        train.py:718-737)."""
        state, cb = _scene(seed=3)
        gts = _render_gts(state, cb)
        l1s, pss = no_offload.eval_batch(
            state, cb, gts, 3, BG, W, H, ISECT_CAP
        )
        for i in range(gts.shape[0]):
            img, _ = no_offload.eval_one_cam(
                state, cb.viewmats[i], cb.Ks[i], cb.camtoworlds[i], 3, BG,
                W, H, ISECT_CAP,
            )
            l1 = float(jnp.mean(jnp.abs(img - gts[i])))
            imgc = jnp.clip(img, 0.0, 1.0)
            ps = float(-10.0 * jnp.log10(
                jnp.maximum(jnp.mean((imgc - gts[i]) ** 2), 1e-12)))
            np.testing.assert_allclose(float(l1s[i]), l1, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(float(pss[i]), ps, rtol=1e-4, atol=1e-4)


class TestClmDensifyReplay:
    def test_host_replay_matches_device_sh(self):
        """The host-side SH replay of a densify plan must equal the device
        scatter (which reads pre-densify params for every child). Regression
        for the round-2 divergence: a CLONE child landing in a freed SPLIT
        source's slot corrupted the sequential replay's later gather — split
        children were born with the clone source's SH."""
        from clm_gs_tpu.models.densify import densify_and_prune

        C, n = 8, 6
        rng = np.random.RandomState(0)
        ls = np.full((C, 3), np.log(0.001), np.float32)  # small -> clone
        ls[1] = np.log(5.0)  # row 1 huge -> split (source pruned, slot freed)
        params = G.GaussianParams(
            xyz=jnp.asarray(rng.randn(C, 3).astype(np.float32)),
            opacity=jnp.full((C,), 3.0),
            log_scale=jnp.asarray(ls),
            quat=jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (C, 1)),
            sh=jnp.asarray(np.arange(C * 48).reshape(C, 48).astype(np.float32)),
        )
        alive = jnp.asarray(np.arange(C) < n)
        accum = np.zeros(C, np.float32)
        accum[[0, 1]] = 10.0  # row 0 clones, row 1 splits
        state = G.GaussianState(
            params=params, alive=alive, n_alive=jnp.asarray(n, jnp.int32),
            xyz_grad_accum=jnp.asarray(accum),
            denom=jnp.where(alive, 1.0, 0.0), max_radii2d=jnp.zeros(C),
        )
        key = jax.random.PRNGKey(0)
        args = (0.5, 0.005, 1.0, 0.01, jnp.asarray(False))
        s_dev, _, info_dev = densify_and_prune(
            state, init_adam(params), key, *args
        )
        # the hazard this test exists for: the clone child occupies the
        # split source's freed slot
        assert int(np.asarray(info_dev.clone_dest)[0]) == 1

        cfg = _mk_cfg("clm_offload")
        ctx = clm_offload.make_context(cfg, state, AdamConfig())
        state_h = clm_offload.strip_device_sh(state)
        s_clm, _, info_clm = densify_and_prune(
            state_h, init_adam(state_h.params), key, *args, include_sh=False
        )
        ctx = clm_offload.post_densify(ctx, s_clm, info_clm)

        sh_dev = np.asarray(s_dev.params.sh)
        alive_new = np.asarray(s_dev.alive)
        np.testing.assert_array_equal(
            ctx.sh_host[alive_new], sh_dev[alive_new]
        )


class TestClmDataChains:
    def test_chain_loop_matches_single_chain(self):
        """clm x data-parallel (n_chains=2): the lockstep chain loop must
        reproduce the single-chain trajectory — same math, different
        batching/ordering of the per-camera dispatches."""
        def run(n_chains):
            # fresh state per run (donated step buffers, see TestRetention)
            state0, cb, gts = _perturbed(seed=4)
            cfg = _mk_cfg("clm_offload")
            ctx = clm_offload.make_context(cfg, state0, AdamConfig())
            state = clm_offload.strip_device_sh(state0)
            opt = init_adam(state.params)
            losses = []
            for _ in range(4):
                state, opt, ctx, out = clm_offload.train_one_batch(
                    state, opt, ctx, cb, gts, 3, LRS, AdamConfig(), BG, W, H,
                    ISECT_CAP, cfg, n_chains=n_chains,
                )
                losses.append(np.sort(np.asarray(out.losses)))
            return clm_offload.materialize(state, ctx), np.array(losses)

        s1, l1 = run(1)
        s2, l2 = run(2)
        np.testing.assert_allclose(l1, l2, rtol=1e-5, atol=1e-7)
        for name in ("xyz", "opacity", "log_scale", "quat", "sh"):
            np.testing.assert_allclose(
                np.asarray(getattr(s1.params, name)),
                np.asarray(getattr(s2.params, name)),
                rtol=1e-4, atol=1e-6, err_msg=name,
            )

    def test_chain_loop_no_retention(self):
        state0, cb, gts = _perturbed(seed=6)
        cfg = _mk_cfg("clm_offload")
        cfg.tpu.retention = False
        ctx = clm_offload.make_context(cfg, state0, AdamConfig())
        state = clm_offload.strip_device_sh(state0)
        opt = init_adam(state.params)
        for _ in range(2):
            state, opt, ctx, out = clm_offload.train_one_batch(
                state, opt, ctx, cb, gts, 3, LRS, AdamConfig(), BG, W, H,
                ISECT_CAP, cfg, n_chains=2,
            )
        assert np.isfinite(np.asarray(out.losses)).all()

    def test_chain_loop_uneven_bsz_falls_back(self):
        """bsz not divisible by n_chains: silently run the single chain."""
        state0, cb, gts = _perturbed(seed=2)
        cfg = _mk_cfg("clm_offload")
        ctx = clm_offload.make_context(cfg, state0, AdamConfig())
        state = clm_offload.strip_device_sh(state0)
        opt = init_adam(state.params)
        state, opt, ctx, out = clm_offload.train_one_batch(
            state, opt, ctx, cb, gts, 3, LRS, AdamConfig(), BG, W, H,
            ISECT_CAP, cfg, n_chains=3,  # bsz = 4
        )
        assert out.losses.shape == (4,)


class TestAdvanceGatherForm:
    """Round-5: the working-set advance is host-inverted gathers (the XLA
    row-scatter form cost ~140 ms per (900k,48) buffer on chip). These pin
    the inversion + gather semantics against a direct numpy reference."""

    def _ref_advance(self, sh_prev, grad_prev, h_rows, pd, pn, hn, v_cap):
        sh_next = np.zeros_like(sh_prev)
        sh_next[pn] = sh_prev[pd]
        sh_next[hn] = h_rows[: len(hn)]
        grad_carry = np.zeros_like(grad_prev)
        grad_carry[pn] = grad_prev[pd]
        return sh_next, grad_carry

    @pytest.mark.parametrize(
        "prev,nxt",
        [
            ([1, 4, 7, 9], [2, 4, 9, 11, 13]),  # partial overlap
            ([1, 4, 7], [10, 11]),  # disjoint: all H, all G
            ([2, 5, 8], [2, 5, 8]),  # identical: no H, no G
            ([], [3, 6]),  # empty previous
        ],
    )
    def test_matches_reference(self, prev, nxt):
        v_cap = 8
        rng = np.random.RandomState(0)
        prev = np.asarray(prev, np.int32)
        nxt = np.asarray(nxt, np.int32)
        pd, pn, hn, gp, gp_raw, hn_raw = clm_offload._classify_transition(
            prev, nxt, v_cap
        )
        h_cap = len(hn)
        sh_prev = rng.rand(v_cap, 48).astype(np.float32)
        grad_prev = rng.rand(v_cap, 48).astype(np.float32)
        h_rows = np.zeros((h_cap, 48), np.float32)
        h_rows[: len(hn_raw)] = rng.rand(len(hn_raw), 48)

        nr = len(prev) - len(gp_raw)
        src, gsrc = clm_offload._invert_transition(
            pd[:nr], pn[:nr], hn_raw, v_cap, h_cap
        )
        sh_next, grad_carry, g_rows = clm_offload._advance_ws_packed(
            jnp.asarray(sh_prev), jnp.asarray(grad_prev), jnp.asarray(h_rows),
            jnp.asarray(np.concatenate([src, gsrc, gp])),
        )
        ref_sh, ref_gc = self._ref_advance(
            sh_prev, grad_prev, h_rows, pd[:nr], pn[:nr], hn_raw, v_cap
        )
        np.testing.assert_array_equal(np.asarray(sh_next), ref_sh)
        np.testing.assert_array_equal(np.asarray(grad_carry), ref_gc)
        # G rows: dropped rows' accumulated grads, valid prefix
        np.testing.assert_array_equal(
            np.asarray(g_rows)[: len(gp_raw)], grad_prev[gp_raw]
        )


class TestDeviceLoopReplay:
    def test_replay_losses_match_batch(self):
        """prepare_device_loop (bench decomposition harness) replays the exact
        per-camera math of train_one_batch: with param updates frozen, the
        final camera's loss must agree bitwise."""
        state, cb, gts = _perturbed(seed=5)
        cfg = _mk_cfg("clm_offload")
        cfg.debug.stop_update_param = True
        cfg.debug.stop_update_param_assert = False
        ctx = clm_offload.make_context(cfg, state, AdamConfig())
        stripped = clm_offload.strip_device_sh(state)
        opt = init_adam(stripped.params)
        _s, _o, ctx, out = clm_offload.train_one_batch(
            stripped, opt, ctx, cb, gts, 3, LRS, AdamConfig(), BG, W, H,
            ISECT_CAP, cfg,
        )
        run, n_disp = clm_offload.prepare_device_loop(
            stripped, ctx, cb, gts, 3, BG, W, H, ISECT_CAP, cfg
        )
        loss1, acc1 = run()
        loss2, acc2 = run()  # rerunnable: donation must not corrupt inputs
        assert float(loss1) == float(loss2)
        np.testing.assert_array_equal(
            np.asarray(acc1.g_xyz), np.asarray(acc2.g_xyz)
        )
        assert float(loss1) == float(np.asarray(out.losses)[-1])
        assert n_disp == 2 * gts.shape[0] + 2
