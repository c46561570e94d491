"""Training driver (reference train.py:68-896 analogue).

CLI: python -m clm_gs_tpu.train -s <scene> -m <out> --no_offload|--naive_offload|
--clm_offload [flags]. Host-side control loop: LR schedules, SH-degree ramp,
eval/densify/save/checkpoint scheduling (interval arithmetic identical to the
reference via check_update_at_this_iter), adaptive capacity management for the
two bucketed buffers (Gaussian capacity, isect capacity), and strategy
dispatch. All device work happens inside the strategies' jitted steps.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from clm_gs_tpu.config import Config, parse_config, save_config
from clm_gs_tpu.data.cameras import CameraBatch, stack_cameras
from clm_gs_tpu.data.dataset import iterate_eval
from clm_gs_tpu.models import densify as Dn
from clm_gs_tpu.models import gaussians as G
from clm_gs_tpu.optim import (
    AdamConfig,
    AdamState,
    init_adam,
    lr_batch_scale,
    sh_column_lr,
)
from clm_gs_tpu.scene import Scene
from clm_gs_tpu.strategies import clm_offload, naive_offload, no_offload
from clm_gs_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from clm_gs_tpu.utils.general import (
    check_update_at_this_iter,
    get_expon_lr_func,
    memory_report,
    next_capacity,
    psnr as psnr_fn,
    round_up,
)
from clm_gs_tpu.utils.logger import RunLogger
from clm_gs_tpu.utils.timer import End2endTimer, Timer

STRATEGIES = {
    "no_offload": no_offload,
    "naive_offload": naive_offload,
    "clm_offload": clm_offload,
}


def _grow_opt(opt: AdamState, new_cap: int) -> AdamState:
    def pad(x):
        extra = new_cap - x.shape[0]
        return jnp.pad(x, [(0, extra)] + [(0, 0)] * (x.ndim - 1))

    return AdamState(
        mu=G.GaussianParams(*[pad(a) for a in opt.mu.astuple()]),
        nu=G.GaussianParams(*[pad(a) for a in opt.nu.astuple()]),
        steps=opt.steps,
    )


def _hbm_gb() -> float:
    try:
        stats = jax.devices()[0].memory_stats()
        return stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)) / 2**30
    except Exception:
        return 0.0


def _host_gb() -> float:
    try:
        import psutil

        return psutil.Process().memory_info().rss / 2**30
    except Exception:
        return 0.0


def training(cfg: Config):
    t_setup = time.time()
    os.makedirs(cfg.model.model_path, exist_ok=True)
    logger = RunLogger(
        cfg.model.model_path,
        append=bool(cfg.aux.auto_start_checkpoint),
        quiet=cfg.aux.quiet,
    )
    save_config(cfg, os.path.join(cfg.model.model_path, "args.json"))
    logger.write(f"config: {cfg}\n")

    scene = Scene(cfg, logger)
    state = scene.gaussians
    opt_state = init_adam(state.params)
    rng = jax.random.PRNGKey(cfg.debug.seed)
    start_iter = 1

    ckpt = cfg.aux.start_checkpoint or (
        latest_checkpoint(cfg.model.model_path) if cfg.aux.auto_start_checkpoint else None
    )
    if ckpt:
        state, opt_state, rng, start_iter = load_checkpoint(ckpt)
        logger.write(f"Resumed from {ckpt} at iteration {start_iter}\n")
        if cfg.debug.drop_duplicate_gaussians_coeff != 1.0:
            # resize-on-resume debug tool (general_utils.py:472-475); the
            # reference drops opt_dict, i.e. the optimizer restarts cold
            if state.params.sh.shape[0] != state.capacity:
                # mid-run clm checkpoint: SH lives in strategy_extra.npz.
                # Pull it back into the state so the resize sees full rows;
                # the host buffers/moments are rebuilt from the resized state
                # below (consistent with the optimizer reset).
                from dataclasses import replace as _dcr

                extra = np.load(os.path.join(ckpt, "strategy_extra.npz"))
                state = _dcr(
                    state,
                    params=_dcr(
                        state.params,
                        sh=jnp.asarray(extra["clm.sh_host"], jnp.float32),
                    ),
                )
            state = G.resize_rows(state, cfg.debug.drop_duplicate_gaussians_coeff)
            opt_state = init_adam(state.params)
            logger.write(
                f"drop_duplicate_gaussians: resized to {int(state.n_alive)} rows\n"
            )

    strategy_name = cfg.strategy
    strategy = STRATEGIES[strategy_name]
    bsz = cfg.opt.bsz
    if strategy_name == "clm_offload" and bsz <= 1:
        logger.write("note: clm_offload pipelining expects bsz > 1 (train.py:358)\n")
    W, H = scene.width, scene.height
    spatial = scene.cameras_extent

    xyz_lr_fn = get_expon_lr_func(
        cfg.opt.position_lr_init * spatial * cfg.opt.lr_scale_pos_and_scale,
        cfg.opt.position_lr_final * spatial * cfg.opt.lr_scale_pos_and_scale,
        lr_delay_mult=cfg.opt.position_lr_delay_mult,
        max_steps=cfg.opt.position_lr_max_steps,
    )
    lr_scale = lr_batch_scale(bsz, cfg.opt.lr_scale_mode)
    adam_cfg = AdamConfig().scaled(bsz, cfg.opt.lr_scale_mode)

    background = jnp.asarray(
        [1.0, 1.0, 1.0] if cfg.model.white_background else [0.0, 0.0, 0.0],
        jnp.float32,
    )
    # device-resident uint8 GT cache: upload the whole train set once and
    # gather batches on device, instead of a ~12 MB/image float32 upload
    # every batch (host-link bandwidth + per-transfer staging growth on this
    # sandbox's plugin). Single-chip only — mesh runs stream + reshard.
    gt_cache = None
    gt_bytes = len(scene.train_cameras) * 3 * W * H
    if (cfg.tpu.gt_device_cache_mb > 0
            and gt_bytes <= cfg.tpu.gt_device_cache_mb * 2**20
            and not (cfg.tpu.shard_gaussians and len(jax.devices()) > 1)):
        from clm_gs_tpu.data.dataset import load_raw_image

        gt_cache = jnp.asarray(
            np.stack(
                [
                    load_raw_image(cfg.aux.decode_dataset_path, c.image_name, W, H)
                    for c in scene.train_cameras
                ]
            )
        )
        jax.block_until_ready(gt_cache)
        logger.write(
            f"GT device cache: {len(scene.train_cameras)} images "
            f"({gt_bytes / 2**20:.0f} MB u8)\n"
        )
    dataset = scene.train_dataset(bsz, skip_load=gt_cache is not None)
    isect_cap = cfg.tpu.isect_cap
    vis_cap = 0  # scatter-update budget; 0 = full until first-batch sizing
    gather_cap = cfg.tpu.gather_cap  # multi-chip visible-gather budget
    e2e = End2endTimer()
    timers = Timer(enabled=cfg.bench.enable_timer)

    # multi-chip: shard Gaussians + cameras over the mesh. no_offload runs the
    # explicit shard_map step (parallel/shard.py); clm_offload shards the
    # 11-float HBM attrs along the gauss axis and keeps its host-driven
    # per-camera streaming loop — GSPMD inserts the collectives inside the
    # jitted filter/micro-step programs (the BASELINE north star: per-chip
    # HBM scales down as 1/n_gauss while SH stays in host DRAM).
    sharded_step = None
    mesh = None
    if (cfg.tpu.shard_gaussians and len(jax.devices()) > 1
            and strategy_name == "naive_offload"):
        # naive_offload keeps the whole model in host DRAM and bulk-copies it
        # per batch — there is no resident device state to shard, so the mesh
        # path does not apply (documented limitation; use clm_offload for
        # sharded offload training).
        logger.write(
            "naive_offload does not support multi-chip sharding; "
            "running single-device\n"
        )
    if cfg.tpu.shard_gaussians and len(jax.devices()) > 1 and strategy_name in (
        "no_offload", "clm_offload",
    ):
        from clm_gs_tpu.parallel.mesh import (
            data_sharding as _dsh, make_mesh as _mkmesh, shard_state as _shstate,
        )
        from clm_gs_tpu.parallel.shard import make_sharded_train_step

        mesh = _mkmesh(cfg.tpu.mesh_shape)
        n_data = mesh.shape["data"]
        if strategy_name == "clm_offload":
            state = _shstate(state, mesh)
            logger.write(
                f"multi-chip mesh (clm gauss sharding): {dict(mesh.shape)}\n"
            )
        elif bsz % n_data == 0:
            state = _shstate(state, mesh)
            opt_state = jax.tree.map(
                lambda x: x, init_adam(state.params)
            )
            logger.write(f"multi-chip mesh: {dict(mesh.shape)}\n")
            sharded_step = (mesh, _dsh(mesh))
        else:
            logger.write(
                f"mesh data axis {n_data} does not divide bsz {bsz}; "
                "running single-device\n"
            )
            mesh = None

    # strategy-specific placement setup
    strategy_ctx = None
    extra_path = os.path.join(ckpt, "strategy_extra.npz") if ckpt else ""
    if strategy_name == "naive_offload":
        strategy_ctx = strategy.make_context(cfg, state, adam_cfg)
        opt_state = None  # all moments live on the host (HostAdam)
        # a coeff-resized resume resets the optimizer (reference opt_dict=None)
        # and changes row count — the saved extras no longer apply
        if (extra_path and os.path.exists(extra_path)
                and cfg.debug.drop_duplicate_gaussians_coeff == 1.0):
            strategy_ctx = strategy.restore_extra(
                strategy_ctx, dict(np.load(extra_path))
            )
        # params live on host; device copy exists only within a batch/eval
        state = strategy.strip_device_params(state)
    elif strategy_name == "clm_offload":
        fresh_host = (not ckpt) and getattr(scene, "host_sh", None) is not None
        resumed_stripped = (
            not fresh_host and state.params.sh.shape[0] != state.capacity
        )
        if fresh_host:
            # Scene loaded with host_sh=True: SH never touched the device
            # (required at BigCity scale; see make_context_from_host)
            strategy_ctx = strategy.make_context_from_host(
                cfg, scene.host_sh, adam_cfg
            )
            scene.host_sh = None  # ownership moves to the context
            opt_state = init_adam(state.params)  # 4 HBM groups + placeholder
        elif resumed_stripped:
            # checkpointed mid-run: device state has the (1,48) placeholder and
            # opt_state already carries the restored 4-group moments; SH and its
            # host moments come from strategy_extra.npz.
            assert extra_path and os.path.exists(extra_path), (
                "clm checkpoint missing strategy_extra.npz"
            )
            strategy_ctx = strategy.make_context_empty(cfg, state.capacity, adam_cfg)
            strategy_ctx = strategy.restore_extra(
                strategy_ctx, dict(np.load(extra_path))
            )
        else:
            strategy_ctx = strategy.make_context(cfg, state, adam_cfg)
            state = strategy.strip_device_sh(state)
            opt_state = init_adam(state.params)  # 4 HBM groups + placeholder
        if mesh is not None:
            from clm_gs_tpu.parallel.mesh import shard_capacity_tree

            state = shard_capacity_tree(state, mesh, state.capacity)
            opt_state = shard_capacity_tree(opt_state, mesh, state.capacity)

    logger.write(f"setup time: {time.time() - t_setup:.1f} s\n")
    sharded_fns: Dict = {}  # compiled mesh steps, keyed by (W, H, cap, flags)
    profiling = [False]
    e2e.start()
    ema_loss = None
    def _frozen_probe():
        # naive_offload strips device params — its canonical xyz lives in the
        # host context (probing the (1, 3) device placeholder would make the
        # tripwire vacuously pass)
        if strategy_name == "naive_offload":
            return float(np.abs(strategy_ctx.params_host["xyz"]).sum())
        return float(jnp.abs(state.params.xyz).sum())

    frozen_param_sum = (
        _frozen_probe()
        if cfg.debug.stop_update_param and cfg.debug.stop_update_param_assert
        else None
    )
    iteration = start_iter
    while iteration <= cfg.opt.iterations:
        sh_degree = min((iteration - 1) // 1000, cfg.model.sh_degree)

        lrs: Dict[str, jnp.ndarray] = {
            "xyz": jnp.float32(float(xyz_lr_fn(iteration)) * lr_scale),
            "opacity": jnp.float32(cfg.opt.opacity_lr * lr_scale),
            "log_scale": jnp.float32(
                cfg.opt.scaling_lr * cfg.opt.lr_scale_pos_and_scale * lr_scale
            ),
            "quat": jnp.float32(cfg.opt.rotation_lr * lr_scale),
            "sh": sh_column_lr(cfg.opt.feature_lr) * lr_scale,
        }

        timers.start("data_next")
        cams, gt, b_idxs = dataset.next_batch()
        cb = stack_cameras(cams)
        if gt_cache is not None:
            # on-device gather + normalize; u8/255 in f32 is bitwise equal to
            # the host path's astype(float32)/255 upload
            gt = gt_cache[jnp.asarray(np.asarray(b_idxs, np.int32))]
            gt = gt.astype(jnp.float32) / 255.0
        else:
            gt = jnp.asarray(gt)
        timers.stop("data_next")
        if cfg.opt.random_background:
            rng, sub = jax.random.split(rng)
            background = jax.random.uniform(sub, (3,), jnp.float32)

        if cfg.debug.profile and iteration >= cfg.debug.profile_start_iter and not profiling[0]:
            jax.profiler.start_trace(os.path.join(cfg.model.model_path, "profile"))
            profiling[0] = True
        timers.start("train_step")
        if sharded_step is not None:
            from clm_gs_tpu.parallel.shard import make_sharded_train_step

            mesh, dsh = sharded_step
            # per-call cache (NOT on the function object: a stale mesh from a
            # previous training() call in the same process must never be hit)
            key = (W, H, isect_cap, gather_cap, cfg.aux.sparse_adam)
            if key not in sharded_fns:
                sharded_fns[key] = make_sharded_train_step(
                    mesh, W, H, isect_cap, sparse_adam=cfg.aux.sparse_adam,
                    lambda_dssim=cfg.opt.lambda_dssim,
                    loss_scale=cfg.opt.lr_scale_loss,
                    stop_update_param=cfg.debug.stop_update_param,
                    gather_cap=gather_cap,
                )
            from clm_gs_tpu.parallel.multihost import put_global

            cb = jax.tree.map(lambda x: put_global(x, dsh), cb)
            gt = put_global(gt, dsh)
            state, opt_state, out = sharded_fns[key](
                state, opt_state, cb, gt, sh_degree, lrs, adam_cfg, background
            )
        elif strategy_name == "no_offload":
            state, opt_state, out = strategy.train_step(
                state, opt_state, cb, gt, sh_degree, lrs, adam_cfg, background,
                W, H, isect_cap, sparse_adam=cfg.aux.sparse_adam,
                accumulate_stats=not cfg.opt.disable_auto_densification,
                lambda_dssim=cfg.opt.lambda_dssim,
                loss_scale=cfg.opt.lr_scale_loss,
                stop_update_param=cfg.debug.stop_update_param,
                update_cap=vis_cap if vis_cap < state.capacity else 0,
            )
        else:
            clm_kwargs = {}
            if strategy_name == "clm_offload" and mesh is not None:
                n_data = mesh.shape["data"]
                if n_data > 1 and bsz % n_data == 0:
                    # clm x data-parallel: run n_data camera chains in
                    # lockstep, the chain axis on the mesh data axis
                    from jax.sharding import NamedSharding, PartitionSpec

                    clm_kwargs = dict(
                        n_chains=n_data,
                        data_sharding=NamedSharding(
                            mesh, PartitionSpec("data")
                        ),
                    )
                    if iteration == start_iter:
                        logger.write(
                            f"clm data-parallel: {n_data} camera chains\n"
                        )
            state, opt_state, strategy_ctx, out = strategy.train_one_batch(
                state, opt_state, strategy_ctx, cb, gt, sh_degree, lrs, adam_cfg,
                background, W, H, isect_cap, cfg, timers=timers, **clm_kwargs,
            )
        timers.stop("train_step", sync=out.losses)

        loss = float(out.losses.mean())
        ema_loss = loss if ema_loss is None else 0.6 * ema_loss + 0.4 * loss
        if (iteration - 1) % cfg.aux.log_interval < bsz:
            logger.write(
                f"iteration[{iteration},{iteration+bsz}) loss: {loss:.6f} "
                f"ema: {ema_loss:.6f} n3dgs: {int(state.n_alive)}\n"
            )
            if cfg.bench.check_gpu_memory or cfg.bench.check_cpu_memory:
                logger.write(
                    "memory: " + memory_report(
                        cfg.bench.check_gpu_memory, cfg.bench.check_cpu_memory
                    ) + "\n"
                )
            if cfg.debug.stop_update_param and cfg.debug.stop_update_param_assert:
                # the reference asserts params stay bit-identical under
                # --stop_update_param (its gaussian_model update asserts)
                cur = _frozen_probe()
                assert cur == frozen_param_sum, (
                    f"stop_update_param violated: {cur} != {frozen_param_sum}"
                )
        at_log = (iteration - 1) % cfg.aux.log_interval < bsz
        if (
            strategy_name == "clm_offload" and strategy_ctx.n_batches
            and (at_log or cfg.bench.log_cpu_adam_trailing_overhead)
        ):
            nb = strategy_ctx.n_batches
            trail = strategy_ctx.trailing_s / nb
            work = strategy_ctx.host_work_s / nb
            hidden = max(0.0, 1.0 - trail / work) if work > 0 else 1.0
            logger.write(
                f"clm overlap: host work {work*1e3:.1f} ms/batch, "
                f"trailing {trail*1e3:.1f} ms/batch, "
                f"comm-hidden {hidden*100:.0f}%\n"
            )

        # adaptive isect capacity (bucketed growth, recompile on change).
        # Keep the margin tight: binning/gather/kernel grids all scale with the
        # capacity, so oversizing costs real time every camera (1.15 -> 1.05
        # measured +4.4% end-to-end; --isect_margin to loosen). The trigger
        # sits halfway between the post-sizing fill ratio (1/margin) and 1,
        # so camera-to-camera variance under half the margin never re-triggers.
        mi = int(out.max_isects)
        margin = cfg.tpu.isect_margin
        trigger = (1.0 / margin + 1.0) / 2.0
        if mi > trigger * isect_cap:
            # 2**17 buckets: finer granularity saves ~6% of the slot-scaled
            # work (binning sort, gather, chunk grids) vs 2**18 at ~2M isects
            # for at most one extra recompile per doubling of the scene.
            isect_cap = round_up(int(mi * margin), 2**17)
            logger.write(f"isect_cap -> {isect_cap}\n")

        # adaptive scatter-update budget (no_offload single-chip): the
        # binning expansion's scatter cost is linear in update rows, so it is
        # budgeted to the visible-gaussian count (instance-producing rows are
        # a subset of radii > 0). Bucketed growth AND snugging — an
        # over-budget batch drops its deepest gaussians once, like an
        # isect_cap overflow batch, then the budget grows.
        if strategy_name == "no_offload" and sharded_step is None:
            nv = int(jnp.sum(out.visible_any))
            want = round_up(max(int(nv * 1.1), 2**16), 2**16)
            if want > vis_cap or want < vis_cap // 2:
                vis_cap = want
                logger.write(f"vis_cap -> {vis_cap}\n")

        # adaptive visible-gather budget for the sharded step (same bucketed
        # growth; a triggering batch rendered with surplus rows dropped, like
        # an isect_cap overflow batch)
        if (sharded_step is not None and gather_cap
                and out.max_shard_vis is not None):
            n_gauss_ax = sharded_step[0].shape["gauss"]
            mv = int(out.max_shard_vis)
            if mv > 0.93 * (gather_cap // n_gauss_ax):
                gather_cap = round_up(int(mv * n_gauss_ax * 1.15), 2**17)
                logger.write(f"gather_cap -> {gather_cap}\n")

        # ---- eval ----
        if any(
            check_update_at_this_iter(iteration, bsz, ti, 0) or iteration == ti
            for ti in cfg.aux.test_iterations
        ) if cfg.aux.test_iterations else False:
            e2e.pause(sync=out.losses)
            timers.start("eval")
            training_report(cfg, scene, state, strategy_ctx, sh_degree, background,
                            isect_cap, iteration, logger)
            timers.stop("eval")
            e2e.start()

        # ---- densification ----
        densify_window = (
            not cfg.opt.disable_auto_densification
            and iteration <= cfg.opt.densify_until_iter
        )
        if densify_window and strategy_name == "naive_offload":
            # densify/reset operate on device params: materialize for the
            # section, strip again after (post_densify syncs host copies)
            will_densify = iteration > cfg.opt.densify_from_iter and (
                check_update_at_this_iter(
                    iteration, bsz, cfg.opt.densification_interval, 0
                )
            )
            will_reset = check_update_at_this_iter(
                iteration, bsz, cfg.opt.opacity_reset_interval, 0
            )
            if will_densify or will_reset:
                state = strategy.materialize(state, strategy_ctx)
        if densify_window:
            # densification stats are garbage without param updates
            # (reference densification.py:19-20)
            assert not cfg.debug.stop_update_param, (
                "stop_update_param must be false for densification; it is a "
                "debugging flag"
            )
            if iteration > cfg.opt.densify_from_iter and check_update_at_this_iter(
                iteration, bsz, cfg.opt.densification_interval, 0
            ):
                n_new = int(
                    Dn.count_densify(
                        state, cfg.opt.densify_grad_threshold, cfg.opt.percent_dense,
                        spatial,
                    )
                )
                needed = int(state.n_alive) + n_new
                if needed > 0.92 * state.capacity:
                    new_cap = next_capacity(needed, cfg.tpu.capacity_granule)
                    logger.write(f"capacity {state.capacity} -> {new_cap}\n")
                    state = G.grow_capacity(state, new_cap)
                    opt_state = _grow_opt(opt_state, new_cap)
                    if strategy_ctx is not None:
                        strategy_ctx = strategy.grow_context(
                            strategy_ctx, new_cap, cfg
                        )
                rng, sub = jax.random.split(rng)
                size_prune = iteration > cfg.opt.opacity_reset_interval
                timers.start("densify")
                state, opt_state, info = Dn.densify_and_prune(
                    state, opt_state, sub, cfg.opt.densify_grad_threshold,
                    cfg.opt.min_opacity, spatial, cfg.opt.percent_dense,
                    jnp.asarray(size_prune),
                    include_sh=(strategy_name != "clm_offload"),
                )
                if strategy_ctx is not None:
                    strategy_ctx = strategy.post_densify(strategy_ctx, state, info)
                if mesh is not None:
                    # growth (jnp.pad) and densify gathers do not preserve the
                    # gauss-axis layout — restore it before the next step
                    from clm_gs_tpu.parallel.mesh import shard_capacity_tree

                    state = shard_capacity_tree(state, mesh, state.capacity)
                    opt_state = shard_capacity_tree(
                        opt_state, mesh, state.capacity
                    )
                timers.stop("densify", sync=state.params.xyz)
                logger.densify_report(
                    iteration, iteration + bsz, int(info.n_alive), _hbm_gb(),
                    _host_gb(),
                )
            if check_update_at_this_iter(
                iteration, bsz, cfg.opt.opacity_reset_interval, 0
            ):
                state, opt_state = Dn.reset_opacity(state, opt_state)
                if strategy_ctx is not None:
                    strategy_ctx = strategy.post_opacity_reset(strategy_ctx, state)
                logger.write(f"iteration[{iteration},{iteration+bsz}) reset_opacity\n")
            if strategy_name == "naive_offload":
                state = strategy.strip_device_params(state)

        # ---- save / checkpoint ----
        save_hits = [
            s for s in cfg.aux.save_iterations if iteration <= s < iteration + bsz
        ]
        if save_hits and not cfg.debug.do_not_save:
            e2e.pause(sync=out.losses)
            # clm: the host SH buffer rides into the state as a numpy leaf —
            # the export paths only np.asarray leaves, so the (C, 48) block
            # never costs device memory (OOM at BigCity scale otherwise)
            scene.gaussians = (
                strategy.materialize_host(state, strategy_ctx)
                if strategy_name == "clm_offload"
                else strategy.materialize(state, strategy_ctx)
                if strategy_name == "naive_offload" else state
            )
            scene.save(save_hits[-1], logger)
            logger.write(f"[ITER {iteration}] Saving Gaussians\n")
            e2e.start()
        if any(
            iteration <= c < iteration + bsz for c in cfg.aux.checkpoint_iterations
        ):
            e2e.pause(sync=out.losses)
            # naive: checkpoint the materialized params so chkpnt.npz is
            # self-contained (resume re-strips after make_context)
            ckpt_state = (
                strategy.materialize(state, strategy_ctx)
                if strategy_name == "naive_offload" else state
            )
            ckpt_opt = (
                opt_state if opt_state is not None
                else init_adam(ckpt_state.params)
            )
            s_extra = (
                strategy.checkpoint_extra(strategy_ctx)
                if hasattr(strategy, "checkpoint_extra")
                and strategy_ctx is not None
                else None
            )
            save_checkpoint(
                cfg.model.model_path, iteration + bsz, ckpt_state, ckpt_opt,
                rng, strategy_extra=s_extra,
            )
            logger.write(f"[ITER {iteration}] Saving Checkpoint\n")
            e2e.start()

        if profiling[0] and iteration + bsz > cfg.debug.profile_end_iter:
            jax.profiler.stop_trace()
            profiling[0] = False
            logger.write(f"profiler trace written to {cfg.model.model_path}/profile\n")
        iteration += bsz

    if profiling[0]:
        jax.profiler.stop_trace()
    e2e.pause(sync=state.params.xyz)
    if cfg.bench.end2end_time:
        logger.end2end(e2e.elapsed(), cfg.opt.iterations - start_iter + 1)
    if timers.enabled:
        logger.write(timers.report() + "\n")
    dataset.close()
    logger.close()
    return state, opt_state


def training_report(cfg, scene, state, strategy_ctx, sh_degree, background,
                    isect_cap, iteration, logger):
    """Eval loop (train.py:669-846): L1 + PSNR over test and a train subset."""
    strategy = STRATEGIES[cfg.strategy]
    if cfg.strategy == "clm_offload":
        eval_state = (state, strategy_ctx)
    elif cfg.strategy == "naive_offload":
        # one upload for the whole eval loop; freed when this scope exits
        eval_state = strategy.materialize(state, strategy_ctx)
    else:
        eval_state = state
    W, H = scene.width, scene.height
    # --eval_res_cap: render + compare at an integer-downsampled resolution
    res_f = 1
    if cfg.tpu.eval_res_cap and max(W, H) > cfg.tpu.eval_res_cap:
        res_f = -(-max(W, H) // cfg.tpu.eval_res_cap)
    n_eval_train = min(
        len(scene.test_cameras) or 10, len(scene.train_cameras),
        cfg.opt.max_num_images_to_evaluate,
    )
    configs = [
        ("test", scene.test_cameras[: cfg.opt.max_num_images_to_evaluate]),
        ("train", scene.train_cameras[:n_eval_train]),
    ]
    eval_bsz = 8
    batch_fn = getattr(strategy, "eval_batch", None)
    for name, cams in configs:
        if not cams:
            continue
        l1s, psnrs = [], []
        saved = 0
        pend_vm, pend_K, pend_c2w, pend_gt = [], [], [], []

        def flush():
            """One device dispatch for up to eval_bsz cameras (the reference
            evaluates one camera per host round-trip, train.py:718-737)."""
            n = len(pend_vm)
            if not n:
                return
            pad = eval_bsz - n
            cb_b = CameraBatch(
                viewmats=jnp.stack(pend_vm + [pend_vm[-1]] * pad),
                Ks=jnp.stack(pend_K + [pend_K[-1]] * pad),
                camtoworlds=jnp.stack(pend_c2w + [pend_c2w[-1]] * pad),
                width=We, height=He,
            )
            gts_b = jnp.stack(pend_gt + [pend_gt[-1]] * pad)
            bl1, bps = batch_fn(
                eval_state, cb_b, gts_b, sh_degree, background,
                We, He, isect_cap,
            )
            l1s.extend(np.asarray(bl1[:n]).tolist())
            psnrs.extend(np.asarray(bps[:n]).tolist())
            del pend_vm[:], pend_K[:], pend_c2w[:], pend_gt[:]

        for cam, gt in iterate_eval(cams, cfg.aux.decode_dataset_path, W, H):
            cb = stack_cameras([cam])
            Ke, We, He = cb.Ks[0], W, H
            gtj = jnp.asarray(gt)
            if res_f > 1:
                We, He = W // res_f, H // res_f
                Ke = Ke.at[:2].divide(res_f)
                gtj = jnp.mean(
                    gtj[:, : He * res_f, : We * res_f].reshape(
                        3, He, res_f, We, res_f
                    ),
                    axis=(2, 4),
                )
            if saved < cfg.aux.num_save_images_during_eval or batch_fn is None:
                img, _ = strategy.eval_one_cam(
                    eval_state, cb.viewmats[0], Ke, cb.camtoworlds[0],
                    sh_degree, background, We, He, isect_cap,
                )
                l1s.append(float(jnp.mean(jnp.abs(img - gtj))))
                psnrs.append(float(psnr_fn(jnp.clip(img, 0, 1), gtj)))
                if saved < cfg.aux.num_save_images_during_eval:
                    _save_eval_image(cfg, iteration, name, cam, img, gtj)
                    saved += 1
            else:
                pend_vm.append(cb.viewmats[0])
                pend_K.append(Ke)
                pend_c2w.append(cb.camtoworlds[0])
                pend_gt.append(gtj)
                if len(pend_vm) == eval_bsz:
                    flush()
        flush()
        logger.eval_result(
            iteration, name, float(np.mean(l1s)), float(np.mean(psnrs))
        )


def _save_eval_image(cfg, iteration, split, cam, img, gt):
    try:
        from PIL import Image

        out_dir = os.path.join(cfg.model.model_path, "eval_images", str(iteration))
        os.makedirs(out_dir, exist_ok=True)
        for tag, arr in (("render", img), ("gt", gt)):
            a = np.asarray(jnp.clip(arr, 0, 1) * 255).astype(np.uint8)
            Image.fromarray(a.transpose(1, 2, 0)).save(
                os.path.join(out_dir, f"{split}_{cam.image_name}_{tag}.png")
            )
    except Exception:
        pass


def main(argv=None):
    cfg = parse_config(argv)
    # multi-host bootstrap must precede every other backend touch
    from clm_gs_tpu.parallel.multihost import maybe_initialize

    maybe_initialize(cfg)
    if cfg.debug.detect_anomaly:
        jax.config.update("jax_debug_nans", True)
    np.random.seed(cfg.debug.seed)
    training(cfg)


if __name__ == "__main__":
    main()
