"""naive_offload strategy: ZeRO-offload-style host placement.

TPU analogue of strategies/naive_offload/engine.py + gaussian_model.py: the
canonical parameters AND all Adam moments live in host DRAM (numpy, updated by
the native SIMD HostAdam — the cpu-adam equivalent); the accelerator holds a
transient copy of the parameters for the batch. Per batch:

  1. fwd/bwd microbatches on the device copy (lax.scan, grads accumulate into
     full-capacity buffers — the reference's scatter_add into full GPU grads,
     naive_offload/engine.py:242-275),
  2. one bulk D2H of all gradients (:301-310),
  3. host Adam (dense, or sparse over the batch's visible union with
     --sparse_adam, :325-341), moments never touch the device,
  4. one bulk H2D refreshing the device parameter copy (:82-91, shifted to
     batch end so eval/densify between batches see fresh values).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from clm_gs_tpu.models.gaussians import GaussianParams, GaussianState
from clm_gs_tpu.optim import AdamConfig
from clm_gs_tpu.strategies import no_offload
from clm_gs_tpu.strategies.base import photometric_loss, render_one_cam
from clm_gs_tpu.strategies.no_offload import StepOut
from clm_gs_tpu.utils.native import HostAdam

GROUP_COLS = {"xyz": 3, "opacity": 1, "log_scale": 3, "quat": 4, "sh": 48}


@dataclass
class NaiveContext:
    params_host: Dict[str, np.ndarray]  # canonical (C, cols) f32
    adams: Dict[str, HostAdam]


def make_context(cfg, state: GaussianState, adam_cfg: AdamConfig) -> NaiveContext:
    C = state.capacity
    params_host = {
        n: np.asarray(getattr(state.params, n)).reshape(C, GROUP_COLS[n]).copy()
        for n in GROUP_COLS
    }
    adams = {
        n: HostAdam(
            C, GROUP_COLS[n], np.zeros(GROUP_COLS[n], np.float32),
            betas=adam_cfg.betas, eps=adam_cfg.eps,
        )
        for n in GROUP_COLS
    }
    return NaiveContext(params_host=params_host, adams=adams)


def strip_device_params(state: GaussianState) -> GaussianState:
    """Replace every device parameter leaf with a (1, cols) placeholder: the
    canonical parameters live in host DRAM, and the device copy exists only
    inside train_one_batch (upload -> microbatches -> grad D2H -> freed),
    matching the reference's per-batch upload/free lifetime
    (naive_offload/engine.py:82-104). Between batches the only per-gaussian
    device arrays are alive/stats (~5 floats/gaussian).

    NOTE state.capacity reads params.xyz — use alive.shape[0] here."""
    if _is_stripped(state):
        return state
    return replace(
        state,
        params=GaussianParams(
            xyz=jnp.zeros((1, 3), jnp.float32),
            opacity=jnp.zeros((1,), jnp.float32),
            log_scale=jnp.zeros((1, 3), jnp.float32),
            quat=jnp.zeros((1, 4), jnp.float32),
            sh=jnp.zeros((1, 48), jnp.float32),
        ),
    )


def _is_stripped(state: GaussianState) -> bool:
    return state.params.xyz.shape[0] != state.alive.shape[0]


def materialize(state: GaussianState, ctx: NaiveContext) -> GaussianState:
    """Full state with parameters restored (uploaded) from the host canonical
    copy — for eval, densify, save, and the batch compute itself."""
    if not _is_stripped(state):
        return state
    C = state.alive.shape[0]
    return replace(
        state,
        params=GaussianParams(
            **{
                n: jnp.asarray(
                    ctx.params_host[n].reshape(
                        (C,) if n == "opacity" else (C, GROUP_COLS[n])
                    )
                )
                for n in GROUP_COLS
            }
        ),
    )


def grow_context(ctx: NaiveContext, new_cap: int, cfg) -> NaiveContext:
    for n, arr in ctx.params_host.items():
        new = np.zeros((new_cap, arr.shape[1]), np.float32)
        new[: len(arr)] = arr
        ctx.params_host[n] = new
        ctx.adams[n].grow(new_cap)
    return ctx


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "isect_cap", "accumulate_stats", "lambda_dssim",
        "loss_scale",
    ),
)
def _batch_grads(
    state: GaussianState, cams, gt_images, sh_degree, background,
    width: int, height: int, isect_cap: int, accumulate_stats: bool = True,
    lambda_dssim: float = 0.2,
    loss_scale: float = 1.0,
):
    """Gradient accumulation over the camera microbatches (no optimizer)."""
    params = state.params
    alive = state.alive
    C = params.capacity

    def micro(carry, cam):
        grads_acc, stats_acc, vis_any, max_isects = carry
        viewmat, Kmat, c2w, gt = cam

        def loss_fn(p, probe):
            out = render_one_cam(
                p, alive, viewmat, Kmat, c2w[:3, 3], sh_degree,
                width, height, background, isect_cap, probe=probe,
            )
            return photometric_loss(out.image, gt, lambda_dssim, loss_scale), out

        probe0 = jnp.zeros((C, 2), jnp.float32)
        (loss, out), (g_params, g_probe) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, probe0)
        grads_acc = jax.tree.map(jnp.add, grads_acc, g_params)
        vis = out.radii > 0
        vis_any = vis_any | vis
        max_isects = jnp.maximum(max_isects, out.n_isects)
        if accumulate_stats:
            g = g_probe * jnp.array([[width * 0.5, height * 0.5]], jnp.float32)
            stats_acc = (
                stats_acc[0] + jnp.linalg.norm(g, axis=-1) * vis,
                stats_acc[1] + vis.astype(jnp.float32),
            )
        return (grads_acc, stats_acc, vis_any, max_isects), loss

    init = (
        jax.tree.map(jnp.zeros_like, params),
        (jnp.zeros(C, jnp.float32), jnp.zeros(C, jnp.float32)),
        jnp.zeros(C, bool),
        jnp.zeros((), jnp.int32),
    )
    cam_stack = (cams.viewmats, cams.Ks, cams.camtoworlds, gt_images)
    (grads, stats, vis_any, max_isects), losses = jax.lax.scan(micro, init, cam_stack)
    return grads, stats, vis_any, max_isects, losses


def train_one_batch(
    state, opt_state, ctx: NaiveContext, cams, gt, sh_degree,
    lrs, adam_cfg, background, width, height, isect_cap, cfg, timers=None,
):
    from clm_gs_tpu.utils.timer import Timer

    tm = timers if timers is not None else Timer(enabled=False)
    bsz = gt.shape[0]
    C = state.alive.shape[0]
    # per-batch parameter lifetime (engine.py:82-104): upload the canonical
    # host copy, run the microbatches, offload grads, free the device copy
    # by returning a stripped state
    full = materialize(state, ctx)
    tm.start("naive.grads")
    grads, stats, vis_any, max_isects, losses = _batch_grads(
        full, cams, jnp.asarray(gt), sh_degree, background, width, height,
        isect_cap, accumulate_stats=not cfg.opt.disable_auto_densification,
        lambda_dssim=cfg.opt.lambda_dssim,
        loss_scale=cfg.opt.lr_scale_loss,
    )
    tm.stop("naive.grads", sync=losses)
    if cfg.debug.stop_update_param:  # debug: skip all updates (engine.py:331)
        return (
            strip_device_params(state),
            opt_state, ctx, StepOut(losses, max_isects, vis_any),
        )

    # bulk D2H of grads + host Adam over each group
    tm.start("naive.d2h_adam")
    alive_np = np.asarray(state.alive)
    if cfg.aux.sparse_adam:
        upd_idx = np.nonzero(np.asarray(vis_any) & alive_np)[0].astype(np.int32)
    else:
        upd_idx = np.nonzero(alive_np)[0].astype(np.int32)
    for name, cols in GROUP_COLS.items():
        gnp = np.asarray(getattr(grads, name)).reshape(C, cols)
        adam = ctx.adams[name]
        adam.step_count += 1
        lr = np.asarray(lrs[name], np.float32)
        adam.lr_cols = (
            np.ascontiguousarray(lr) if lr.ndim == 1
            else np.full(cols, float(lr), np.float32)
        )
        adam.sparse_step(
            ctx.params_host[name], gnp, upd_idx, grad_scale=1.0 / bsz,
            step=adam.step_count,
        )
    tm.stop("naive.d2h_adam")

    # updated canonical values live on the host; the device copy is freed
    # (stripped state) until the next batch / eval / densify materializes it
    new_state = GaussianState(
        params=strip_device_params(state).params,
        alive=state.alive, n_alive=state.n_alive,
        xyz_grad_accum=state.xyz_grad_accum + stats[0],
        denom=state.denom + stats[1],
        max_radii2d=state.max_radii2d,
    )
    return new_state, opt_state, ctx, StepOut(losses, max_isects, vis_any)


def post_densify(ctx: NaiveContext, state: GaussianState, info):
    """After device-side densification (on a materialized state), refresh the
    host mirror and zero the moments of freshly-written rows."""
    C = state.alive.shape[0]
    written = np.asarray(info.written)
    for n, cols in GROUP_COLS.items():
        ctx.params_host[n] = (
            np.asarray(getattr(state.params, n)).reshape(C, cols).copy()
        )
        ctx.adams[n].exp_avg[written] = 0.0
        ctx.adams[n].exp_avg_sq[written] = 0.0
    return ctx


def post_opacity_reset(ctx: NaiveContext, state: GaussianState):
    C = state.alive.shape[0]
    ctx.params_host["opacity"] = (
        np.asarray(state.params.opacity).reshape(C, 1).copy()
    )
    ctx.adams["opacity"].exp_avg[:] = 0.0
    ctx.adams["opacity"].exp_avg_sq[:] = 0.0
    return ctx


def checkpoint_extra(ctx: NaiveContext) -> dict:
    out = {}
    for n in GROUP_COLS:
        out[f"naive.{n}.exp_avg"] = ctx.adams[n].exp_avg
        out[f"naive.{n}.exp_avg_sq"] = ctx.adams[n].exp_avg_sq
        out[f"naive.{n}.step_count"] = np.asarray(ctx.adams[n].step_count)
    return out


def restore_extra(ctx: NaiveContext, arrays: dict) -> NaiveContext:
    for n in GROUP_COLS:
        ctx.adams[n].exp_avg = np.ascontiguousarray(
            arrays[f"naive.{n}.exp_avg"], np.float32
        )
        ctx.adams[n].exp_avg_sq = np.ascontiguousarray(
            arrays[f"naive.{n}.exp_avg_sq"], np.float32
        )
        ctx.adams[n].step_count = int(arrays[f"naive.{n}.step_count"])
    return ctx


# eval: train.py materializes the params before the eval loop
eval_one_cam = no_offload.eval_one_cam
eval_batch = no_offload.eval_batch
