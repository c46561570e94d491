"""no_offload strategy: everything resident in HBM.

The TPU analogue of strategies/no_offload/engine.py — the all-on-accelerator
baseline. The reference's microbatch pipelining with per-attribute detach
layers (engine.py:121-175, grads accumulated across cameras into one .grad per
tensor) becomes a `lax.scan` over cameras with value_and_grad inside the body:
activation memory stays O(one image) and parameter gradients accumulate in the
scan carry. The Adam step divides accumulated grads by bsz first
(train.py:533-577).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from clm_gs_tpu.models.densify import add_densification_stats
from clm_gs_tpu.models.gaussians import GaussianParams, GaussianState
from clm_gs_tpu.optim import AdamConfig, AdamState, adam_step
from clm_gs_tpu.strategies.base import (photometric_loss,
                                        photometric_loss_batch,
                                        render_cams, render_one_cam)


class StepOut(NamedTuple):
    losses: jnp.ndarray  # (bsz,)
    max_isects: jnp.ndarray  # () — for host-side isect_cap adaptation
    visible_any: jnp.ndarray  # (C,) bool
    # multi-chip only: peak per-(camera, shard) visible count, for host-side
    # gather_cap adaptation (parallel/shard.py budgeted compaction)
    max_shard_vis: jnp.ndarray = None


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "isect_cap", "sparse_adam", "accumulate_stats",
        "adam_cfg", "lambda_dssim", "loss_scale", "stop_update_param",
        "update_cap", "micro_group",
    ),
)
def train_step(
    state: GaussianState,
    opt_state: AdamState,
    cams,  # CameraBatch pytree: viewmats (B,4,4), Ks (B,3,3), camtoworlds
    gt_images,  # (B, 3, H, W) float in [0,1]
    sh_degree,
    lrs: Dict[str, jnp.ndarray],
    adam_cfg: AdamConfig,
    background,
    width: int,
    height: int,
    isect_cap: int,
    sparse_adam: bool = False,
    accumulate_stats: bool = True,
    lambda_dssim: float = 0.2,
    loss_scale: float = 1.0,
    stop_update_param: bool = False,
    update_cap: int = 0,
    micro_group: int = 0,
):
    """One batched iteration (bsz = B cameras). Returns (state, opt_state, StepOut).

    micro_group G (default 1): cameras are rendered G per dispatch through
    render_cams and the outer scan runs over B/G groups. G = 1 is the
    reference's microbatch pipelining (no_offload/engine.py:121-175) — one
    camera's fwd+bwd at a time, O(1 image) activations — and is ALSO the
    fastest shape on TPU v5e: chip A/Bs of G = B (one batched dispatch,
    CLMGS_RAST_BATCH) and of unrolled-G with per-camera rasterize measured
    5.69 / 7.73 vs 9.7 Mpix/s — binning/gather/kernel element costs are
    linear-or-worse in instance count, so batching them only loses on layout
    and residual live-ranges (round-4 xplane evidence in PARITY.md)."""
    params = state.params
    alive = state.alive
    C = params.capacity
    bsz = gt_images.shape[0]
    G = micro_group if 0 < micro_group < bsz else (bsz if micro_group else 1)
    if bsz % G != 0:
        G = 1  # uneven split: per-camera groups
    n_groups = bsz // G

    zero_grads = jax.tree.map(jnp.zeros_like, params)

    def group(carry, cam):
        grads_acc, stats_acc, vis_any, max_isects = carry
        viewmats, Kmats, c2ws, gts = cam  # (G, ...) each
        campos = c2ws[:, :3, 3]

        def loss_fn(p, probe):
            out = render_cams(
                p, alive, viewmats, Kmats, campos, sh_degree,
                width, height, background, isect_cap, probe=probe,
                update_cap=update_cap,
            )
            losses = photometric_loss_batch(
                out.images, gts, lambda_dssim, loss_scale
            )
            # sum of per-camera losses: grads accumulate over the group in
            # one backward exactly like the reference's .grad accumulation
            return jnp.sum(losses), (out, losses)

        probe0 = jnp.zeros((G, C, 2), jnp.float32)
        (_, (out, losses)), (g_params, g_probe) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, probe0)

        grads_acc = jax.tree.map(jnp.add, grads_acc, g_params)
        # carry visibility as f32, not bool: (C,) pred carries cost ~33 ms/cam
        # in layout copies on TPU (measured via xplane trace)
        visf = (out.radii > 0).astype(jnp.float32)  # (G, C)
        vis_any = jnp.maximum(vis_any, jnp.max(visf, axis=0))
        max_isects = jnp.maximum(max_isects, jnp.max(out.n_isects))
        if accumulate_stats:
            g = g_probe * jnp.array(
                [[[width * 0.5, height * 0.5]]], jnp.float32
            )
            norm = jnp.linalg.norm(g, axis=-1)  # (G, C)
            stats_acc = (
                stats_acc[0] + jnp.sum(norm * visf, axis=0),
                stats_acc[1] + jnp.sum(visf, axis=0),
            )
        return (grads_acc, stats_acc, vis_any, max_isects), losses

    init = (
        zero_grads,
        (jnp.zeros(C, jnp.float32), jnp.zeros(C, jnp.float32)),
        jnp.zeros(C, jnp.float32),
        jnp.zeros((), jnp.int32),
    )

    def grp(x):
        return x.reshape((n_groups, G) + x.shape[1:])

    cam_stack = (
        grp(cams.viewmats), grp(cams.Ks), grp(cams.camtoworlds),
        grp(gt_images),
    )
    if n_groups == 1:
        sq = lambda t: jax.tree.map(lambda x: x[0], t)
        carry, losses = group(init, sq(cam_stack))
        (grads, stats, vis_any, max_isects) = carry
    else:
        (grads, stats, vis_any, max_isects), losses = jax.lax.scan(
            group, init, cam_stack
        )
        losses = losses.reshape(bsz)
    vis_any = vis_any > 0

    # grad /= bsz before Adam (train.py:533-577)
    grads = jax.tree.map(lambda g: g / bsz, grads)

    if stop_update_param:  # --stop_update_param debug flag (train.py:549)
        new_params, new_opt = params, opt_state
    else:
        update_mask = (alive & vis_any) if sparse_adam else alive
        new_params, new_opt = adam_step(
            params, grads, opt_state, lrs, adam_cfg, update_mask
        )

    new_state = GaussianState(
        params=new_params,
        alive=alive,
        n_alive=state.n_alive,
        xyz_grad_accum=state.xyz_grad_accum + stats[0],
        denom=state.denom + stats[1],
        max_radii2d=state.max_radii2d,
    )
    return new_state, new_opt, StepOut(losses, max_isects, vis_any)


@partial(jax.jit, static_argnames=("width", "height", "isect_cap"))
def eval_one_cam(
    state: GaussianState, viewmat, Kmat, camtoworld, sh_degree,
    background, width: int, height: int, isect_cap: int,
):
    """Render + metrics for one eval camera (baseline_accumGrads_micro_step
    eval mode, no_offload/engine.py:15)."""
    out = render_one_cam(
        state.params, state.alive, viewmat, Kmat, camtoworld[:3, 3],
        sh_degree, width, height, background, isect_cap,
    )
    return out.image, out.n_isects


@partial(jax.jit, static_argnames=("width", "height", "isect_cap"))
def eval_batch(
    state: GaussianState, cb, gts, sh_degree, background,
    width: int, height: int, isect_cap: int,
):
    """Render + L1/PSNR for a whole padded batch of eval cameras in one
    dispatch (the reference evaluates one camera per host round-trip,
    train.py:718-737 — batching removes the per-image sync). Returns
    (l1s (E,), psnrs (E,)); the caller masks padded entries."""

    def one(_, cam):
        vm, Kmat, c2w, gt = cam
        out = render_one_cam(
            state.params, state.alive, vm, Kmat, c2w[:3, 3], sh_degree,
            width, height, background, isect_cap,
        )
        l1 = jnp.mean(jnp.abs(out.image - gt))
        img = jnp.clip(out.image, 0.0, 1.0)
        mse = jnp.mean((img - gt) ** 2)
        ps = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
        return _, (l1, ps)

    _, (l1s, pss) = jax.lax.scan(
        one, 0, (cb.viewmats, cb.Ks, cb.camtoworlds, gts)
    )
    return l1s, pss
