"""Sharded training step: Gaussian-parallel + camera-data-parallel shard_map.

The multi-chip capability the single-GPU reference lacks (SURVEY.md §2.2 "TPU-
native mapping"). Decomposition per device (mesh axes `data` x `gauss`):

  1. each device holds a C/n_g slice of every Gaussian buffer and projects /
     SH-evaluates only its slice for its camera group — the O(59+96 floats)
     state never leaves the shard,
  2. one `all_gather` over the `gauss` axis assembles the *projected* compact
     attributes (radii, means2d, depth, conic, color, opacity = 12 floats) —
     the only cross-chip traffic, riding ICI, and ~5x smaller than the state,
  3. each device rasterizes its own cameras (the Pallas kernel runs per-device
     inside shard_map, untouched by GSPMD),
  4. autodiff through the shard_map turns the all_gather into a
     reduce-scatter of attribute gradients back onto the owning shards, and
     camera-group gradients are psum'd over `data` — both emitted by XLA.

The Adam step stays a plain jitted elementwise update over the sharded
buffers (no communication).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clm_gs_tpu.models.gaussians import GaussianParams, GaussianState
from clm_gs_tpu.optim import AdamConfig, adam_step
from clm_gs_tpu.ops.projection import fully_fused_projection
from clm_gs_tpu.ops.rasterize import rasterize
from clm_gs_tpu.ops.sh import degree_mask, sh_basis
from clm_gs_tpu.strategies.base import photometric_loss
from clm_gs_tpu.strategies.no_offload import StepOut


def make_sharded_train_step(
    mesh: Mesh, width: int, height: int, isect_cap: int,
    sparse_adam: bool = False, lambda_dssim: float = 0.2,
    loss_scale: float = 1.0, stop_update_param: bool = False,
):
    """Build the jitted multi-chip train step for this mesh/resolution.
    lambda_dssim/loss_scale/stop_update_param mirror the single-chip
    no_offload.train_step knobs (same CLI must train identically on any
    device count)."""

    def local_losses(params, alive, viewmats, Ks, camtoworlds, gts, sh_degree, bg):
        """Runs per-device inside shard_map. params/alive are the local gauss
        shard; cameras/gts are the local data shard."""

        C_local = params.capacity

        def one_cam(carry, cam):
            vm, K, c2w, gt = cam

            def loss_fn(p, probe):
                proj = fully_fused_projection(
                    p.xyz, p.quat, jnp.exp(p.log_scale), vm[None], K[None],
                    width, height, alive=alive,
                )
                means2d = proj.means2d[0] + probe
                dirs = p.xyz - c2w[:3, 3][None, :]
                basis = sh_basis(dirs) * degree_mask(sh_degree)
                colors = jnp.maximum(
                    jnp.einsum(
                        "nk,nkc->nc", basis,
                        p.sh.reshape(p.capacity, 16, 3),
                    )
                    + 0.5,
                    0.0,
                )
                opac = jax.nn.sigmoid(p.opacity)
                # assemble the full projected lists across the gauss axis
                gather = lambda x: jax.lax.all_gather(
                    x, "gauss", axis=0, tiled=True
                )
                image, _, n_isects = rasterize(
                    gather(means2d), gather(proj.conics[0]),
                    gather(colors), gather(opac), gather(proj.depths[0]),
                    gather(proj.radii[0]), width, height, bg, isect_cap,
                )
                return (
                    photometric_loss(image, gt, lambda_dssim, loss_scale),
                    (proj.radii[0], n_isects),
                )

            probe0 = jnp.zeros((C_local, 2), jnp.float32)
            (loss, (radii, n_isects)), (g, g_probe) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params, probe0)
            grads_acc, stats_acc, vis_any, mi = carry
            vis = radii > 0
            gp = g_probe * jnp.array([[width * 0.5, height * 0.5]], jnp.float32)
            stats_acc = (
                stats_acc[0] + jnp.linalg.norm(gp, axis=-1) * vis,
                stats_acc[1] + vis.astype(jnp.float32),
            )
            return (
                (
                    jax.tree.map(jnp.add, grads_acc, g),
                    stats_acc,
                    vis_any | vis,
                    jnp.maximum(mi, n_isects),
                ),
                loss,
            )

        init = (
            jax.tree.map(jnp.zeros_like, params),
            (jnp.zeros(C_local, jnp.float32), jnp.zeros(C_local, jnp.float32)),
            jnp.zeros(C_local, bool),
            jnp.zeros((), jnp.int32),
        )
        (grads, stats, vis_any, max_isects), losses = jax.lax.scan(
            one_cam, init, (viewmats, Ks, camtoworlds, gts)
        )
        # camera-parallel: grads/stats sum over the data axis; losses gathered
        grads = jax.lax.psum(grads, "data")
        stats = jax.lax.psum(stats, "data")
        vis_any = jax.lax.psum(vis_any.astype(jnp.int32), "data") > 0
        max_isects = jax.lax.pmax(jax.lax.pmax(max_isects, "data"), "gauss")
        losses = jax.lax.all_gather(losses, "data", axis=0, tiled=True)
        return grads, stats, vis_any, max_isects, losses

    smapped = jax.shard_map(
        local_losses,
        mesh=mesh,
        in_specs=(
            GaussianParams(
                xyz=P("gauss"), opacity=P("gauss"), log_scale=P("gauss"),
                quat=P("gauss"), sh=P("gauss"),
            ),
            P("gauss"),  # alive
            P("data"), P("data"), P("data"), P("data"),  # cameras + gt
            P(), P(),  # sh_degree, bg
        ),
        out_specs=(
            GaussianParams(
                xyz=P("gauss"), opacity=P("gauss"), log_scale=P("gauss"),
                quat=P("gauss"), sh=P("gauss"),
            ),
            (P("gauss"), P("gauss")),
            P("gauss"), P(), P(),
        ),
        check_vma=False,
    )

    @partial(jax.jit, static_argnames=("adam_cfg",))
    def train_step(
        state: GaussianState, opt_state, cams, gt_images, sh_degree,
        lrs: Dict[str, jnp.ndarray], adam_cfg: AdamConfig, background,
    ):
        bsz = gt_images.shape[0]
        grads, stats, vis_any, max_isects, losses = smapped(
            state.params, state.alive, cams.viewmats, cams.Ks,
            cams.camtoworlds, gt_images, jnp.asarray(sh_degree), background,
        )
        grads = jax.tree.map(lambda g: g / bsz, grads)
        if stop_update_param:
            new_params, new_opt = state.params, opt_state
        else:
            update_mask = (
                (state.alive & vis_any) if sparse_adam else state.alive
            )
            new_params, new_opt = adam_step(
                state.params, grads, opt_state, lrs, adam_cfg, update_mask
            )
        new_state = GaussianState(
            params=new_params, alive=state.alive, n_alive=state.n_alive,
            xyz_grad_accum=state.xyz_grad_accum + stats[0],
            denom=state.denom + stats[1],
            max_radii2d=state.max_radii2d,
        )
        return new_state, new_opt, StepOut(losses, max_isects, vis_any)

    return train_step
