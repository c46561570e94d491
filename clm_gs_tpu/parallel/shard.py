"""Sharded training step: Gaussian-parallel + camera-data-parallel shard_map.

The multi-chip capability the single-GPU reference lacks (SURVEY.md §2.2 "TPU-
native mapping"). Decomposition per device (mesh axes `data` x `gauss`):

  1. each device holds a C/n_g slice of every Gaussian buffer and projects /
     SH-evaluates only its slice for its camera group — the O(59+96 floats)
     state never leaves the shard,
  2. each device COMPACTS its shard's visible rows (radius-culled) into a
     fixed per-shard budget (`gather_cap // n_gauss` slots) and one
     `all_gather` over the `gauss` axis assembles only those projected
     attributes (radii, means2d, depth, conic, color, opacity = 12 floats) —
     the only cross-chip traffic, riding ICI. Per-device gathered bytes are
     bounded by `gather_cap * 12 * 4` — proportional to the scene's VISIBLE
     working set, not to capacity C, which is what makes the 102M-Gaussian
     BigCity regime fit per-chip HBM (the reference's own no_offload path
     filters to visible sets the same way, base_engine.py:18-76),
  3. each device rasterizes its own cameras (the Pallas kernel runs per-device
     inside shard_map, untouched by GSPMD),
  4. autodiff through the shard_map turns the all_gather into a
     reduce-scatter of attribute gradients back onto the owning shards (the
     compaction gather transposes to a shard-local scatter-add), and
     camera-group gradients are psum'd over `data` — both emitted by XLA.

The Adam step stays a plain jitted elementwise update over the sharded
buffers (no communication).

Budget overflow: if any (camera, shard) pair has more visible rows than its
budget, surplus rows are dropped for that camera and `StepOut.max_shard_vis`
reports the true demand — the trainer grows `gather_cap` (bucketed, like
isect_cap) and rebuilds the step.
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
    gather_cap: int = 0,
):
    """Build the jitted multi-chip train step for this mesh/resolution.
    lambda_dssim/loss_scale/stop_update_param mirror the single-chip
    no_offload.train_step knobs (same CLI must train identically on any
    device count).

    gather_cap: global visible-set budget for the cross-chip attribute
    gather; each gauss shard contributes gather_cap // n_gauss compacted
    rows. 0 = unbudgeted (every shard contributes its full C/n_gauss rows —
    correct at any visibility, but per-device gathered bytes scale with C)."""
    n_gauss = mesh.shape["gauss"]

    def local_losses(params, alive, viewmats, Ks, camtoworlds, gts, sh_degree, bg):
        """Runs per-device inside shard_map. params/alive are the local gauss
        shard; cameras/gts are the local data shard."""

        C_local = params.capacity
        vs_cap = min(-(-gather_cap // n_gauss), C_local) if gather_cap else C_local

        def one_cam(carry, cam):
            vm, K, c2w, gt = cam

            def loss_fn(p, probe):
                proj = fully_fused_projection(
                    p.xyz, p.quat, jnp.exp(p.log_scale), vm[None], K[None],
                    width, height, alive=alive,
                )
                means2d = proj.means2d[0] + probe
                radii_l = proj.radii[0]
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
                # compact this shard's visible rows into the per-shard budget
                # BEFORE the gather: cross-chip bytes and the rasterizer's
                # input length scale with the visible working set, not C.
                # The index computation sits outside autodiff (radii is not
                # differentiated); the row gather's transpose is a local
                # scatter-add back onto the shard.
                vis_l = jax.lax.stop_gradient(radii_l) > 0
                (idx,) = jnp.nonzero(vis_l, size=vs_cap, fill_value=C_local)
                valid = idx < C_local
                idc = jnp.minimum(idx, C_local - 1)
                n_vis = jnp.sum(vis_l).astype(jnp.int32)

                def compact(x, fill=0.0):
                    xc = x[idc]
                    mask = valid.reshape((vs_cap,) + (1,) * (x.ndim - 1))
                    return jnp.where(mask, xc, fill)

                gather = lambda x: jax.lax.all_gather(
                    x, "gauss", axis=0, tiled=True
                )
                image, _, n_isects = rasterize(
                    gather(compact(means2d)), gather(compact(proj.conics[0])),
                    gather(compact(colors)), gather(compact(opac)),
                    gather(compact(proj.depths[0])),
                    gather(compact(radii_l)),  # padded rows: radii 0 = culled
                    width, height, bg, isect_cap,
                )
                return (
                    photometric_loss(image, gt, lambda_dssim, loss_scale),
                    (radii_l, n_isects, n_vis),
                )

            probe0 = jnp.zeros((C_local, 2), jnp.float32)
            (loss, (radii, n_isects, n_vis)), (g, g_probe) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params, probe0)
            grads_acc, stats_acc, vis_any, mi, mv = carry
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
                    jnp.maximum(mv, n_vis),
                ),
                loss,
            )

        init = (
            jax.tree.map(jnp.zeros_like, params),
            (jnp.zeros(C_local, jnp.float32), jnp.zeros(C_local, jnp.float32)),
            jnp.zeros(C_local, bool),
            jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32),
        )
        (grads, stats, vis_any, max_isects, max_vis), losses = jax.lax.scan(
            one_cam, init, (viewmats, Ks, camtoworlds, gts)
        )
        # camera-parallel: grads/stats sum over the data axis; losses gathered
        grads = jax.lax.psum(grads, "data")
        stats = jax.lax.psum(stats, "data")
        vis_any = jax.lax.psum(vis_any.astype(jnp.int32), "data") > 0
        max_isects = jax.lax.pmax(jax.lax.pmax(max_isects, "data"), "gauss")
        max_vis = jax.lax.pmax(jax.lax.pmax(max_vis, "data"), "gauss")
        losses = jax.lax.all_gather(losses, "data", axis=0, tiled=True)
        return grads, stats, vis_any, max_isects, max_vis, losses

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
            P("gauss"), P(), P(), P(),
        ),
        check_vma=False,
    )

    @partial(jax.jit, static_argnames=("adam_cfg",))
    def train_step(
        state: GaussianState, opt_state, cams, gt_images, sh_degree,
        lrs: Dict[str, jnp.ndarray], adam_cfg: AdamConfig, background,
    ):
        bsz = gt_images.shape[0]
        grads, stats, vis_any, max_isects, max_vis, losses = smapped(
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
        return new_state, new_opt, StepOut(losses, max_isects, vis_any, max_vis)

    return train_step
