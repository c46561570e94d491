"""Shared render pipeline used by every strategy.

The TPU analogue of the reference's strategies/base_engine.py: one camera's
full differentiable forward (projection -> SH colors -> tile binning ->
compositing), the combined 0.8*L1 + 0.2*(1-SSIM) loss (:79-103), and the
visibility filter (:18-76) — which here is a dense (C,) radius mask over the
fixed-capacity buffer rather than packed index lists.

The `probe` argument is the JAX idiom for torch's means2D.retain_grad()
(base_engine.py:153): a zeros-valued additive input whose gradient equals the
screen-space position gradient, consumed by the densification statistics.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from clm_gs_tpu.models.gaussians import GaussianParams, activated, sh_coeffs
from clm_gs_tpu.ops.projection import fully_fused_projection
from clm_gs_tpu.ops.rasterize import rasterize, rasterize_batch
from clm_gs_tpu.ops.sh import degree_mask, sh_basis, sh_color_flat
from clm_gs_tpu.ops.ssim import combined_loss, combined_loss_batch

TILE_SIZE = 16  # base_engine.py:15


class RenderOut(NamedTuple):
    image: jnp.ndarray  # (3, H, W)
    alpha: jnp.ndarray  # (H, W)
    radii: jnp.ndarray  # (C,) 0 = culled
    n_isects: jnp.ndarray  # ()


@partial(
    jax.jit, static_argnames=("width", "height", "isect_cap", "update_cap")
)
def render_one_cam(
    params: GaussianParams,
    alive,
    viewmat,
    Kmat,
    campos,
    sh_degree,
    width: int,
    height: int,
    background,
    isect_cap: int,
    probe=None,
    update_cap: int = 0,
) -> RenderOut:
    """Differentiable render of one camera from the full padded buffer
    (pipeline_forward_one_step, base_engine.py:106-207)."""
    opac, scales = activated(params)
    proj = fully_fused_projection(
        params.xyz, params.quat, scales,
        viewmat[None], Kmat[None], width, height, alive=alive,
    )
    means2d = proj.means2d[0]
    if probe is not None:
        means2d = means2d + probe
    dirs = params.xyz - campos[None, :]
    basis = sh_basis(dirs) * degree_mask(sh_degree)
    if os.environ.get("CLMGS_SH_FLAT", "0") == "1":
        colors = jnp.maximum(sh_color_flat(basis, params.sh) + 0.5, 0.0)
    else:
        colors = jnp.maximum(
            jnp.einsum("nk,nkc->nc", basis, sh_coeffs(params)) + 0.5, 0.0
        )
    image, alpha, n_isects = rasterize(
        means2d, proj.conics[0], colors, opac,
        proj.depths[0], proj.radii[0], width, height, background, isect_cap,
        update_cap=update_cap,
    )
    return RenderOut(image, alpha, proj.radii[0], n_isects)


def photometric_loss(image, gt_image, lambda_dssim: float = 0.2,
                     loss_scale: float = 1.0):
    """gt arrives as uint8-scaled float; clamp to [0,1] like FusedCompiledLoss
    (base_engine.py:89-103). loss_scale applies --lr_scale_loss uniformly."""
    gt = jnp.clip(gt_image, 0.0, 1.0)
    return combined_loss(image, gt, lambda_dssim) * loss_scale


class RenderBatchOut(NamedTuple):
    images: jnp.ndarray  # (G, 3, H, W)
    alphas: jnp.ndarray  # (G, H, W)
    radii: jnp.ndarray  # (G, C) 0 = culled
    n_isects: jnp.ndarray  # (G,)


def render_cams(
    params: GaussianParams,
    alive,
    viewmats,  # (G, 4, 4)
    Kmats,  # (G, 3, 3)
    campos,  # (G, 3)
    sh_degree,
    width: int,
    height: int,
    background,
    isect_cap: int,
    probe=None,  # (G, C, 2)
    update_cap: int = 0,
) -> RenderBatchOut:
    """Differentiable render of G cameras in ONE dispatch from the full
    padded buffer: batched projection/SH feed rasterize_batch, so every glue
    stage (depth sort, expansion, tile sort, gather, kernels, grad regroup)
    launches once per batch instead of once per camera. Per-camera math is
    identical to render_one_cam."""
    opac, scales = activated(params)
    G = viewmats.shape[0]
    C = params.capacity
    proj = fully_fused_projection(
        params.xyz, params.quat, scales, viewmats, Kmats, width, height,
        alive=alive,
    )
    means2d = proj.means2d
    if probe is not None:
        means2d = means2d + probe
    dirs = params.xyz[None, :, :] - campos[:, None, :]  # (G, C, 3)
    basis = sh_basis(dirs) * degree_mask(sh_degree)  # (G, C, 16)
    if os.environ.get("CLMGS_SH_FLAT", "0") == "1":
        colors = jnp.maximum(sh_color_flat(basis, params.sh) + 0.5, 0.0)
    else:
        colors = jnp.maximum(
            jnp.einsum("gnk,nkc->gnc", basis, sh_coeffs(params)) + 0.5, 0.0
        )
    if os.environ.get("CLMGS_RAST_BATCH") == "1":
        # one-dispatch binning/gather/kernels for all G cameras. Chip A/B at
        # bench scale measured this a NET LOSS (5.69 vs 9.7 Mpix/s): the
        # B*cap-row gather runs ~4x slower per row than per-camera gathers,
        # and batched/flat sorts lose to per-camera ones (xplane trace,
        # PARITY round-4) — kept as a gate for other hardware generations.
        images, alphas, n_isects = rasterize_batch(
            means2d, proj.conics, colors, jnp.broadcast_to(opac[None], (G, C)),
            proj.depths, proj.radii, width, height, background, isect_cap,
            update_cap=update_cap,
        )
        return RenderBatchOut(images, alphas, proj.radii, n_isects)
    # per-camera rasterize (unrolled): binning/gather/kernel element costs
    # are linear-or-worse in instance count on TPU, so only the genuinely
    # batch-amortizable stages (projection, SH, loss SSIM) run batched
    imgs, als, nis = [], [], []
    for b in range(G):
        img, al, ni = rasterize(
            means2d[b], proj.conics[b], colors[b], opac,
            proj.depths[b], proj.radii[b], width, height, background,
            isect_cap, update_cap=update_cap,
        )
        imgs.append(img)
        als.append(al)
        nis.append(ni)
    return RenderBatchOut(
        jnp.stack(imgs), jnp.stack(als), proj.radii, jnp.stack(nis)
    )


def photometric_loss_batch(images, gt_images, lambda_dssim: float = 0.2,
                           loss_scale: float = 1.0):
    """(G,) per-camera combined losses in one blurred pass."""
    gts = jnp.clip(gt_images, 0.0, 1.0)
    return combined_loss_batch(images, gts, lambda_dssim) * loss_scale
