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

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from clm_gs_tpu.models.gaussians import GaussianParams, activated, sh_coeffs
from clm_gs_tpu.ops.projection import fully_fused_projection
from clm_gs_tpu.ops.rasterize import rasterize
from clm_gs_tpu.ops.sh import degree_mask, sh_basis
from clm_gs_tpu.ops.ssim import combined_loss

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
