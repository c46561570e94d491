"""Reference (oracle) rasterizer in pure JAX.

A slow O(N * pixels) but exactly-semantics-matching implementation of tile-based
front-to-back alpha compositing, used as the differentiable ground truth for the
Pallas kernel's unit tests (SURVEY.md §4 "Implication for our build") and as a
CPU-runnable fallback. Semantics replicate gsplat's ``rasterize_to_pixels``
forward (reference call site strategies/base_engine.py:192-203):

  - a Gaussian contributes to a pixel only if the pixel's 16x16 tile intersects
    the Gaussian's radius bbox (tile-level masking, not a true circle test),
  - sigma = 0.5 (A dx^2 + C dy^2) + B dx dy evaluated at pixel centers (+0.5),
    contributions with sigma < 0 are skipped,
  - alpha = min(0.999, opacity * exp(-sigma)); alpha < 1/255 is skipped,
  - compositing front-to-back in depth order; a pixel terminates *before*
    compositing the Gaussian that would bring its transmittance T <= 1e-4,
  - output = accumulated rgb + T_final * background; alpha channel = 1 - T_final.

The sequential-break semantics are expressed with a cumulative formulation (see
ops/rasterize.py for the derivation) so the whole oracle is a couple of einsums
plus cumulative ops — fine for test-sized scenes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

ALPHA_THRESHOLD = 1.0 / 255.0
T_EPS = 1e-4
MAX_ALPHA = 0.999


def _compositing_weights(alphas):
    """Shared compositing math. alphas: (..., M, P) already thresholded/zeroed,
    ordered front-to-back along axis -2. Returns (weights, T_final) implementing
    the early-termination semantics."""
    log1m = jnp.log1p(-alphas)
    T_excl = jnp.exp(jnp.cumsum(log1m, axis=-2) - log1m)  # exclusive cumprod
    viol = (alphas > 0) & (T_excl * (1.0 - alphas) <= T_EPS)
    dead = jnp.cumsum(viol.astype(jnp.int32), axis=-2) > 0  # incl. own violation
    keep = ~dead
    w = alphas * T_excl * keep
    T_final = jnp.exp(jnp.sum(jnp.where(keep, log1m, 0.0), axis=-2))
    return w, T_final


@partial(jax.jit, static_argnames=("width", "height", "tile_size"))
def rasterize_reference(
    means2d,
    conics,
    colors,
    opacities,
    depths,
    radii,
    width: int,
    height: int,
    background=None,
    tile_size: int = 16,
):
    """Render one camera. All inputs (N, ...); returns (img (3,H,W), alpha (H,W))."""
    n = means2d.shape[0]
    order = jnp.argsort(jnp.where(radii > 0, depths, jnp.inf), stable=True)
    m = means2d[order]
    c = conics[order]
    col = colors[order]
    op = opacities[order]
    r = radii[order]

    px = (jnp.arange(width, dtype=jnp.float32) + 0.5)[None, :]
    py = (jnp.arange(height, dtype=jnp.float32) + 0.5)[:, None]
    px = jnp.broadcast_to(px, (height, width)).reshape(-1)  # (P,)
    py = jnp.broadcast_to(py, (height, width)).reshape(-1)

    # tile-level masking: pixel tile must be inside the gaussian's tile bbox
    tile_x = (jnp.arange(width) // tile_size)[None, :]
    tile_y = (jnp.arange(height) // tile_size)[:, None]
    tx = jnp.broadcast_to(tile_x, (height, width)).reshape(-1)
    ty = jnp.broadcast_to(tile_y, (height, width)).reshape(-1)
    gx0 = jnp.floor((m[:, 0] - r) / tile_size)
    gx1 = jnp.ceil((m[:, 0] + r) / tile_size)
    gy0 = jnp.floor((m[:, 1] - r) / tile_size)
    gy1 = jnp.ceil((m[:, 1] + r) / tile_size)
    in_tile = (
        (tx[None, :] >= gx0[:, None])
        & (tx[None, :] < gx1[:, None])
        & (ty[None, :] >= gy0[:, None])
        & (ty[None, :] < gy1[:, None])
        & (r[:, None] > 0)
    )  # (N, P)

    dx = px[None, :] - m[:, 0:1]
    dy = py[None, :] - m[:, 1:2]
    sigma = (
        0.5 * (c[:, 0:1] * dx * dx + c[:, 2:3] * dy * dy) + c[:, 1:2] * dx * dy
    )
    alpha = jnp.minimum(MAX_ALPHA, op[:, None] * jnp.exp(-sigma))
    alpha = jnp.where(
        in_tile & (sigma >= 0) & (alpha >= ALPHA_THRESHOLD), alpha, 0.0
    )

    w, T_final = _compositing_weights(alpha)  # (N, P), (P,)
    rgb = jnp.einsum("np,nc->cp", w, col)  # (3, P)
    if background is not None:
        rgb = rgb + T_final[None, :] * background[:, None]
    alpha_out = jnp.sum(w, axis=0)
    return rgb.reshape(3, height, width), alpha_out.reshape(height, width)
