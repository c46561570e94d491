"""Differentiable SSIM for the training loss.

Replaces both the reference's unfused windowed SSIM (utils/loss_utils.py:26-85)
and the clm_kernels.fused_ssim CUDA kernel (strategies/base_engine.py:93). Same
math: 11x11 Gaussian window (sigma 1.5), per-channel depthwise convolution with
same-padding (zero padding), C1=0.01^2, C2=0.03^2, mean over all pixels.

TPU note: a depthwise conv with C=3 maps terribly onto XLA:TPU (3 channels
cannot fill the 8-sublane x 128-lane registers; measured 44 ms fwd+bwd at
1 Mpix). The window is separable, so each 1-D blur is instead an unrolled
11-tap weighted sum of shifted slices — pure VPU adds that XLA fuses into a
couple of bandwidth-bound passes — and all five blurred maps (img, gt, img^2,
gt^2, img*gt) ride one stacked call so the tap slices are shared.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import os

WINDOW_SIZE = 11
SIGMA = 1.5


def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size, dtype=np.float64) - window_size // 2
    g = np.exp(-(xs**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur_axis1(x, w, window_size: int):
    """11-tap blur along axis 1 of (C, A, B) via shifted slices. Axis 1 is
    the SUBLANE axis on TPU, where shifted-slice sums fuse into one
    bandwidth-bound pass; the same sum along the lane (minor) axis forces a
    lane rotation per tap (~11x the traffic in relayouts)."""
    half = window_size // 2
    A = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (half, half), (0, 0)))
    return sum(float(w[k]) * xp[:, k : k + A, :] for k in range(window_size))


def _blur_sep(x, window_size: int):
    """Separable Gaussian blur of (C, H, W) with zero ('same') padding,
    written as unrolled shifted-slice sums (no conv op).

    Default path runs BOTH 1-D blurs along the sublane axis, transposing the
    pixel plane between them: transpose costs ~2 extra bandwidth passes but
    replaces 11 lane-rotation relayouts (chip A/B 2026-08-20, 60-channel
    1237x822 stack, fwd+bwd: see tools/ssim_probe.py). CLMGS_SSIM_T=0
    restores the lane-shift form. Output is bitwise identical between the
    two (same tap order and f32 math, only the layout differs)."""
    w = _gaussian_window(window_size, SIGMA)
    x = _blur_axis1(x, w, window_size)  # blur H (sublanes)
    if os.environ.get("CLMGS_SSIM_T", "1") != "0":
        xt = jnp.transpose(x, (0, 2, 1))  # (C, W, H)
        xt = _blur_axis1(xt, w, window_size)  # blur W (now sublanes)
        return jnp.transpose(xt, (0, 2, 1))
    half = window_size // 2
    W = x.shape[2]
    xp = jnp.pad(x, ((0, 0), (0, 0), (half, half)))
    return sum(float(w[k]) * xp[:, :, k : k + W] for k in range(window_size))


def _ssim_map(img, gt, window_size: int):
    stacked = jnp.concatenate(
        [img, gt, img * img, gt * gt, img * gt], axis=0
    )
    c = img.shape[0]
    b = _blur_sep(stacked, window_size)
    mu1, mu2 = b[0:c], b[c : 2 * c]
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = b[2 * c : 3 * c] - mu1_sq
    sigma2_sq = b[3 * c : 4 * c] - mu2_sq
    sigma12 = b[4 * c : 5 * c] - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    return ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )


@partial(jax.jit, static_argnames=("window_size",))
def ssim(img, gt, window_size: int = WINDOW_SIZE):
    """img, gt: (3, H, W) in [0,1]. Returns scalar mean SSIM."""
    return jnp.mean(_ssim_map(img, gt, window_size))


def l1_loss(img, gt):
    return jnp.mean(jnp.abs(img - gt))


LAMBDA_DSSIM = 0.2


def combined_loss(image, image_gt, lambda_dssim: float = LAMBDA_DSSIM):
    """(1-l) L1 + l (1 - SSIM), the training loss (base_engine.py:79-103;
    --lambda_dssim, default 0.2)."""
    return (1.0 - lambda_dssim) * l1_loss(image, image_gt) + lambda_dssim * (
        1.0 - ssim(image, image_gt)
    )


def combined_loss_batch(images, gts, lambda_dssim: float = LAMBDA_DSSIM):
    """Per-camera combined loss for a (B, 3, H, W) batch in ONE blur pass —
    _ssim_map treats the leading axis as channels, so all B*3 channels (and
    their five blurred maps) ride one stacked shifted-slice sum instead of B
    separate 11-tap chains. Returns (B,) losses, each identical in math to
    combined_loss on that camera."""
    Bc, c, Hh, Ww = images.shape
    m = _ssim_map(
        images.reshape(Bc * c, Hh, Ww), gts.reshape(Bc * c, Hh, Ww),
        WINDOW_SIZE,
    )
    ssim_b = jnp.mean(m.reshape(Bc, c, Hh, Ww), axis=(1, 2, 3))
    l1_b = jnp.mean(jnp.abs(images - gts), axis=(1, 2, 3))
    return (1.0 - lambda_dssim) * l1_b + lambda_dssim * (1.0 - ssim_b)


def l1_loss_pixelwise_masked(img, gt, mask):
    """Masked pixelwise L1 reduced to a mean over masked pixels."""
    diff = jnp.abs(img - gt) * mask
    return jnp.sum(diff) / jnp.maximum(jnp.sum(mask) * img.shape[0], 1.0)


@partial(jax.jit, static_argnames=("window_size",))
def ssim_masked(img, gt, mask, window_size: int = WINDOW_SIZE):
    """Masked SSIM: mean of the SSIM map over masked pixels only."""
    m = _ssim_map(img, gt, window_size)
    return jnp.sum(m * mask) / jnp.maximum(jnp.sum(mask) * img.shape[0], 1.0)


@jax.jit
def pixelwise_l1_with_mask(img, gt, mask):
    """Exact analogue of the reference's pixelwise masked L1
    (utils/loss_utils.py:88-95): returns the (3, H, W) map of |img - gt|
    zeroed outside the (H, W) mask — no reduction."""
    return jnp.abs(img - gt) * mask[None, :, :]


@partial(jax.jit, static_argnames=("window_size",))
def pixelwise_ssim_with_mask(img, gt, mask, window_size: int = WINDOW_SIZE):
    """Exact analogue of the reference's pixelwise masked SSIM
    (utils/loss_utils.py:98-132): the per-pixel SSIM map (same 11x11
    sigma-1.5 window, zero same-padding) zeroed outside the mask."""
    return _ssim_map(img, gt, window_size) * mask[None, :, :]
