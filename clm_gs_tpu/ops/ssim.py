"""Differentiable SSIM for the training loss.

Replaces both the reference's unfused windowed SSIM (utils/loss_utils.py:26-85)
and the clm_kernels.fused_ssim CUDA kernel (strategies/base_engine.py:93). Same
math: 11x11 Gaussian window (sigma 1.5), per-channel depthwise convolution with
same-padding, C1=0.01^2, C2=0.03^2, mean over all pixels.

On TPU the Gaussian window is separable, so we run two 1-D depthwise
convolutions; XLA fuses the remaining elementwise chain — this is effectively
the "fused" SSIM without a hand-written kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size, dtype=np.float64) - window_size // 2
    g = np.exp(-(xs**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


@partial(jax.jit, static_argnames=("window_size",))
def ssim(img, gt, window_size: int = 11):
    """img, gt: (3, H, W) in [0,1]. Returns scalar mean SSIM."""
    w1d = jnp.asarray(_gaussian_window(window_size, 1.5))

    def blur(x):
        # separable depthwise conv with same padding, feature_group_count=C
        c = x.shape[0]
        kh = jnp.tile(w1d.reshape(1, 1, window_size, 1), (c, 1, 1, 1))
        kw = jnp.tile(w1d.reshape(1, 1, 1, window_size), (c, 1, 1, 1))
        y = jax.lax.conv_general_dilated(
            x[None], kh, (1, 1), [(window_size // 2,) * 2, (0, 0)],
            feature_group_count=c,
        )
        y = jax.lax.conv_general_dilated(
            y, kw, (1, 1), [(0, 0), (window_size // 2,) * 2],
            feature_group_count=c,
        )
        return y[0]

    mu1 = blur(img)
    mu2 = blur(gt)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = blur(img * img) - mu1_sq
    sigma2_sq = blur(gt * gt) - mu2_sq
    sigma12 = blur(img * gt) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)


def l1_loss(img, gt):
    return jnp.mean(jnp.abs(img - gt))


LAMBDA_DSSIM = 0.2


def combined_loss(image, image_gt, lambda_dssim: float = LAMBDA_DSSIM):
    """(1-l) L1 + l (1 - SSIM), the training loss (base_engine.py:79-103;
    --lambda_dssim, default 0.2)."""
    return (1.0 - lambda_dssim) * l1_loss(image, image_gt) + lambda_dssim * (
        1.0 - ssim(image, image_gt)
    )


def l1_loss_pixelwise_masked(img, gt, mask):
    """Masked pixelwise L1 (loss_utils.py:88-106): mean over masked pixels."""
    diff = jnp.abs(img - gt) * mask
    return jnp.sum(diff) / jnp.maximum(jnp.sum(mask) * img.shape[0], 1.0)


@partial(jax.jit, static_argnames=("window_size",))
def ssim_masked(img, gt, mask, window_size: int = 11):
    """Masked SSIM (loss_utils.py:108-132): mean of the SSIM map over masked
    pixels only."""
    w1d = jnp.asarray(_gaussian_window(window_size, 1.5))

    def blur(x):
        c = x.shape[0]
        kh = jnp.tile(w1d.reshape(1, 1, window_size, 1), (c, 1, 1, 1))
        kw = jnp.tile(w1d.reshape(1, 1, 1, window_size), (c, 1, 1, 1))
        y = jax.lax.conv_general_dilated(
            x[None], kh, (1, 1), [(window_size // 2,) * 2, (0, 0)],
            feature_group_count=c,
        )
        y = jax.lax.conv_general_dilated(
            y, kw, (1, 1), [(0, 0), (window_size // 2,) * 2],
            feature_group_count=c,
        )
        return y[0]

    mu1, mu2 = blur(img), blur(gt)
    s1 = blur(img * img) - mu1 * mu1
    s2 = blur(gt * gt) - mu2 * mu2
    s12 = blur(img * gt) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2)
    )
    return jnp.sum(m * mask) / jnp.maximum(jnp.sum(mask) * img.shape[0], 1.0)
