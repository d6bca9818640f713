"""Training losses: L1, SSIM, cosine-normal, PSNR.

Parity: reference utils/loss_utils.py (ssim with 11x11 gaussian window σ=1.5,
C1=0.01², C2=0.03², same-padding conv) and utils/image_utils.py:21 (psnr).
Images are channels-last [H,W,C]."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred, gt):
    return jnp.mean(jnp.abs(pred - gt))


def l2_loss(pred, gt):
    return jnp.mean((pred - gt) ** 2)


def cos_loss(pred, gt):
    """1 - per-pixel dot product, averaged. pred/gt: [...,3] channels-last
    (reference sums over the channel dim, loss_utils.py:22-23)."""
    return jnp.mean(1.0 - jnp.sum(pred * gt, axis=-1))


@functools.lru_cache()
def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def _window_conv(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Depthwise gaussian blur with same padding, img [H,W,C]. The 2D window
    is separable (outer(g, g)) — run two 1D depthwise convs (11+11 taps
    instead of 121; the six blurs dominate the SSIM cost)."""
    c = img.shape[-1]
    k = window.shape[0]
    g1 = jnp.asarray(window[k // 2, :] / window[k // 2, :].sum(),
                     jnp.float32)
    kern_w = jnp.tile(g1[None, :, None, None], (1, 1, 1, c))   # (1,k,1,C)
    kern_h = jnp.tile(g1[:, None, None, None], (1, 1, 1, c))   # (k,1,1,C)
    x = img[None]  # NHWC
    for kern in (kern_w, kern_h):
        x = jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c, precision=jax.lax.Precision.HIGHEST)
    return x[0]


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM over the image, channels-last [H,W,C].

    The five blur targets (x, y, x², y², xy) are stacked on the channel axis
    so the whole statistic costs ONE separable depthwise conv pair instead of
    five — the blurs dominate SSIM's cost in the train step."""
    w = _gaussian_window(window_size)
    c = img1.shape[-1]
    stack = jnp.concatenate([img1, img2, img1 * img1, img2 * img2,
                             img1 * img2], axis=-1)
    b = _window_conv(stack, w)
    mu1, mu2 = b[..., :c], b[..., c:2 * c]
    m11, m22, m12 = b[..., 2 * c:3 * c], b[..., 3 * c:4 * c], b[..., 4 * c:]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = m11 - mu1_sq
    sigma2_sq = m22 - mu2_sq
    sigma12 = m12 - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = (((2 * mu1_mu2 + c1) * (2 * sigma12 + c2))
                / ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)))
    return jnp.mean(ssim_map)


def psnr(img1, img2):
    mse = jnp.mean((img1 - img2) ** 2)
    return 20 * jnp.log10(1.0 / jnp.sqrt(mse))


def photometric_loss(image, gt_image, lambda_dssim: float):
    """(1-λ)·L1 + λ·(1-SSIM)  (train.py:76-77)."""
    ll1 = l1_loss(image, gt_image)
    return (1.0 - lambda_dssim) * ll1 + lambda_dssim * (1.0 - ssim(image, gt_image)), ll1


def smooth_loss(disp, img):
    """Edge-aware disparity smoothness (reference loss_utils.py:35-42).
    disp [H,W,1] or [H,W]; img [H,W,3] channels-last."""
    if disp.ndim == 2:
        disp = disp[..., None]
    d = disp[..., 0]
    gdx = jnp.abs(d[1:-1, :-2] + d[1:-1, 2:] - 2 * d[1:-1, 1:-1])
    gdy = jnp.abs(d[:-2, 1:-1] + d[2:, 1:-1] - 2 * d[1:-1, 1:-1])
    gix = jnp.mean(jnp.abs(img[1:-1, :-2] - img[1:-1, 2:]), axis=-1) * 0.5
    giy = jnp.mean(jnp.abs(img[:-2, 1:-1] - img[2:, 1:-1]), axis=-1) * 0.5
    return jnp.mean(gdx * jnp.exp(-gix)) + jnp.mean(gdy * jnp.exp(-giy))
