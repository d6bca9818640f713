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


@functools.lru_cache()
def _blur_matrix(n: int, window_size: int = 11,
                 sigma: float = 1.5) -> np.ndarray:
    """[n, n] banded separable-blur matrix. Rows near the border truncate
    their taps without renormalizing — exactly the reference conv's SAME
    zero-padding semantics (utils/loss_utils.py uses F.conv2d pad=w//2)."""
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2 * sigma ** 2)).astype(np.float64)
    g = g / g.sum()
    m = np.zeros((n, n), np.float32)
    for o, w in zip(xs, g):
        d = np.full(n - abs(o), np.float32(w))
        m += np.diag(d, k=int(o))
    return m


def _window_conv(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Separable gaussian blur with zero-pad SAME semantics, img [H,W,C].

    Formulated as two banded-matrix contractions instead of depthwise convs:
    XLA lowers depthwise conv to the VPU (measured 10.4 ms for the SSIM
    value+grad at 976x728x15 on v5e), while these dots ride the MXU — the
    band matrices are tiny per-resolution constants and autodiff's transposes
    are matmuls too."""
    k = window.shape[0]
    h, w = img.shape[0], img.shape[1]
    mh = jnp.asarray(_blur_matrix(h, k))
    mw = jnp.asarray(_blur_matrix(w, k))
    hi = jax.lax.Precision.HIGHEST
    x = jnp.tensordot(mh, img, axes=[[1], [0]], precision=hi)   # [H,W,C]
    return jnp.einsum("hwc,wv->hvc", x, mw, precision=hi)       # [H,W,C]


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
