"""General helpers: LR schedules, quaternion math, seeding, image conversion.

Behavioral parity targets: /root/reference/utils/general_utils.py (get_expon_lr_func
:38-71, build_rotation :90-110, PILtoTorch :24, safe_state :126-148) — re-implemented
for numpy/jnp, channels-last images.
"""

from __future__ import annotations

import random
import time

import numpy as np


def inverse_sigmoid(x):
    import jax.numpy as jnp
    if isinstance(x, np.ndarray) or np.isscalar(x):
        return np.log(np.asarray(x) / (1 - np.asarray(x)))
    return jnp.log(x / (1 - x))


def get_expon_lr_func(lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
                      max_steps=1000000):
    """Log-linear interpolated LR with optional delayed cosine warmup.

    Matches reference utils/general_utils.py:38-71: returns 0 when step<0 or
    both lrs are 0; clamps step progress to [0,1]."""

    def helper(step):
        if step < 0 or (lr_init == 0.0 and lr_final == 0.0):
            return 0.0
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * np.sin(
                0.5 * np.pi * np.clip(step / lr_delay_steps, 0, 1))
        else:
            delay_rate = 1.0
        t = np.clip(step / max_steps, 0, 1)
        log_lerp = np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
        return delay_rate * log_lerp

    return helper


def build_rotation_np(q: np.ndarray) -> np.ndarray:
    """Quaternion (w,x,y,z ordering as stored: rot_0..3 = r,x,y,z) → rotation matrix.

    Matches reference utils/general_utils.py:90-110 (normalizes first).
    q: [N,4] → [N,3,3]."""
    norm = np.sqrt((q * q).sum(axis=-1, keepdims=True))
    q = q / np.maximum(norm, 1e-12)
    r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.zeros((q.shape[0], 3, 3), dtype=q.dtype)
    R[:, 0, 0] = 1 - 2 * (y * y + z * z)
    R[:, 0, 1] = 2 * (x * y - r * z)
    R[:, 0, 2] = 2 * (x * z + r * y)
    R[:, 1, 0] = 2 * (x * y + r * z)
    R[:, 1, 1] = 1 - 2 * (x * x + z * z)
    R[:, 1, 2] = 2 * (y * z - r * x)
    R[:, 2, 0] = 2 * (x * z - r * y)
    R[:, 2, 1] = 2 * (y * z + r * x)
    R[:, 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def build_rotation(q):
    """jnp version of build_rotation_np. q: [N,4] (w,x,y,z) → [N,3,3]."""
    import jax.numpy as jnp
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
        2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
        2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return R.reshape(q.shape[:-1] + (3, 3))


def safe_state(quiet: bool = False, seed: int = 0):
    """Seed python/numpy RNG (reference utils/general_utils.py:126-148)."""
    random.seed(seed)
    np.random.seed(seed)


def pil_to_array(pil_image, resolution=None, resize_nearest=False, scale=True):
    """PIL image → float32 [H,W,C] in [0,1] (or raw ints when scale=False).

    Mirror of reference PILtoTorch (utils/general_utils.py:24-35) but channels-last.
    resolution: (W, H) tuple."""
    from PIL import Image
    if resolution is not None and tuple(pil_image.size) != tuple(resolution):
        method = Image.NEAREST if resize_nearest else Image.BICUBIC
        pil_image = pil_image.resize(resolution, method)
    arr = np.array(pil_image)
    if scale:
        arr = arr.astype(np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


class StepTimer:
    """Wall-clock EMA step timer (replaces the reference's cuda-event pairs)."""

    def __init__(self, alpha=0.1):
        self.alpha = alpha
        self.ema = None
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.ema = dt if self.ema is None else (
            self.alpha * dt + (1 - self.alpha) * self.ema)
        return dt
