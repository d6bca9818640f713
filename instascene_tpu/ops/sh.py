"""Spherical harmonics evaluation (degrees 0-3), fully vectorized jnp.

Parity targets: reference utils/sh_utils.py (eval_sh/RGB2SH/SH2RGB) and the CUDA
computeColorFromSH (cuda_rasterizer/forward.cu:20-71): same constants, same
`+0.5, clamp at 0` convention, and the clamp is a real max (its VJP zeroes the
gradient of clamped channels, matching backward.cu:31-34).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)


def RGB2SH(rgb):
    return (rgb - 0.5) / C0


def SH2RGB(sh):
    return sh * C0 + 0.5


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh(deg: int, sh, dirs):
    """Evaluate SH basis.

    sh: [..., K, 3] coefficients with K >= (deg+1)^2 (extra coeffs ignored —
        matches the CUDA kernel which reads only the active degree).
    dirs: [..., 3] unit view directions.
    Returns [..., 3] raw SH color (before the +0.5 / clamp).
    """
    result = C0 * sh[..., 0, :]
    if deg > 0:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        result = (result - C1 * y * sh[..., 1, :] + C1 * z * sh[..., 2, :]
                  - C1 * x * sh[..., 3, :])
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result
                      + C2[0] * xy * sh[..., 4, :]
                      + C2[1] * yz * sh[..., 5, :]
                      + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                      + C2[3] * xz * sh[..., 7, :]
                      + C2[4] * (xx - yy) * sh[..., 8, :])
            if deg > 2:
                result = (result
                          + C3[0] * y * (3 * xx - yy) * sh[..., 9, :]
                          + C3[1] * xy * z * sh[..., 10, :]
                          + C3[2] * y * (4 * zz - xx - yy) * sh[..., 11, :]
                          + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12, :]
                          + C3[4] * x * (4 * zz - xx - yy) * sh[..., 13, :]
                          + C3[5] * z * (xx - yy) * sh[..., 14, :]
                          + C3[6] * x * (xx - 3 * yy) * sh[..., 15, :])
    return result


def sh_to_color(deg: int, sh, means3d, campos):
    """Per-Gaussian RGB from SH, matching CUDA computeColorFromSH exactly:
    color = max(eval_sh + 0.5, 0). Uses jnp.maximum so the clamp zeroes grads.

    sh: [N, K, 3]; means3d: [N, 3]; campos: [3]. Returns [N, 3].
    """
    d = means3d - campos[None, :]
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    return jnp.maximum(eval_sh(deg, sh, d) + 0.5, 0.0)


def eval_sh_np(deg: int, sh: np.ndarray, dirs: np.ndarray) -> np.ndarray:
    """Numpy mirror of eval_sh for host-side tests."""
    import numpy as jnp_like  # noqa: F401
    result = C0 * sh[..., 0, :]
    if deg > 0:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = result - C1 * y * sh[..., 1, :] + C1 * z * sh[..., 2, :] - C1 * x * sh[..., 3, :]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result + C2[0] * xy * sh[..., 4, :] + C2[1] * yz * sh[..., 5, :]
                      + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                      + C2[3] * xz * sh[..., 7, :] + C2[4] * (xx - yy) * sh[..., 8, :])
            if deg > 2:
                result = (result + C3[0] * y * (3 * xx - yy) * sh[..., 9, :]
                          + C3[1] * xy * z * sh[..., 10, :]
                          + C3[2] * y * (4 * zz - xx - yy) * sh[..., 11, :]
                          + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12, :]
                          + C3[4] * x * (4 * zz - xx - yy) * sh[..., 13, :]
                          + C3[5] * z * (xx - yy) * sh[..., 14, :]
                          + C3[6] * x * (xx - 3 * yy) * sh[..., 15, :])
    return result
