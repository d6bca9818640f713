"""Depth-map → point-cloud / pseudo-surface-normal conversion.

Parity: reference utils/point_utils.py:10-40 (depths_to_points, depth_to_normal).
Differentiable jnp — the normal-consistency loss backprops through these finite
differences. Note the reference's effective intrinsic uses image center W/2
(not the rasterizer's (W-1)/2 convention) and rays through integer pixel
coords; both kept."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def camera_rays(width: int, height: int, tanfovx: float, tanfovy: float,
                c2w_rot: np.ndarray) -> np.ndarray:
    """World-space (unnormalized) ray directions per pixel [H,W,3]."""
    fx = width / (2 * tanfovx)
    fy = height / (2 * tanfovy)
    x = (np.arange(width, dtype=np.float32) - width / 2) / fx
    y = (np.arange(height, dtype=np.float32) - height / 2) / fy
    xx, yy = np.meshgrid(x, y)
    dirs_cam = np.stack([xx, yy, np.ones_like(xx)], axis=-1)
    return (dirs_cam @ c2w_rot.T).astype(np.float32)


def depths_to_points(depth: jnp.ndarray, rays_world: jnp.ndarray,
                     cam_center: jnp.ndarray) -> jnp.ndarray:
    """depth [H,W] → world points [H,W,3]: p = depth * ray + origin."""
    return depth[..., None] * rays_world + cam_center[None, None, :]


def depth_to_normal(depth: jnp.ndarray, rays_world: jnp.ndarray,
                    cam_center: jnp.ndarray) -> jnp.ndarray:
    """Pseudo surface normal from central differences of unprojected points
    (utils/point_utils.py:29-40). Zero on the 1-px border. [H,W,3]."""
    import jax
    pts = depths_to_points(depth, rays_world, cam_center)
    dx = pts[2:, 1:-1] - pts[:-2, 1:-1]
    dy = pts[1:-1, 2:] - pts[1:-1, :-2]
    nrm = jnp.cross(dx, dy)
    # rsqrt(|n|²+eps) instead of /norm: NaN-free gradients at zero-cross
    # (constant-depth/background) pixels
    nrm = nrm * jax.lax.rsqrt(jnp.sum(nrm * nrm, axis=-1, keepdims=True)
                              + 1e-24)
    return jnp.pad(nrm, ((1, 1), (1, 1), (0, 0)))
