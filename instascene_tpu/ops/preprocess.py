"""Per-Gaussian preprocessing: splat→pixel homography, view normals, screen AABB.

Pure jnp and fully differentiable — JAX autodiff over these formulas reproduces
the reference's hand-derived backward (cuda_rasterizer/backward.cu:469-656).

Behavioral parity: cuda_rasterizer/forward.cu:75-251 (compute_transmat,
compute_aabb, preprocessCUDA) and auxiliary.h (in_frustum :186, getRect :68,
quat_to_rotmat :214, constants :38-41).

Convention: T[n] is a 3x3 matrix whose ROWS (Tu, Tv, Tw) map splat-tangent
homogeneous coords (u, v, 1) to (x_pix*w, y_pix*w, w):
    T[n] = ndc2pix(3x4) @ full_proj(4x4) @ splat2world[n](4x3)
(the reference stores the same object as glm columns due to its transposed
matrix-memory convention).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

# Constants from cuda_rasterizer/auxiliary.h:38-41 and config.h
NEAR_N = 0.2
FAR_N = 100.0
FILTER_SIZE = 0.707106  # sqrt(2)/2 low-pass radius
FILTER_INV_SQUARE = 2.0
CUTOFF = 3.0  # 3-sigma splat extent

_HI = jax.lax.Precision.HIGHEST


class PreprocessOut(NamedTuple):
    T: jnp.ndarray            # [N,3,3] rows (Tu,Tv,Tw)
    normal_view: jnp.ndarray  # [N,3] view-space normal, dual-visibility signed
    depth: jnp.ndarray        # [N] view-space z (sorting key)
    xy: jnp.ndarray           # [N,2] AABB / low-pass filter center (pixels)
    radius: jnp.ndarray       # [N] f32 screen radius (ceil'd; 0 when invalid)
    rect_min: jnp.ndarray     # [N,2] int32 (tile_x, tile_y) inclusive
    rect_max: jnp.ndarray     # [N,2] int32 exclusive
    tiles_touched: jnp.ndarray  # [N] int32
    valid: jnp.ndarray        # [N] bool
    color: jnp.ndarray        # [N,3]


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[N,4] (w,x,y,z) quaternion (unnormalized ok) → [N,3,3].
    The +1e-12 keeps the all-zero quaternions of dead capacity slots from
    producing inf/NaN that would poison gradients through masked lanes."""
    q = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], axis=1)


def ndc2pix_rows(width: int, height: int, y_offset=None) -> jnp.ndarray:
    """NDC→pixel rows. `y_offset` (traced scalar ok) shifts the pixel-y
    origin: a horizontal slab [y_offset, y_offset+h_local) of a full
    `height`-tall image renders in local coordinates — the basis of
    image-space (tile-slab) sharded rendering, where each device folds its
    slab offset into T instead of touching the kernels."""
    m = jnp.array([
        [width / 2.0, 0, 0, (width - 1) / 2.0],
        [0, height / 2.0, 0, (height - 1) / 2.0],
        [0, 0, 0, 1.0]], dtype=jnp.float32)
    if y_offset is not None:
        m = m.at[1, 3].add(-jnp.asarray(y_offset, jnp.float32))
    return m


def preprocess_gaussians(
        xyz: jnp.ndarray,          # [N,3]
        scaling: jnp.ndarray,      # [N,2] activated (exp) scales
        rotation: jnp.ndarray,     # [N,4] quaternion (w,x,y,z)
        w2v: jnp.ndarray,          # [4,4]
        full_proj: jnp.ndarray,    # [4,4]
        campos: jnp.ndarray,       # [3]
        width: int, height: int,
        color: Optional[jnp.ndarray] = None,   # [N,3] precomputed colors
        shs: Optional[jnp.ndarray] = None,     # [N,K,3]
        sh_degree: int = 0,
        scale_modifier: float = 1.0,
        tile: int = 16,
        alive: Optional[jnp.ndarray] = None,
        y_offset=None,                # traced ok: slab origin in pixels
        full_height: Optional[int] = None) -> PreprocessOut:
    """`y_offset`/`full_height`: render a horizontal slab of a
    `full_height`-tall image into local [0, height) pixel rows — the NDC
    mapping uses the full image, the AABB/tile clamps the local slab."""
    n = xyz.shape[0]
    f32 = jnp.float32
    xyz = xyz.astype(f32)

    # frustum cull (auxiliary.h:186-211): view z > 0.2
    p_view = jnp.einsum('nk,jk->nj', xyz, w2v[:3, :3], precision=_HI) + w2v[:3, 3]
    in_frustum = p_view[:, 2] > 0.2

    # splat2world: columns su*R[:,0], sv*R[:,1], center (forward.cu:88-97)
    R = quat_to_rotmat(rotation.astype(f32))
    su = scaling[:, 0:1].astype(f32) * scale_modifier
    sv = scaling[:, 1:2].astype(f32) * scale_modifier
    axis_u = R[:, :, 0] * su
    axis_v = R[:, :, 1] * sv
    normal_world = R[:, :, 2]

    # T = ndc2pix @ full_proj @ splat2world  (forward.cu:99-112)
    n2p_full = ndc2pix_rows(width, full_height or height, y_offset
                            ) @ full_proj.astype(f32)  # [3,4]
    # S2W[n] columns: [axis_u;0], [axis_v;0], [xyz;1]  → contract explicitly
    Tu_col = jnp.einsum('nk,jk->nj', axis_u, n2p_full[:, :3], precision=_HI)
    Tv_col = jnp.einsum('nk,jk->nj', axis_v, n2p_full[:, :3], precision=_HI)
    Tc_col = jnp.einsum('nk,jk->nj', xyz, n2p_full[:, :3], precision=_HI) + n2p_full[:, 3]
    # T rows index (x,y,w); columns index (u,v,1):
    T = jnp.stack([Tu_col, Tv_col, Tc_col], axis=-1)          # [N,3,3]

    # view-space normal with dual-visibility sign flip (forward.cu:113,209-214)
    normal_view = jnp.einsum('nk,jk->nj', normal_world, w2v[:3, :3], precision=_HI)
    cos = -jnp.sum(p_view * normal_view, axis=-1)
    multiplier = jnp.where(cos > 0, 1.0, -1.0)
    normal_view = normal_view * multiplier[:, None]

    # AABB and low-pass center (forward.cu:119-145,223-231), cutoff=3.
    # Degenerate-splat guards: the CUDA kernel only checks d != 0; under
    # autodiff an inf/NaN *value* on a culled lane still poisons gradients
    # (0-cotangent × inf = NaN), so cull near-degenerate d relative to the
    # magnitude of Tw and clamp the center into a finite range. Exact for
    # every gaussian that can actually contribute.
    t_vec = jnp.array([CUTOFF * CUTOFF, CUTOFF * CUTOFF, -1.0], dtype=f32)
    Tw = T[:, 2, :]
    d = jnp.sum(t_vec * Tw * Tw, axis=-1)
    d_scale = jnp.sum(jnp.abs(t_vec) * Tw * Tw, axis=-1)
    d_ok = (jnp.abs(d) > 1e-7 * d_scale) & (d_scale > 0)
    d_safe = jnp.where(d_ok, d, 1.0)
    f_vec = t_vec / d_safe[:, None]
    center_x = jnp.sum(f_vec * T[:, 0, :] * Tw, axis=-1)
    center_y = jnp.sum(f_vec * T[:, 1, :] * Tw, axis=-1)
    center_x = jnp.clip(center_x, -1e7, 1e7)
    center_y = jnp.clip(center_y, -1e7, 1e7)
    h0x = center_x * center_x - jnp.sum(f_vec * T[:, 0, :] * T[:, 0, :], axis=-1)
    h0y = center_y * center_y - jnp.sum(f_vec * T[:, 1, :] * T[:, 1, :], axis=-1)
    ext_x = jnp.sqrt(jnp.clip(h0x, 1e-4, 1e14))
    ext_y = jnp.sqrt(jnp.clip(h0y, 1e-4, 1e14))
    finite = (jnp.isfinite(center_x) & jnp.isfinite(center_y)
              & jnp.isfinite(ext_x) & jnp.isfinite(ext_y))
    center_x = jnp.where(finite, center_x, 0.0)
    center_y = jnp.where(finite, center_y, 0.0)
    ext_x = jnp.where(finite, ext_x, 0.0)
    ext_y = jnp.where(finite, ext_y, 0.0)
    xy = jnp.stack([center_x, center_y], axis=-1)
    radius = jnp.ceil(jnp.maximum(jnp.maximum(ext_x, ext_y),
                                  CUTOFF * FILTER_SIZE))

    # tile rect. The reference uses a SQUARE of the max extent
    # (auxiliary.h:68-78 getRect with scalar max_radius); we use the tight
    # per-axis AABB of the 3σ ellipse instead — strictly fewer (gaussian,
    # tile) pairs for anisotropic surfels at identical visible output (tiles
    # outside the tight box see only G < e^{-9/2} corner contributions the
    # square box happened to include). The low-pass filter footprint
    # (CUTOFF·FILTER_SIZE px) stays a lower bound per axis.
    rx = jnp.ceil(jnp.maximum(ext_x, CUTOFF * FILTER_SIZE))
    ry = jnp.ceil(jnp.maximum(ext_y, CUTOFF * FILTER_SIZE))
    grid_x = (width + tile - 1) // tile
    grid_y = (height + tile - 1) // tile
    rmin_x = jnp.clip(jnp.floor((xy[:, 0] - rx) / tile), 0, grid_x)
    rmin_y = jnp.clip(jnp.floor((xy[:, 1] - ry) / tile), 0, grid_y)
    rmax_x = jnp.clip(jnp.floor((xy[:, 0] + rx + tile - 1) / tile), 0, grid_x)
    rmax_y = jnp.clip(jnp.floor((xy[:, 1] + ry + tile - 1) / tile), 0, grid_y)
    rect_min = jnp.stack([rmin_x, rmin_y], axis=-1).astype(jnp.int32)
    rect_max = jnp.stack([rmax_x, rmax_y], axis=-1).astype(jnp.int32)
    tiles = (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1])

    valid = in_frustum & d_ok & finite & (tiles > 0)
    if alive is not None:
        valid = valid & alive
    tiles_touched = jnp.where(valid, tiles, 0).astype(jnp.int32)
    radius = jnp.where(valid, radius, 0.0)

    if color is None:
        from .sh import sh_to_color
        color = sh_to_color(sh_degree, shs.astype(f32), xyz, campos.astype(f32))
    else:
        color = color.astype(f32)

    return PreprocessOut(T=T, normal_view=normal_view, depth=p_view[:, 2],
                         xy=xy, radius=radius, rect_min=rect_min,
                         rect_max=rect_max, tiles_touched=tiles_touched,
                         valid=valid, color=color)


def mark_visible(xyz: jnp.ndarray, w2v: jnp.ndarray) -> jnp.ndarray:
    """Frustum visibility test (ext.cpp markVisible / rasterize_points.cu:264-283)."""
    p_view = jnp.einsum('nk,jk->nj', xyz, w2v[:3, :3], precision=_HI) + w2v[:3, 3]
    return p_view[:, 2] > 0.2
