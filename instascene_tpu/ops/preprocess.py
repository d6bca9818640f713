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
    # conic pair-culling bitmasks (conic_cull_masks): bit k set ⟺ row-major
    # tile offset k of the rect is KEPT. tiles_touched already counts only
    # kept offsets; bin_gaussians maps pair rank → k-th set bit. None when
    # conic culling is off.
    cull_lo: Optional[jnp.ndarray] = None  # [N] uint32 offsets 0..31
    cull_hi: Optional[jnp.ndarray] = None  # [N] uint32 offsets 32..63


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
        full_height: Optional[int] = None,
        opacity: Optional[jnp.ndarray] = None,
        conic_cull: bool = False) -> PreprocessOut:
    """`y_offset`/`full_height`: render a horizontal slab of a
    `full_height`-tall image into local [0, height) pixel rows — the NDC
    mapping uses the full image, the AABB/tile clamps the local slab.

    `opacity` ([N] or [N,1], activated) enables opacity-aware tile culling:
    the blend kernels skip every contribution with alpha < 1/255
    (forward.cu:386, backward.cu:324 — matched exactly by ops/blend.py and
    the Pallas kernels), so a gaussian with opacity o can only contribute
    where rho <= thr(o) = 2·ln(255·o). For o < e^{4.5}/255 ≈ 0.353 that
    level set is strictly inside the 3σ cutoff the reference bins with —
    the tile rect shrinks to the thr-level conic AABB ∪ the thr-level
    low-pass disk, producing strictly fewer (gaussian, tile) pairs at
    BIT-IDENTICAL output and gradients (every culled pair fails the
    in-kernel alpha mask). radius / valid / visibility keep the reference's
    opacity-blind 3σ semantics so densify stats stay in parity."""
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

    if opacity is not None:
        # opacity-aware culling (see docstring): shrink the box to the
        # thr-level set, thr = 2·ln(255·o) clamped to (0.72, 9]. The
        # contribution region is {rho3d <= thr} ∪ {rho2d <= thr}; the first
        # is the conic AABB with t_vec (thr, thr, -1) — same derivation as
        # the 3σ box above (forward.cu:119-145 with cutoff² = thr) but the
        # conic "center" moves with thr, so the box is computed afresh —
        # the second a disk of radius sqrt(thr/FILTER_INV_SQUARE) around the
        # low-pass center xy. Numerically-degenerate lanes fall back to the
        # 3σ box (a superset — always correct).
        opa = jnp.clip(jnp.reshape(opacity, (-1,)).astype(f32), 1e-12, 1.0)
        thr = jnp.clip(2.0 * jnp.log(255.0 * opa), 0.72, CUTOFF * CUTOFF)
        d_t = jnp.sum(jnp.stack([thr, thr, -jnp.ones_like(thr)], -1)
                      * Tw * Tw, axis=-1)
        dt_ok = (jnp.abs(d_t) > 1e-7 * d_scale) & (d_scale > 0)
        f_t = jnp.stack([thr, thr, -jnp.ones_like(thr)], -1) \
            / jnp.where(dt_ok, d_t, 1.0)[:, None]
        ctx = jnp.clip(jnp.sum(f_t * T[:, 0, :] * Tw, axis=-1), -1e7, 1e7)
        cty = jnp.clip(jnp.sum(f_t * T[:, 1, :] * Tw, axis=-1), -1e7, 1e7)
        h0x_t = ctx * ctx - jnp.sum(f_t * T[:, 0, :] * T[:, 0, :], axis=-1)
        h0y_t = cty * cty - jnp.sum(f_t * T[:, 1, :] * T[:, 1, :], axis=-1)
        ext_tx = jnp.sqrt(jnp.clip(h0x_t, 1e-4, 1e14))
        ext_ty = jnp.sqrt(jnp.clip(h0y_t, 1e-4, 1e14))
        ok_t = (dt_ok & jnp.isfinite(ctx) & jnp.isfinite(cty)
                & jnp.isfinite(ext_tx) & jnp.isfinite(ext_ty) & (thr < 8.99))
        r2d = jnp.sqrt(thr / FILTER_INV_SQUARE)
        # 0.5-px guard absorbs f32 rounding of the conic-AABB cancellation
        # (center² − f·T·T) and of the kernel's per-pixel rho; the tile-floor
        # conversion must be a TRUE ceil — floor((hi + tile − 1)/tile) only
        # equals ceil for integer operands, and these bounds are fractional
        # (a hi of 16.95 must still include tile 1, where pixel 16 lives).
        pad = 0.5
        lo_x = jnp.minimum(ctx - ext_tx, xy[:, 0] - r2d) - pad
        hi_x = jnp.maximum(ctx + ext_tx, xy[:, 0] + r2d) + pad
        lo_y = jnp.minimum(cty - ext_ty, xy[:, 1] - r2d) - pad
        hi_y = jnp.maximum(cty + ext_ty, xy[:, 1] + r2d) + pad
        # intersect with the 3σ rect: guarantees tiles ⊆ the reference's
        # binning (strictly fewer pairs) and keeps degenerate-lane fallbacks
        # exact. ok_t=False lanes keep the 3σ rect.
        cmin_x = jnp.maximum(rmin_x, jnp.clip(jnp.floor(lo_x / tile),
                                              0, grid_x))
        cmin_y = jnp.maximum(rmin_y, jnp.clip(jnp.floor(lo_y / tile),
                                              0, grid_y))
        cmax_x = jnp.minimum(rmax_x, jnp.clip(jnp.floor(hi_x / tile) + 1,
                                              0, grid_x))
        cmax_y = jnp.minimum(rmax_y, jnp.clip(jnp.floor(hi_y / tile) + 1,
                                              0, grid_y))
        b_rmin_x = jnp.where(ok_t, cmin_x, rmin_x)
        b_rmin_y = jnp.where(ok_t, cmin_y, rmin_y)
        b_rmax_x = jnp.where(ok_t, jnp.maximum(cmax_x, cmin_x), rmax_x)
        b_rmax_y = jnp.where(ok_t, jnp.maximum(cmax_y, cmin_y), rmax_y)
    else:
        b_rmin_x, b_rmin_y = rmin_x, rmin_y
        b_rmax_x, b_rmax_y = rmax_x, rmax_y

    rect_min = jnp.stack([b_rmin_x, b_rmin_y], axis=-1).astype(jnp.int32)
    rect_max = jnp.stack([b_rmax_x, b_rmax_y], axis=-1).astype(jnp.int32)
    tiles = (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1])

    # radius / valid keep the reference's opacity-blind semantics: tiles9 is
    # the 3σ box's tile count, so visibility_filter / radii / densify-stats
    # denominators match the CUDA reference even when the culled rect is
    # empty (such gaussians contribute nothing and carry zero grads there
    # too — they are binned-but-masked in the reference).
    tiles9 = (rmax_x - rmin_x) * (rmax_y - rmin_y)

    valid = in_frustum & d_ok & finite & (tiles9 > 0)
    if alive is not None:
        valid = valid & alive
    tiles_touched = jnp.where(valid, tiles, 0).astype(jnp.int32)
    radius = jnp.where(valid, radius, 0.0)

    cull_lo = cull_hi = None
    if conic_cull and opacity is not None:
        cull_lo, cull_hi, tiles_touched = conic_cull_masks(
            T, xy, opacity, rect_min, rect_max, tiles_touched, tile=tile)

    if color is None:
        from .sh import sh_to_color
        color = sh_to_color(sh_degree, shs.astype(f32), xyz, campos.astype(f32))
    else:
        color = color.astype(f32)

    return PreprocessOut(T=T, normal_view=normal_view, depth=p_view[:, 2],
                         xy=xy, radius=radius, rect_min=rect_min,
                         rect_max=rect_max, tiles_touched=tiles_touched,
                         valid=valid, color=color,
                         cull_lo=cull_lo, cull_hi=cull_hi)


CULL_WINDOW = 64   # row-major tile offsets representable in the cull bitmask
CULL_ROWS = 8      # rect rows solved exactly; later rows keep all their tiles


def _mask_below(k: jnp.ndarray):
    """64-bit mask of bits [0, k) as two uint32 words; k int32 in [0, 64]."""
    ones = jnp.uint32(0xFFFFFFFF)
    kl = jnp.clip(k, 0, 32)
    kh = jnp.clip(k - 32, 0, 32)
    lo = jnp.where(kl == 0, jnp.uint32(0),
                   ones >> jnp.clip(32 - kl, 0, 31).astype(jnp.uint32))
    hi = jnp.where(kh == 0, jnp.uint32(0),
                   ones >> jnp.clip(32 - kh, 0, 31).astype(jnp.uint32))
    return lo, hi


def _mask_range(s: jnp.ndarray, e: jnp.ndarray):
    """64-bit mask of bits [s, e) (clamped to [0, 64]) as two uint32 words."""
    elo, ehi = _mask_below(jnp.maximum(e, 0))
    slo, shi = _mask_below(jnp.maximum(s, 0))
    return elo & ~slo, ehi & ~shi


def conic_cull_masks(T: jnp.ndarray, xy: jnp.ndarray, opacity: jnp.ndarray,
                     rect_min: jnp.ndarray, rect_max: jnp.ndarray,
                     tiles_touched: jnp.ndarray, tile: int = 16):
    """Exact conic-vs-tile pair culling over a 64-offset window.

    A (gaussian, tile) pair contributes iff some pixel of the tile reaches
    alpha >= 1/255, i.e. rho = min(rho3d, rho2d) <= thr = 2·ln(255·o)
    (blend_pallas._splat_terms masks exactly this; forward.cu:386). With the
    affine ray coefficients A = Tv×Tw, B = Tw×Tu, C = Tu×Tv and
    p = x·A + y·B + C, rho3d <= thr ⟺
      Q(x,y) = p0² + p1² − thr·p2² <= 0,
    a conic; when it is an ellipse (qa>0, 4·qa·qb−qc²>0) its x-projection
    over a horizontal pixel strip is a closed-form interval (roots at the
    strip bounds ∪ the ellipse x-extremes when their y lies inside). The
    rho2d region is a disk of radius sqrt(thr/2) around the low-pass center.
    Per rect row we keep only the tile columns hit by either interval; rows
    are solved for the first CULL_ROWS rows / CULL_WINDOW row-major offsets
    and packed into a 64-bit keep-bitmask (everything beyond stays kept, as
    do non-elliptic / non-finite lanes — culling less is always correct).

    Culling a pair is BIT-EXACT: every pixel of a culled tile fails the
    kernels' alpha >= 1/255 mask identically, so output and gradients are
    unchanged (same argument as the opacity-aware rect shrink above, applied
    per tile instead of per box; the CUDA reference bins the full rect and
    relies on the same in-kernel mask). Margins: the strip/interval bounds
    are padded by 1 px and thr is inflated 1e-4 relative so f32 rounding of
    the kernel's per-pixel rho can never disagree with the cull test; the
    interval arithmetic runs in xy-centered local coordinates (magnitudes ~
    splat extent) to keep the quadratic-root cancellation benign.

    Returns (mask_lo, mask_hi, tiles_kept): two [N] uint32 bit words and the
    int32 per-gaussian kept-offset count (popcount + offsets beyond the
    window); index data only (wrapped in stop_gradient).
    """
    f32 = jnp.float32
    pad = 1.0
    tile_f = float(tile)
    T = jax.lax.stop_gradient(T).astype(f32)
    xy = jax.lax.stop_gradient(xy).astype(f32)
    opa = jnp.clip(jnp.reshape(jax.lax.stop_gradient(opacity), (-1,)
                               ).astype(f32), 1e-12, 1.0)
    thr = 2.0 * jnp.log(255.0 * opa)
    thr = thr * (1.0 + 1e-4) + 1e-4          # keep strictly more than the kernel
    Tu, Tv, Tw = T[:, 0, :], T[:, 1, :], T[:, 2, :]
    A = jnp.cross(Tv, Tw)
    B = jnp.cross(Tw, Tu)
    C = jnp.cross(Tu, Tv)
    qa = A[:, 0] ** 2 + A[:, 1] ** 2 - thr * A[:, 2] ** 2
    qb = B[:, 0] ** 2 + B[:, 1] ** 2 - thr * B[:, 2] ** 2
    qc = 2.0 * (A[:, 0] * B[:, 0] + A[:, 1] * B[:, 1] - thr * A[:, 2] * B[:, 2])
    qd = 2.0 * (A[:, 0] * C[:, 0] + A[:, 1] * C[:, 1] - thr * A[:, 2] * C[:, 2])
    qe = 2.0 * (B[:, 0] * C[:, 0] + B[:, 1] * C[:, 1] - thr * B[:, 2] * C[:, 2])
    qf = C[:, 0] ** 2 + C[:, 1] ** 2 - thr * C[:, 2] ** 2
    # recenter on the low-pass center (inside the splat): root magnitudes
    # drop from ~pixel-coordinates to ~splat-extent, taming f32 cancellation
    cx, cy = xy[:, 0], xy[:, 1]
    qd_l = 2.0 * qa * cx + qc * cy + qd
    qe_l = qc * cx + 2.0 * qb * cy + qe
    qf_l = ((qa * cx + qc * cy + qd) * cx + (qb * cy + qe) * cy + qf)
    det4 = 4.0 * qa * qb - qc * qc
    fin = (jnp.isfinite(qa) & jnp.isfinite(qb) & jnp.isfinite(qc)
           & jnp.isfinite(qd_l) & jnp.isfinite(qe_l) & jnp.isfinite(qf_l))
    ok_ell = fin & (qa > 0.0) & (qb > 0.0) & (det4 > 1e-9 * (4.0 * qa * qb))
    qa_s = jnp.where(qa > 0, qa, 1.0)
    qb_s = jnp.where(qb > 0, qb, 1.0)
    inv2a = 0.5 / qa_s

    # global ellipse x-extremes (∂Q/∂y = 0 substituted): aa = det4/(4 qb)
    aa = det4 / (4.0 * qb_s)
    bb_g = qd_l - qc * qe_l / (2.0 * qb_s)
    cc_g = qf_l - qe_l * qe_l / (4.0 * qb_s)
    disc_g = bb_g * bb_g - 4.0 * aa * cc_g
    aa_s = jnp.where(aa > 0, aa, 1.0)
    ok_g = ok_ell & (disc_g >= 0.0) & (aa > 0.0)
    sq_g = jnp.sqrt(jnp.maximum(disc_g, 0.0))
    xg_lo = (-bb_g - sq_g) / (2.0 * aa_s)
    xg_hi = (-bb_g + sq_g) / (2.0 * aa_s)
    yg_lo = -(qc * xg_lo + qe_l) / (2.0 * qb_s)
    yg_hi = -(qc * xg_hi + qe_l) / (2.0 * qb_s)

    r2d2 = jnp.maximum(thr, 0.0) / FILTER_INV_SQUARE  # low-pass disk radius²

    rw = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1).astype(jnp.int32)
    rh = jnp.maximum(rect_max[:, 1] - rect_min[:, 1], 0).astype(jnp.int32)
    BIG = jnp.float32(3e38)

    def roots_at(yv):
        bb = qc * yv + qd_l
        cc = (qb * yv + qe_l) * yv + qf_l
        disc = bb * bb - 4.0 * qa * cc
        ok = ok_ell & (disc >= 0.0)
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        return ok, (-bb - sq) * inv2a, (-bb + sq) * inv2a

    mlo = jnp.zeros_like(rw, dtype=jnp.uint32)
    mhi = jnp.zeros_like(rw, dtype=jnp.uint32)
    for dy in range(CULL_ROWS):
        ty = (rect_min[:, 1] + dy).astype(f32)
        a0 = ty * tile_f - cy                  # local strip [a0, b0] (pixels)
        b0 = a0 + (tile_f - 1.0)
        a, b = a0 - pad, b0 + pad
        okA, loA, hiA = roots_at(a)
        okB, loB, hiB = roots_at(b)
        okGl = ok_g & (yg_lo >= a) & (yg_lo <= b)
        okGh = ok_g & (yg_hi >= a) & (yg_hi <= b)
        xlo_e = jnp.minimum(jnp.minimum(jnp.where(okA, loA, BIG),
                                        jnp.where(okB, loB, BIG)),
                            jnp.where(okGl, xg_lo, BIG))
        xhi_e = jnp.maximum(jnp.maximum(jnp.where(okA, hiA, -BIG),
                                        jnp.where(okB, hiB, -BIG)),
                            jnp.where(okGh, xg_hi, -BIG))
        dyd = jnp.maximum(jnp.maximum(a0, -b0), 0.0)
        disk_ok = r2d2 >= dyd * dyd
        s_d = jnp.sqrt(jnp.maximum(r2d2 - dyd * dyd, 0.0))
        xlo = jnp.minimum(xlo_e, jnp.where(disk_ok, -s_d, BIG)) - pad
        xhi = jnp.maximum(xhi_e, jnp.where(disk_ok, s_d, -BIG)) + pad
        empty = xlo > xhi
        clo = jnp.floor(jnp.clip((xlo + cx) / tile_f, -1e9, 1e9)
                        ).astype(jnp.int32)
        chi = jnp.floor(jnp.clip((xhi + cx) / tile_f, -1e9, 1e9)
                        ).astype(jnp.int32)
        dxlo = jnp.clip(clo - rect_min[:, 0], 0, rw)
        dxhi = jnp.clip(chi + 1 - rect_min[:, 0], 0, rw)
        row_on = (dy < rh) & ~empty & (dxhi > dxlo)
        base = jnp.int32(dy) * rw
        s_bit = jnp.where(row_on, base + dxlo, 0)
        e_bit = jnp.where(row_on, base + dxhi, 0)
        rlo, rhi = _mask_range(jnp.minimum(s_bit, CULL_WINDOW),
                               jnp.minimum(e_bit, CULL_WINDOW))
        mlo = mlo | rlo
        mhi = mhi | rhi

    # rows past CULL_ROWS keep all their in-window offsets
    s_late = jnp.minimum(jnp.minimum(rh, CULL_ROWS) * rw, CULL_WINDOW)
    e_late = jnp.minimum(rh * rw, CULL_WINDOW)
    llo, lhi = _mask_range(s_late, e_late)
    mlo = mlo | llo
    mhi = mhi | lhi

    # non-elliptic / non-finite lanes keep everything
    alo, ahi = _mask_below(jnp.minimum(rh * rw, CULL_WINDOW))
    mlo = jnp.where(ok_ell, mlo, alo)
    mhi = jnp.where(ok_ell, mhi, ahi)

    n_beyond = jnp.maximum(rh * rw - CULL_WINDOW, 0)
    kept = (jax.lax.population_count(mlo).astype(jnp.int32)
            + jax.lax.population_count(mhi).astype(jnp.int32) + n_beyond)
    tiles_kept = jnp.where(tiles_touched > 0, kept, 0).astype(jnp.int32)
    return mlo, mhi, tiles_kept


def mark_visible(xyz: jnp.ndarray, w2v: jnp.ndarray) -> jnp.ndarray:
    """Frustum visibility test (ext.cpp markVisible / rasterize_points.cu:264-283)."""
    p_view = jnp.einsum('nk,jk->nj', xyz, w2v[:3, :3], precision=_HI) + w2v[:3, 3]
    return p_view[:, 2] > 0.2
