"""Pallas TPU kernels for the per-tile alpha-compositing blend (fast path).

The XLA path (ops/blend.py) pays tile_cap padding, per-chunk gathers and scan
overhead; these kernels stream a pre-gathered packed tensor through VMEM with
a (tile, chunk) grid, keep all per-pixel state resident on-chip, and skip
chunks beyond each tile's true count via a scalar-prefetched count (the
clamped index_map also dedupes the DMA of skipped chunks).

TPU shape discipline: every vector intermediate is a 2D [C, P2] array
(C = chunk of gaussians on sublanes, P2 = tile pixels on lanes); 3-vectors are
component-unrolled; cumulative products/sums along the gaussian axis become
lower-triangular matmuls on the MXU (cumprod via exp∘cumsum∘log — safe since
1-α ≥ 0.01 for contributors).

Packed layout (see pack_flat_cols; gaussian axis on DMA lanes/sublanes):
  rows 0:9  affine ray-intersection coefficients A,B,C (p = x·A + y·B + C,
            the per-gaussian cross products of the T rows)
  9:12      Tw (T's third row, for the ray-depth chain)
  12:14     low-pass center xy   14:17 view-space normal   17 opacity
  18:21     color                21:   E extra channels

Forward semantics match ops/blend.py exactly (itself oracle-tested against the
CUDA reference semantics, forward.cu:256-462). The backward kernel re-walks
chunks back-to-front from the saved final transmittance — the recomputation
trick of backward.cu:143-466 — emitting per-(tile, slot) gradients that the
caller segment-sums per gaussian (deterministic, replacing CUDA atomics).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .preprocess import FAR_N, FILTER_INV_SQUARE, NEAR_N

_TW = 9
_XY = 12
_NRM = 14
_OPA = 17
_COL = 18
_EXT = 21
CHUNK = 128  # gaussians per grid step (sublane-friendly, lane-aligned DMA)


def pack_flat_cols(T_used, xy, normal_view, opacities, color, extras=None,
                   rect=None):
    """Per-gaussian packed attribute columns for the Pallas kernels, with a
    trailing sentinel zero row. Returns [N+1, D], D = 21 + E.

    The ray-splat intersection p = (x·Tw−Tu)×(y·Tw−Tv) (forward.cu:360-371)
    is AFFINE in the pixel coords: expanding the cross product,
    p = x·(Tv×Tw) + y·(Tw×Tu) + (Tu×Tv). Packing those three per-gaussian
    cross products instead of the raw T rows moves the k/l/cross evaluation
    (~9 of ~60 VPU ops per slot-pixel) out of every kernel body into one
    [N,3]-sized precompute — and shrinks the backward's p-chain the same way
    (dL/dA = Σ x·dL/dp etc., no per-pixel cross products). The precompute is
    differentiable, so autodiff routes the A/B/C cotangents back into T
    (including the densification t_offset tap). Tw is kept for the ray-depth
    chain (depth = sx·Twx + sy·Twy + Twz)."""
    n = xy.shape[0]
    T = jnp.reshape(T_used, (n, 3, 3))
    Tu, Tv, Tw = T[:, 0], T[:, 1], T[:, 2]
    A = jnp.cross(Tv, Tw)
    B = jnp.cross(Tw, Tu)
    C = jnp.cross(Tu, Tv)
    cols = [A, B, C, Tw, xy, normal_view,
            jnp.reshape(opacities, (n, 1)), color]
    if extras is not None:
        cols.append(extras)
    if rect is not None:
        # clip_rect mode (cached-superset binning): the per-gaussian
        # tile rect as 4 trailing f32 columns (rmin_x, rmax_x, rmin_y,
        # rmax_y — exact ints < 2^24); the kernels gate contributions by
        # tile ∈ rect so a cached SUPERSET pair list reproduces the fresh
        # binning's rect clipping exactly. The sentinel row's zero rect
        # (rmax == 0) gates it everywhere.
        rmin, rmax = rect
        cols.append(jax.lax.stop_gradient(jnp.stack(
            [rmin[:, 0], rmax[:, 0], rmin[:, 1], rmax[:, 1]],
            axis=1).astype(jnp.float32)))
    flat = jnp.concatenate(cols, axis=1)
    return jnp.concatenate([flat, jnp.zeros((1, flat.shape[1]), flat.dtype)],
                           axis=0)


def _cumsum_incl(x):
    """Inclusive prefix sum along axis 0 (sublanes) via log-step Hillis-Steele
    shifted adds. A triangular matmul would cost 2·C²·P2 flops per chunk
    (x6 for full-precision f32 MXU passes) — ~100x this formulation; prefix
    sums are the inner loop of the blend, so this dominates kernel cost."""
    c = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    y = x
    shift = 1
    while shift < c:
        rolled = pltpu.roll(y, shift, axis=0)     # circular shift down
        y = y + jnp.where(row >= shift, rolled, 0.0)
        shift *= 2
    return y


def _cumsum_excl(x):
    """Exclusive prefix sum along axis 0: inclusive shifted down one row."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    incl = _cumsum_incl(x)
    rolled = pltpu.roll(incl, 1, axis=0)
    return jnp.where(row >= 1, rolled, 0.0)


def _cumprod_incl(x):
    """Inclusive prefix product along axis 0 (same log-step roll scheme as
    _cumsum_incl with identity 1). Direct products replace the exp∘cumsum∘log
    formulation — same masked-roll count, zero transcendental passes."""
    c = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    y = x
    shift = 1
    while shift < c:
        rolled = pltpu.roll(y, shift, axis=0)
        y = y * jnp.where(row >= shift, rolled, 1.0)
        shift *= 2
    return y


def _shift_down_one(x, fill=1.0):
    """x shifted down one row (exclusive-scan companion), top row = fill.
    One roll — cheaper than deriving the exclusive product by division."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row >= 1, pltpu.roll(x, 1, axis=0), fill)


def _pix_coords(tile: int, grid_x: int):
    t = pl.program_id(0)
    ty = (t // grid_x).astype(jnp.float32)
    tx = (t % grid_x).astype(jnp.float32)
    # build flat [1, P2] coords directly (Mosaic: no (t,t)→(1,P2) reshape,
    # integer iota only)
    p = jax.lax.broadcasted_iota(jnp.int32, (1, tile * tile), 1)
    pxf = (tx * tile + (p % tile).astype(jnp.float32))
    pyf = (ty * tile + (p // tile).astype(jnp.float32))
    return pxf, pyf


def _splat_terms(bt, pxf, pyf):
    """bt [C, D] packed chunk; pxf/pyf [1, P2]. All outputs [C, P2].

    p = x·A + y·B + C with the per-gaussian affine coefficients precomputed
    by pack_flat_cols (≡ (x·Tw−Tu)×(y·Tw−Tv), forward.cu:360-371)."""
    Ax, Ay, Az = bt[:, 0:1], bt[:, 1:2], bt[:, 2:3]
    Bx, By, Bz = bt[:, 3:4], bt[:, 4:5], bt[:, 5:6]
    Cx, Cy, Cz = bt[:, 6:7], bt[:, 7:8], bt[:, 8:9]
    Twx = bt[:, _TW:_TW + 1]
    Twy = bt[:, _TW + 1:_TW + 2]
    Twz = bt[:, _TW + 2:_TW + 3]
    px_ = pxf * Ax + pyf * Bx + Cx
    py_ = pxf * Ay + pyf * By + Cy
    pz_ = pxf * Az + pyf * Bz + Cz
    pz_ok = pz_ != 0.0
    pz = jnp.where(pz_ok, pz_, 1.0)
    inv_pz = 1.0 / pz                 # one reciprocal, two multiplies
    sx = jnp.clip(px_ * inv_pz, -3e4, 3e4)
    sy = jnp.clip(py_ * inv_pz, -3e4, 3e4)
    rho3d = sx * sx + sy * sy
    dx = bt[:, _XY:_XY + 1] - pxf
    dy = bt[:, _XY + 1:_XY + 2] - pyf
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    use3d = rho3d <= rho2d
    rho = jnp.where(use3d, rho3d, rho2d)
    depth_ray = jnp.where(use3d, sx * Twx + sy * Twy + Twz, Twz)
    power = -0.5 * rho
    G = jnp.exp(power)
    alpha = jnp.minimum(bt[:, _OPA:_OPA + 1] * G, 0.99)
    m = pz_ok & (depth_ray >= NEAR_N) & (power <= 0.0) & (alpha >= 1.0 / 255.0)
    return dict(alpha=alpha, m=m, depth_ray=depth_ray, use3d=use3d,
                sx=sx, sy=sy, pz=pz, inv_pz=inv_pz, G=G, dx=dx, dy=dy,
                Twx=Twx, Twy=Twy, Twz=Twz)


def _fwd_kernel(count_ref, packed_ref, out_ref, iout_ref,
                Tst, m1s, m2s, done_s, *, tile, grid_x, n_extra):
    t = pl.program_id(0)
    c = pl.program_id(1)
    E = n_extra

    @pl.when(c == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)
        # empty tiles run only this init: final_T must read 1 (all
        # transmittance remains), not 0, or they composite as opaque black
        out_ref[0, 9:10] = jnp.ones_like(out_ref[0, 9:10])
        iout_ref[...] = jnp.zeros_like(iout_ref)
        Tst[...] = jnp.ones_like(Tst)
        m1s[...] = jnp.zeros_like(m1s)
        m2s[...] = jnp.zeros_like(m2s)
        done_s[...] = jnp.zeros_like(done_s)

    count = count_ref[t]

    @pl.when(c * CHUNK < count)
    def _work():
        pxf, pyf = _pix_coords(tile, grid_x)
        bt = packed_ref[0].T                     # [C, D]
        C = bt.shape[0]
        g = _splat_terms(bt, pxf, pyf)
        slot = (c * CHUNK
                + jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0))  # [C,1]
        m = g["m"] & (slot < count)
        alpha = g["alpha"]
        depth_ray = g["depth_ray"]

        T_in = Tst[0:1]                          # [1, P2]
        done_in = done_s[0:1] > 0

        am = jnp.where(m, alpha, 0.0)
        log1m = jnp.log(1.0 - am)
        T_i = T_in * jnp.exp(_cumsum_excl(log1m))
        done_i = m & (T_i * (1.0 - alpha) < 1e-4)
        done_cum = (_cumsum_incl(done_i.astype(jnp.float32)) > 0.5) | done_in
        cmask = m & ~done_cum
        ac = jnp.where(cmask, alpha, 0.0)
        log1c = jnp.log(1.0 - ac)
        cum_c = _cumsum_incl(log1c)
        T_c = T_in * jnp.exp(cum_c - log1c)      # exclusive
        w = ac * T_c

        out = out_ref[0]                         # [OC, P2]
        acc_col = jnp.dot(bt[:, _COL:_COL + 3].T, w,
                          preferred_element_type=jnp.float32)
        acc_nrm = jnp.dot(bt[:, _NRM:_NRM + 3].T, w,
                          preferred_element_type=jnp.float32)
        acc_dep = jnp.sum(w * depth_ray, axis=0, keepdims=True)

        d_safe = jnp.where(m, depth_ray, 1.0)
        md = FAR_N / (FAR_N - NEAR_N) * (1.0 - NEAR_N / d_safe)
        mw = md * w
        m2w = md * md * w
        m1_excl = m1s[0:1] + _cumsum_excl(mw)
        m2_excl = m2s[0:1] + _cumsum_excl(m2w)
        acc_dist = jnp.sum((md * md * (1.0 - T_c) + m2_excl
                            - 2.0 * md * m1_excl) * w, axis=0, keepdims=True)

        iota_c = jax.lax.broadcasted_iota(jnp.int32, cmask.shape, 0)
        cand = cmask & (T_c > 0.5)
        crank = jnp.max(jnp.where(cand, iota_c + 1, 0), axis=0, keepdims=True)
        has_cand = crank > 0
        med_onehot = (iota_c + 1 == crank) & cand
        med_val = jnp.sum(jnp.where(med_onehot, depth_ray, 0.0), axis=0,
                          keepdims=True)

        gslot = slot + 1                          # [C,1] global 1-based
        lastc = jnp.max(jnp.where(cmask, gslot, 0), axis=0, keepdims=True)
        med_slot = jnp.max(jnp.where(med_onehot, gslot, 0), axis=0,
                           keepdims=True)

        T_out = T_in * jnp.exp(cum_c[-1:, :])

        out_ref[0, 0:3] = out[0:3] + acc_col
        out_ref[0, 3:4] = out[3:4] + acc_dep
        out_ref[0, 4:7] = out[4:7] + acc_nrm
        out_ref[0, 7:8] = jnp.where(has_cand, med_val, out[7:8])
        out_ref[0, 8:9] = out[8:9] + acc_dist
        out_ref[0, 9:10] = T_out
        if E:
            acc_ext = jnp.dot(bt[:, _EXT:_EXT + E].T, w,
                              preferred_element_type=jnp.float32)
            out_ref[0, 10:10 + E] = out[10:10 + E] + acc_ext
        # distortion moment totals (residuals for the backward kernel)
        out_ref[0, 10 + E:11 + E] = m1s[0:1] + jnp.sum(mw, axis=0,
                                                       keepdims=True)
        out_ref[0, 11 + E:12 + E] = m2s[0:1] + jnp.sum(m2w, axis=0,
                                                       keepdims=True)

        iout = iout_ref[0]
        iout_ref[0, 0:1] = jnp.maximum(iout[0:1], lastc)
        iout_ref[0, 1:2] = jnp.where(has_cand, med_slot, iout[1:2])

        Tst[0:1] = T_out
        m1s[0:1] = m1s[0:1] + jnp.sum(mw, axis=0, keepdims=True)
        m2s[0:1] = m2s[0:1] + jnp.sum(m2w, axis=0, keepdims=True)
        done_s[0:1] = done_cum[-1:, :].astype(jnp.int32)


class PallasBlendFwdOut(NamedTuple):
    # out rows: color3, depth, normal3, med, dist, finalT, E extras,
    #           m1tot, m2tot (distortion-moment residuals for the backward)
    out: jnp.ndarray    # [T, 12+E, P2]
    iout: jnp.ndarray   # [T, 2, P2] int32: n_contrib, med_slot (1-based)


def blend_fwd_pallas(packed: jnp.ndarray, tile_count: jnp.ndarray,
                     tile: int, grid_x: int, n_extra: int,
                     interpret: bool = False) -> PallasBlendFwdOut:
    """packed [T, D, K] (K % 128 == 0); tile_count [T] int32."""
    n_tiles, D, K = packed.shape
    assert K % CHUNK == 0, K
    n_chunks = K // CHUNK
    P2 = tile * tile
    OC = 12 + n_extra

    def in_index(t, c, count_ref):
        last = jnp.maximum(pl.cdiv(count_ref[t], CHUNK) - 1, 0)
        return (t, 0, jnp.minimum(c, last))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, n_chunks),
        in_specs=[pl.BlockSpec((1, D, CHUNK), in_index)],
        out_specs=[pl.BlockSpec((1, OC, P2), lambda t, c, cr: (t, 0, 0)),
                   pl.BlockSpec((1, 2, P2), lambda t, c, cr: (t, 0, 0))],
        scratch_shapes=[pltpu.VMEM((1, P2), jnp.float32),
                        pltpu.VMEM((1, P2), jnp.float32),
                        pltpu.VMEM((1, P2), jnp.float32),
                        pltpu.VMEM((1, P2), jnp.int32)],
    )
    kernel = functools.partial(_fwd_kernel, tile=tile, grid_x=grid_x,
                               n_extra=n_extra)
    out, iout = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_tiles, OC, P2), jnp.float32),
                   jax.ShapeDtypeStruct((n_tiles, 2, P2), jnp.int32)],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(tile_count, packed)
    return PallasBlendFwdOut(out=out, iout=iout)


def _bwd_kernel(count_ref, packed_ref, gout_ref, sv_ref, iout_ref, dout_ref,
                Tst, Ss, *, tile, grid_x, n_extra, n_chunks):
    """Back-to-front gradient kernel. Grid step c processes forward-chunk
    cc = n_chunks-1-c; carries: T_exit (transmittance after the remaining
    suffix) and S = Σ_{later gaussians} dL/dw_k · w_k."""
    t = pl.program_id(0)
    c = pl.program_id(1)
    cc = n_chunks - 1 - c
    E = n_extra
    count = count_ref[t]

    @pl.when(c == 0)
    def _init():
        Tst[0:1] = sv_ref[0, 0:1]   # T_fin
        Ss[...] = jnp.zeros_like(Ss)

    @pl.when(cc * CHUNK >= count)
    def _skip():
        dout_ref[...] = jnp.zeros_like(dout_ref)

    @pl.when(cc * CHUNK < count)
    def _work():
        pxf, pyf = _pix_coords(tile, grid_x)
        bt = packed_ref[0].T                       # [C, D]
        C = bt.shape[0]
        g = _splat_terms(bt, pxf, pyf)
        slot = (cc * CHUNK
                + jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0))
        gslot = slot + 1
        alpha = g["alpha"]
        depth_ray = g["depth_ray"]

        n_contrib = iout_ref[0, 0:1]               # [1, P2] int32
        med_slot = iout_ref[0, 1:2]
        T_fin = sv_ref[0, 0:1]
        m1tot = sv_ref[0, 1:2]
        m2tot = sv_ref[0, 2:3]
        a_fin = 1.0 - T_fin

        cmask = g["m"] & (gslot <= n_contrib)
        ac = jnp.where(cmask, alpha, 0.0)
        log1c = jnp.log(1.0 - ac)
        cum_in = _cumsum_incl(log1c)
        T_exit = Tst[0:1]
        T_entry = T_exit * jnp.exp(-cum_in[-1:, :])
        T_i = T_entry * jnp.exp(cum_in - log1c)    # exclusive prefix
        w = ac * T_i

        gcol = gout_ref[0, 0:3]                    # [3, P2]
        gD = gout_ref[0, 3:4]
        gnrm = gout_ref[0, 4:7]
        gmed = gout_ref[0, 7:8]
        gdist = gout_ref[0, 8:9]
        gTfin = gout_ref[0, 9:10]

        colors = bt[:, _COL:_COL + 3]              # [C,3]
        normals = bt[:, _NRM:_NRM + 3]
        d_safe = jnp.where(cmask, depth_ray, 1.0)
        inv_d = 1.0 / d_safe          # one reciprocal, reused below
        md = FAR_N / (FAR_N - NEAR_N) * (1.0 - NEAR_N * inv_d)

        dLdw = (jnp.dot(colors, gcol, preferred_element_type=jnp.float32)
                + jnp.dot(normals, gnrm, preferred_element_type=jnp.float32)
                + depth_ray * gD
                + gdist * (md * md * a_fin + m2tot - 2.0 * md * m1tot))
        if E:
            extras = bt[:, _EXT:_EXT + E]
            gext = gout_ref[0, 10:10 + E]
            dLdw = dLdw + jnp.dot(extras, gext,
                                  preferred_element_type=jnp.float32)

        dw_w = jnp.where(cmask, dLdw * w, 0.0)
        tot = jnp.sum(dw_w, axis=0, keepdims=True)
        S_after = Ss[0:1] + (tot - _cumsum_incl(dw_w))
        one_minus = 1.0 - ac
        dLda = dLdw * T_i - (S_after + gTfin * T_fin) / one_minus
        dLda = jnp.where(cmask, dLda, 0.0)

        G = g["G"]
        dLdG = bt[:, _OPA:_OPA + 1] * dLda
        dopa = jnp.where(cmask, G * dLda, 0.0)
        dLdrho = -0.5 * G * dLdG

        is_med = cmask & (gslot == med_slot)
        dmd_dd = (FAR_N * NEAR_N) / (FAR_N - NEAR_N) * inv_d * inv_d
        dLdd = (w * gD + jnp.where(is_med, gmed, 0.0)
                + gdist * 2.0 * w * (md * a_fin - m1tot) * dmd_dd)
        dLdd = jnp.where(cmask, dLdd, 0.0)

        use3d = g["use3d"] & cmask
        sx, sy = g["sx"], g["sy"]
        Twx, Twy, Twz = g["Twx"], g["Twy"], g["Twz"]
        # --- 3d branch: grads through s and the ray-splat depth
        dLdsx = jnp.where(use3d, dLdrho * 2.0 * sx + dLdd * Twx, 0.0)
        dLdsy = jnp.where(use3d, dLdrho * 2.0 * sy + dLdd * Twy, 0.0)
        inv_pz = g["inv_pz"]
        dLdpx = dLdsx * inv_pz
        dLdpy = dLdsy * inv_pz
        dLdpz = -(dLdsx * sx + dLdsy * sy) * inv_pz
        # p = x·A + y·B + C, so the p-chain grads are plain pixel-weighted
        # sums of dL/dp (autodiff routes dA/dB/dC back into T outside the
        # kernel via the cross-product VJPs) — no per-pixel cross products
        dA = (pxf * dLdpx, pxf * dLdpy, pxf * dLdpz)
        dB = (pyf * dLdpx, pyf * dLdpy, pyf * dLdpz)
        dC = (dLdpx, dLdpy, dLdpz)
        dd3 = jnp.where(use3d, dLdd, 0.0)
        dd2 = jnp.where(use3d, 0.0, dLdd)
        dTw = (dd3 * sx, dd3 * sy, dd3 + dd2)   # ray-depth chain only
        # --- 2d branch: grads to the low-pass center
        in2d = cmask & ~g["use3d"]
        dxq, dyq = g["dx"], g["dy"]
        dxy_x = jnp.where(in2d, dLdrho * FILTER_INV_SQUARE * 2.0 * dxq, 0.0)
        dxy_y = jnp.where(in2d, dLdrho * FILTER_INV_SQUARE * 2.0 * dyq, 0.0)

        # --- per-gaussian reductions (over the pixel lane axis)
        def rsum(x):
            return jnp.sum(x, axis=1, keepdims=True)     # [C,1]

        dT_rows = [rsum(v) for v in (dA + dB + dC + dTw)]  # 12 × [C,1]
        dxy_rows = [rsum(dxy_x), rsum(dxy_y)]
        dnrm = jnp.dot(w, gnrm.T, preferred_element_type=jnp.float32)  # [C,3]
        dcol = jnp.dot(w, gcol.T, preferred_element_type=jnp.float32)
        rows = jnp.concatenate(
            dT_rows + dxy_rows
            + [dnrm[:, 0:1], dnrm[:, 1:2], dnrm[:, 2:3], rsum(dopa),
               dcol[:, 0:1], dcol[:, 1:2], dcol[:, 2:3]], axis=1)  # [C, 21]
        if E:
            gext = gout_ref[0, 10:10 + E]
            dext = jnp.dot(w, gext.T, preferred_element_type=jnp.float32)
            rows = jnp.concatenate([rows, dext], axis=1)  # [C, 21+E]
        dout_ref[0] = rows.T                               # [D, C]

        Tst[0:1] = T_entry
        Ss[0:1] = Ss[0:1] + tot


def blend_bwd_pallas(packed: jnp.ndarray, gout: jnp.ndarray,
                     saved: jnp.ndarray, iout: jnp.ndarray,
                     tile_count: jnp.ndarray, tile: int, grid_x: int,
                     n_extra: int, interpret: bool = False) -> jnp.ndarray:
    """Returns d(packed) [T, D, K]. saved: [T, 3, P2] (T_fin, M1tot, M2tot)."""
    n_tiles, D, K = packed.shape
    n_chunks = K // CHUNK
    P2 = tile * tile
    OC = 12 + n_extra

    def in_index(t, c, count_ref):
        cc = n_chunks - 1 - c
        last = jnp.maximum(pl.cdiv(count_ref[t], CHUNK) - 1, 0)
        return (t, 0, jnp.minimum(cc, last))

    def out_index(t, c, count_ref):
        return (t, 0, n_chunks - 1 - c)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, n_chunks),
        in_specs=[pl.BlockSpec((1, D, CHUNK), in_index),
                  pl.BlockSpec((1, OC, P2), lambda t, c, cr: (t, 0, 0)),
                  pl.BlockSpec((1, 3, P2), lambda t, c, cr: (t, 0, 0)),
                  pl.BlockSpec((1, 2, P2), lambda t, c, cr: (t, 0, 0))],
        out_specs=[pl.BlockSpec((1, D, CHUNK), out_index)],
        scratch_shapes=[pltpu.VMEM((1, P2), jnp.float32),
                        pltpu.VMEM((1, P2), jnp.float32)],
    )
    kernel = functools.partial(_bwd_kernel, tile=tile, grid_x=grid_x,
                               n_extra=n_extra, n_chunks=n_chunks)
    dpacked = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_tiles, D, K), jnp.float32)],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(tile_count, packed, gout, saved, iout)[0]
    return dpacked


# ---------------------------------------------------------------- custom VJP

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def blend_pallas_diff(packed, tile_count, tile, grid_x, n_extra, interpret):
    """Differentiable Pallas blend: packed [T,D,K] → (out [T,OC,P2],
    iout [T,2,P2]). VJP runs the back-to-front kernel; iout grads ignored."""
    f = blend_fwd_pallas(packed, tile_count, tile, grid_x, n_extra, interpret)
    return f.out, f.iout


def _blend_diff_fwd(packed, tile_count, tile, grid_x, n_extra, interpret):
    f = blend_fwd_pallas(packed, tile_count, tile, grid_x, n_extra, interpret)
    E = n_extra
    saved = jnp.concatenate([f.out[:, 9:10],            # T_fin
                             f.out[:, 10 + E:12 + E]],  # M1tot, M2tot
                            axis=1)
    return (f.out, f.iout), (packed, tile_count, saved, f.iout)


def _blend_diff_bwd(tile, grid_x, n_extra, interpret, res, cts):
    packed, tile_count, saved, iout = res
    gout, _ = cts
    dpacked = blend_bwd_pallas(packed, gout, saved, iout, tile_count, tile,
                               grid_x, n_extra, interpret)
    return dpacked, None


blend_pallas_diff.defvjp(_blend_diff_fwd, _blend_diff_bwd)


# ------------------------------------------------------------------
# Aligned-flat layout kernels: pairs packed contiguously per tile (segments
# CHUNK-aligned), 1D grid over real chunks only — no max-per-tile padding.
# The owning tile per chunk is scalar-prefetched; accumulator blocks revisit
# the same tile row across its consecutive chunks.
# ------------------------------------------------------------------

def _fwd_kernel_aligned(ct_ref, cr_ref, packed_ref, out_ref, iout_ref,
                        Tst, m1s, m2s, done_s, *, tile, grid_x, num_tiles,
                        n_extra, chunk=CHUNK, extras_only=False,
                        viewer=False):
    i = pl.program_id(0)
    E = n_extra
    tt = ct_ref[i]
    prev_tt = ct_ref[jnp.maximum(i - 1, 0)]
    first = (i == 0) | (tt != prev_tt)
    # tail-chunk rank sentinels (see binning.py): rank == n_chunks marks a
    # LEFTOVER chunk — assigned the last visited tile (so output-block visits
    # stay consecutive; Pallas flushes the VMEM buffer on every index change)
    # and fully skipped: the resident buffer already holds that tile's final
    # data and the extra flush rewrites it unchanged. rank == n_chunks+1
    # marks an EMPTY TILE's only chunk: init-only (zeros + final_T = 1), the
    # splat body never touches its all-sentinel slots.
    nprog = pl.num_programs(0)
    real = cr_ref[i] < nprog
    is_empty = cr_ref[i] == nprog + 1

    # is_empty chunks init UNCONDITIONALLY: in the tile-subset mini bundles
    # the leftover run may visit the same tile right before its init-only
    # chunk, making `first` false — without the init, the flush would write
    # stale VMEM (the previous tile's data) over this tile's output row
    @pl.when((first & real | is_empty) & (tt < num_tiles))
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)
        # final_T row starts at 1 (all transmittance remains): for empty
        # tiles this IS the output; real tiles overwrite it per work chunk
        out_ref[0, 9:10] = jnp.ones_like(out_ref[0, 9:10])
        iout_ref[...] = jnp.zeros_like(iout_ref)
        Tst[...] = jnp.ones_like(Tst)
        m1s[...] = jnp.zeros_like(m1s)
        m2s[...] = jnp.zeros_like(m2s)
        done_s[...] = jnp.zeros_like(done_s)

    # whole-chunk early termination (forward.cu:388-393 block-level break):
    # once every pixel of the tile has latched done, the remaining chunks
    # cannot change any output — all carries and out rows already hold their
    # final values, so skipping the body is exact, not approximate. done_s
    # holds the PREVIOUS tile's latches when `first` (init runs inside the
    # same grid step), so first chunks never skip.
    saturated = (~first) & (jnp.min(done_s[0:1]) > 0)

    @pl.when(real & (tt < num_tiles) & ~saturated)
    def _work():
        ty = (tt // grid_x).astype(jnp.float32)
        tx = (tt % grid_x).astype(jnp.float32)
        p = jax.lax.broadcasted_iota(jnp.int32, (1, tile * tile), 1)
        pxf = tx * tile + (p % tile).astype(jnp.float32)
        pyf = ty * tile + (p // tile).astype(jnp.float32)

        bt = packed_ref[...]                     # [C, D] (slot-major block)
        C = bt.shape[0]
        g = _splat_terms(bt, pxf, pyf)
        slot = (cr_ref[i] * chunk
                + jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0))
        m = g["m"]
        alpha = g["alpha"]
        depth_ray = g["depth_ray"]

        T_in = Tst[0:1]

        # ONE prefix scan per chunk: transmittance is monotone nonincreasing
        # WITHIN a chunk, so the early-termination cut (reference: test_T <
        # 1e-4 skips the slot and everything after) is an elementwise test on
        # the inclusive scan, and the contribution-clipped cumulative
        # transmittance factor is max(P_incl, P_excl at the first cut) — a
        # max-reduce, not a second scan. The cut must LATCH across chunks via
        # done_s: the carried T excludes the cut slot's alpha and therefore
        # stays >= 1e-4, so the T test alone would resume blending in the
        # next chunk. Direct multiplicative scan (no log/exp): contributor
        # 1-alpha >= 0.01, so the divisions below are well-conditioned.
        done_in = done_s[0:1] > 0
        am = jnp.where(m, alpha, 0.0)
        om = 1.0 - am
        P_incl = _cumprod_incl(om)
        P_excl = _shift_down_one(P_incl)             # one roll, no division
        done_cum = done_in | (T_in * P_incl < 1e-4)  # T after slot i
        cmask = m & ~done_cum
        cut_val = jnp.max(jnp.where(done_cum, P_excl, 0.0), axis=0,
                          keepdims=True)             # P_excl at first cut
        P_c = jnp.maximum(P_incl, cut_val)
        ac = jnp.where(cmask, alpha, 0.0)
        # T_c is only consumed through w = ac·T_c (ac = 0 off-cmask), and on
        # cmask lanes — necessarily before the cut — the clamped exclusive
        # product equals P_excl, so no per-lane division is needed
        T_c = T_in * P_excl
        w = ac * T_c

        gslot = slot + 1
        lastc = jnp.max(jnp.where(cmask, gslot, 0), axis=0, keepdims=True)
        T_out = T_in * P_c[-1:, :]
        out = out_ref[0]
        iout = iout_ref[0]

        if extras_only:
            # feature-lifting fast path: only the feature sums, the final
            # transmittance and the contributor count are produced (exactly
            # what the extras-only backward consumes); color/depth/normal/
            # median/distortion rows stay zero.
            acc_ext = jnp.dot(bt[:, _EXT:_EXT + E].T, w,
                              preferred_element_type=jnp.float32)
            out_ref[0, 9:10] = T_out
            out_ref[0, 10:10 + E] = out[10:10 + E] + acc_ext
            iout_ref[0, 0:1] = jnp.maximum(iout[0:1], lastc)
            Tst[0:1] = T_out
            done_s[0:1] = done_cum[-1:, :].astype(jnp.int32)
            return

        if viewer:
            # interactive-viewer fast path: color + alpha [+ features] only —
            # the depth/normal/median/distortion machinery (one packed moment
            # scan + median tracking, ~40% of the full body) is skipped; the
            # GUI displays rgb and the feature PCA map and needs nothing else.
            acc_cx = jnp.dot(bt[:, _COL:_COL + 3 + E].T, w,
                             preferred_element_type=jnp.float32)
            out_ref[0, 0:3] = out[0:3] + acc_cx[0:3]
            out_ref[0, 9:10] = T_out
            if E:
                out_ref[0, 10:10 + E] = out[10:10 + E] + acc_cx[3:3 + E]
            iout_ref[0, 0:1] = jnp.maximum(iout[0:1], lastc)
            Tst[0:1] = T_out
            done_s[0:1] = done_cum[-1:, :].astype(jnp.int32)
            return

        # one MXU pass accumulates normal(3) + opacity placeholder + color(3)
        # [+ extras]: packed rows 14:21+E are contiguous
        acc_sel = jnp.dot(bt[:, _NRM:_NRM + 7 + E].T, w,
                          preferred_element_type=jnp.float32)  # [7+E, P2]
        acc_nrm = acc_sel[0:3]
        acc_col = acc_sel[4:7]
        acc_dep = jnp.sum(w * depth_ray, axis=0, keepdims=True)

        d_safe = jnp.where(m, depth_ray, 1.0)
        md = FAR_N / (FAR_N - NEAR_N) * (1.0 - NEAR_N / d_safe)
        mw = md * w
        m2w = md * md * w
        # the two moment scans share one packed scan (independent per lane)
        mm_excl = _cumsum_excl(jnp.concatenate([mw, m2w], axis=1))
        P2 = tile * tile
        m1_excl = m1s[0:1] + mm_excl[:, :P2]
        m2_excl = m2s[0:1] + mm_excl[:, P2:]
        acc_dist = jnp.sum((md * md * (1.0 - T_c) + m2_excl
                            - 2.0 * md * m1_excl) * w, axis=0, keepdims=True)

        iota_c = jax.lax.broadcasted_iota(jnp.int32, cmask.shape, 0)
        cand = cmask & (T_c > 0.5)
        crank = jnp.max(jnp.where(cand, iota_c + 1, 0), axis=0, keepdims=True)
        has_cand = crank > 0
        med_onehot = (iota_c + 1 == crank) & cand
        med_val = jnp.sum(jnp.where(med_onehot, depth_ray, 0.0), axis=0,
                          keepdims=True)
        med_slot = jnp.max(jnp.where(med_onehot, gslot, 0), axis=0,
                           keepdims=True)

        out_ref[0, 0:3] = out[0:3] + acc_col
        out_ref[0, 3:4] = out[3:4] + acc_dep
        out_ref[0, 4:7] = out[4:7] + acc_nrm
        out_ref[0, 7:8] = jnp.where(has_cand, med_val, out[7:8])
        out_ref[0, 8:9] = out[8:9] + acc_dist
        out_ref[0, 9:10] = T_out
        if E:
            out_ref[0, 10:10 + E] = out[10:10 + E] + acc_sel[7:7 + E]
        out_ref[0, 10 + E:11 + E] = m1s[0:1] + jnp.sum(mw, axis=0,
                                                       keepdims=True)
        out_ref[0, 11 + E:12 + E] = m2s[0:1] + jnp.sum(m2w, axis=0,
                                                       keepdims=True)

        iout_ref[0, 0:1] = jnp.maximum(iout[0:1], lastc)
        iout_ref[0, 1:2] = jnp.where(has_cand, med_slot, iout[1:2])

        Tst[0:1] = T_out
        m1s[0:1] = m1s[0:1] + jnp.sum(mw, axis=0, keepdims=True)
        m2s[0:1] = m2s[0:1] + jnp.sum(m2w, axis=0, keepdims=True)
        done_s[0:1] = done_cum[-1:, :].astype(jnp.int32)


def blend_fwd_pallas_aligned(packed: jnp.ndarray, chunk_tile: jnp.ndarray,
                             chunk_rank: jnp.ndarray, num_tiles: int,
                             tile: int, grid_x: int, n_extra: int,
                             interpret: bool = False,
                             chunk: int = CHUNK,
                             extras_only: bool = False,
                             viewer: bool = False) -> PallasBlendFwdOut:
    """packed [ACAP, D] (aligned layout, slot-major); chunk_tile/chunk_rank
    [ACAP//chunk]."""
    acap, D = packed.shape
    n_chunks = acap // chunk
    P2 = tile * tile
    OC = 12 + n_extra

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        # tail chunks (rank >= n_chunks: leftover + empty-tile) never read
        # their slots — map them all to block 0 so consecutive identical
        # indices dedupe the DMA instead of streaming dead sentinel data
        in_specs=[pl.BlockSpec(
            (chunk, D),
            lambda i, ct, cr: (jnp.where(cr[i] >= n_chunks, 0, i), 0))],
        out_specs=[
            pl.BlockSpec((1, OC, P2),
                         lambda i, ct, cr: (jnp.minimum(ct[i], num_tiles - 1),
                                            0, 0)),
            pl.BlockSpec((1, 2, P2),
                         lambda i, ct, cr: (jnp.minimum(ct[i], num_tiles - 1),
                                            0, 0))],
        scratch_shapes=[pltpu.VMEM((1, P2), jnp.float32),
                        pltpu.VMEM((1, P2), jnp.float32),
                        pltpu.VMEM((1, P2), jnp.float32),
                        pltpu.VMEM((1, P2), jnp.int32)],
    )
    kernel = functools.partial(_fwd_kernel_aligned, tile=tile, grid_x=grid_x,
                               num_tiles=num_tiles, n_extra=n_extra,
                               chunk=chunk, extras_only=extras_only,
                               viewer=viewer)
    out, iout = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((num_tiles, OC, P2), jnp.float32),
                   jax.ShapeDtypeStruct((num_tiles, 2, P2), jnp.int32)],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(chunk_tile, chunk_rank, packed)
    # rows of tiles NO grid step visited (possible when the aligned slack
    # overflows: empty tiles beyond the reserved chunks get no init-only
    # chunk, and tile-subset mini bundles only visit their selection) hold
    # whatever was in the output buffer — replace them with the empty-tile
    # result (zeros, final_T = 1) so overflow degrades to dropped pairs
    # (counted in n_dropped) instead of garbage pixels
    visited = jnp.zeros((num_tiles,), jnp.bool_).at[
        jnp.clip(chunk_tile, 0, num_tiles - 1)].set(True)
    row_t = jax.lax.broadcasted_iota(jnp.int32, (1, OC, 1), 1) == 9
    out = jnp.where(visited[:, None, None], out,
                    jnp.where(row_t, 1.0, 0.0))
    iout = jnp.where(visited[:, None, None], iout, 0)
    return PallasBlendFwdOut(out=out, iout=iout)


def _bwd_kernel_aligned(ct_ref, cr_ref, packed_ref, gout_ref, sv_ref,
                        iout_ref, dout_ref, Tst, Ss, *, tile, grid_x,
                        num_tiles, n_extra, n_chunks, extras_only=False,
                        chunk=CHUNK):
    i = pl.program_id(0)
    j = n_chunks - 1 - i
    E = n_extra
    tt = ct_ref[j]
    next_tt = ct_ref[jnp.minimum(j + 1, n_chunks - 1)]
    first = (i == 0) | (tt != next_tt)
    # leftover sentinel chunks (chunk_rank == n_chunks): zero grads, no work.
    # The Tst/Ss init must still run (they may be the reverse walk's first
    # visit of their tile); leftovers carry no alpha so the carries hold.
    real = cr_ref[j] < n_chunks
    # whole-chunk skip mirroring the forward's early termination: chunks whose
    # every slot lies beyond the tile's deepest contributor (gslot > max
    # n_contrib) have cmask ≡ false — zero grads and unchanged carries — so
    # skipping them is exact. This is where the back-to-front walk spends
    # most of its steps on saturated tiles.
    max_nc = jnp.max(iout_ref[0, 0:1])
    beyond = cr_ref[j] * chunk >= max_nc

    @pl.when((tt >= num_tiles) | ~real | beyond)
    def _skip():
        dout_ref[...] = jnp.zeros_like(dout_ref)

    @pl.when(first & (tt < num_tiles))
    def _init():
        Tst[0:1] = sv_ref[0, 0:1]
        Ss[...] = jnp.zeros_like(Ss)

    @pl.when(real & (tt < num_tiles) & ~beyond)
    def _work():
        ty = (tt // grid_x).astype(jnp.float32)
        tx = (tt % grid_x).astype(jnp.float32)
        p = jax.lax.broadcasted_iota(jnp.int32, (1, tile * tile), 1)
        pxf = tx * tile + (p % tile).astype(jnp.float32)
        pyf = ty * tile + (p // tile).astype(jnp.float32)

        bt = packed_ref[...]                     # [C, D] (slot-major block)
        C = bt.shape[0]
        g = _splat_terms(bt, pxf, pyf)
        slot = (cr_ref[j] * chunk
                + jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0))
        gslot = slot + 1
        alpha = g["alpha"]
        depth_ray = g["depth_ray"]

        n_contrib = iout_ref[0, 0:1]
        med_slot = iout_ref[0, 1:2]
        T_fin = sv_ref[0, 0:1]
        m1tot = sv_ref[0, 1:2]
        m2tot = sv_ref[0, 2:3]
        a_fin = 1.0 - T_fin

        cmask = g["m"] & (gslot <= n_contrib)
        ac = jnp.where(cmask, alpha, 0.0)
        oc = 1.0 - ac
        # direct multiplicative scan (see _fwd_kernel_aligned): P_in[-1] is
        # the chunk's transmittance factor, bounded below by the forward's
        # 1e-4 cut, so the single-row division cannot blow up
        P_in = _cumprod_incl(oc)
        T_exit = Tst[0:1]
        T_entry = T_exit / P_in[-1:, :]
        T_i = T_entry * _shift_down_one(P_in)
        w = ac * T_i

        if extras_only:
            # feature-lifting fast path: only d(extras) = w·ĝ_ext is needed;
            # the whole alpha/depth/geometry chain is skipped and the output
            # carries ONLY the E feature rows ([E, acap] instead of [D, acap])
            gext = gout_ref[0, 10:10 + E]
            dext = jnp.dot(w, gext.T, preferred_element_type=jnp.float32)
            dout_ref[...] = dext                 # [C, E] slot-major
            Tst[0:1] = T_entry
            return

        gcol = gout_ref[0, 0:3]
        gD = gout_ref[0, 3:4]
        gnrm = gout_ref[0, 4:7]
        gmed = gout_ref[0, 7:8]
        gdist = gout_ref[0, 8:9]
        gTfin = gout_ref[0, 9:10]

        d_safe = jnp.where(cmask, depth_ray, 1.0)
        inv_d = 1.0 / d_safe          # one reciprocal, reused below
        md = FAR_N / (FAR_N - NEAR_N) * (1.0 - NEAR_N * inv_d)

        # one MXU pass for color+normal(+extras)·cotangent: packed rows
        # 11:14 (normal), 14 (opacity — multiplied by a zero gout row),
        # 15:18 (color), 18: (extras) are contiguous, and the matching gout
        # rows can be assembled with one concat
        gsel = jnp.concatenate(
            [gnrm, jnp.zeros_like(gD), gcol]
            + ([gout_ref[0, 10:10 + E]] if E else []), axis=0)  # [7+E, P2]
        dLdw = (jnp.dot(bt[:, _NRM:_NRM + 7 + E], gsel,
                        preferred_element_type=jnp.float32)
                + depth_ray * gD
                + gdist * (md * md * a_fin + m2tot - 2.0 * md * m1tot))

        dw_w = jnp.where(cmask, dLdw * w, 0.0)
        tot = jnp.sum(dw_w, axis=0, keepdims=True)
        S_after = Ss[0:1] + (tot - _cumsum_incl(dw_w))
        one_minus = 1.0 - ac
        dLda = dLdw * T_i - (S_after + gTfin * T_fin) / one_minus
        dLda = jnp.where(cmask, dLda, 0.0)

        G = g["G"]
        dLdG = bt[:, _OPA:_OPA + 1] * dLda
        dopa = jnp.where(cmask, G * dLda, 0.0)
        dLdrho = -0.5 * G * dLdG

        is_med = cmask & (gslot == med_slot)
        dmd_dd = (FAR_N * NEAR_N) / (FAR_N - NEAR_N) * inv_d * inv_d
        dLdd = (w * gD + jnp.where(is_med, gmed, 0.0)
                + gdist * 2.0 * w * (md * a_fin - m1tot) * dmd_dd)
        dLdd = jnp.where(cmask, dLdd, 0.0)

        use3d = g["use3d"] & cmask
        sx, sy = g["sx"], g["sy"]
        Twx, Twy, Twz = g["Twx"], g["Twy"], g["Twz"]
        dLdsx = jnp.where(use3d, dLdrho * 2.0 * sx + dLdd * Twx, 0.0)
        dLdsy = jnp.where(use3d, dLdrho * 2.0 * sy + dLdd * Twy, 0.0)
        inv_pz = g["inv_pz"]
        dLdpx = dLdsx * inv_pz
        dLdpy = dLdsy * inv_pz
        dLdpz = -(dLdsx * sx + dLdsy * sy) * inv_pz
        # p-chain grads through the affine coefficients (see pack_flat_cols)
        dd3 = jnp.where(use3d, dLdd, 0.0)
        dd2 = jnp.where(use3d, 0.0, dLdd)
        in2d = cmask & ~g["use3d"]
        dxq, dyq = g["dx"], g["dy"]
        dxy_x = jnp.where(in2d, dLdrho * FILTER_INV_SQUARE * 2.0 * dxq, 0.0)
        dxy_y = jnp.where(in2d, dLdrho * FILTER_INV_SQUARE * 2.0 * dyq, 0.0)

        def rsum(x):
            return jnp.sum(x, axis=1, keepdims=True)

        # one MXU pass for all w·cotangent rows: gsel already stacks
        # (gnrm, 0, gcol, extras) in packed-row order, so w @ gselᵀ yields
        # the normal/opacity-placeholder/color/extras grads together
        dsel = jnp.dot(w, gsel.T, preferred_element_type=jnp.float32)
        rows = jnp.concatenate(
            [rsum(pxf * dLdpx), rsum(pxf * dLdpy), rsum(pxf * dLdpz),
             rsum(pyf * dLdpx), rsum(pyf * dLdpy), rsum(pyf * dLdpz),
             rsum(dLdpx), rsum(dLdpy), rsum(dLdpz),
             rsum(dd3 * sx), rsum(dd3 * sy), rsum(dd3 + dd2),
             rsum(dxy_x), rsum(dxy_y),
             dsel[:, 0:3], rsum(dopa), dsel[:, 4:7 + E]], axis=1)
        dout_ref[...] = rows                     # [C, D] slot-major

        Tst[0:1] = T_entry
        Ss[0:1] = Ss[0:1] + tot


def blend_bwd_pallas_aligned(packed, gout, saved, iout, chunk_tile,
                             chunk_rank, num_tiles: int, tile: int,
                             grid_x: int, n_extra: int,
                             interpret: bool = False,
                             extras_only: bool = False,
                             chunk: int = CHUNK) -> jnp.ndarray:
    """packed [ACAP, D] slot-major; returns d(packed) [ACAP, rows]."""
    acap, D = packed.shape
    n_chunks = acap // chunk
    P2 = tile * tile
    OC = 12 + n_extra
    rows = n_extra if extras_only else D   # extras_only emits feature rows only

    def tile_of(i, ct):
        return jnp.minimum(ct[n_chunks - 1 - i], num_tiles - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            # tail chunks (visited first on the reverse walk) never read their
            # slots — pin them to one block so the DMAs dedupe
            pl.BlockSpec((chunk, D),
                         lambda i, ct, cr: (jnp.where(
                             cr[n_chunks - 1 - i] >= n_chunks,
                             n_chunks - 1, n_chunks - 1 - i), 0)),
            pl.BlockSpec((1, OC, P2), lambda i, ct, cr: (tile_of(i, ct), 0, 0)),
            pl.BlockSpec((1, 3, P2), lambda i, ct, cr: (tile_of(i, ct), 0, 0)),
            pl.BlockSpec((1, 2, P2), lambda i, ct, cr: (tile_of(i, ct), 0, 0))],
        out_specs=[pl.BlockSpec((chunk, rows),
                                lambda i, ct, cr: (n_chunks - 1 - i, 0))],
        scratch_shapes=[pltpu.VMEM((1, P2), jnp.float32),
                        pltpu.VMEM((1, P2), jnp.float32)],
    )
    kernel = functools.partial(_bwd_kernel_aligned, tile=tile, grid_x=grid_x,
                               num_tiles=num_tiles, n_extra=n_extra,
                               n_chunks=n_chunks, extras_only=extras_only,
                               chunk=chunk)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((acap, rows), jnp.float32)],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(chunk_tile, chunk_rank, packed, gout, saved, iout)[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def blend_aligned_diff(flat, binning_bundle, num_tiles, tile, grid_x,
                       n_extra, interpret, extras_only=False,
                       chunk=CHUNK):
    """Differentiable aligned-layout Pallas blend.

    flat [N+1, D] per-gaussian packed attrs (sentinel zero row last);
    binning_bundle = (aligned_gid, chunk_tile, chunk_rank) — index data,
    non-differentiable. Returns (out [T,OC,P2], iout [T,2,P2]). The VJP
    reduces per-slot grads to per-gaussian grads with one deterministic
    scatter-add keyed by aligned_gid."""
    out, iout, _ = _blend_aligned_fwd_impl(flat, binning_bundle, num_tiles,
                                           tile, grid_x, n_extra, interpret,
                                           chunk, extras_only)
    return out, iout


def _blend_aligned_fwd_impl(flat, bundle, num_tiles, tile, grid_x, n_extra,
                            interpret, chunk=CHUNK, extras_only=False,
                            viewer=False):
    aligned_gid, chunk_tile, chunk_rank = bundle[0], bundle[1], bundle[2]
    # [ACAP, D] slot-major: the gather's natural output layout IS the
    # kernels' block layout, so neither XLA (a ~200MB relayout copy at 1080p)
    # nor the kernels (a per-chunk [D,C]→[C,D] transpose) pay a transpose
    packed = flat[aligned_gid]              # [ACAP, D]
    f = blend_fwd_pallas_aligned(packed, chunk_tile, chunk_rank, num_tiles,
                                 tile, grid_x, n_extra, interpret,
                                 chunk=chunk, extras_only=extras_only,
                                 viewer=viewer)
    return f.out, f.iout, packed


def blend_aligned_viewer(flat, binning_bundle, num_tiles, tile, grid_x,
                         n_extra, interpret, chunk=CHUNK):
    """Forward-only viewer blend: color + alpha [+ features]; the depth/
    normal/median/distortion rows come back zero. Not differentiable — the
    interactive GUI path never needs gradients."""
    out, iout, _ = _blend_aligned_fwd_impl(
        jax.lax.stop_gradient(flat), binning_bundle, num_tiles, tile, grid_x,
        n_extra, interpret, chunk, viewer=True)
    return out, iout


def _blend_aligned_diff_fwd(flat, bundle, num_tiles, tile, grid_x, n_extra,
                            interpret, extras_only=False, chunk=CHUNK):
    out, iout, packed = _blend_aligned_fwd_impl(flat, bundle, num_tiles, tile,
                                                grid_x, n_extra, interpret,
                                                chunk, extras_only)
    E = n_extra
    saved = jnp.concatenate([out[:, 9:10], out[:, 10 + E:12 + E]], axis=1)
    return (out, iout), (packed, bundle, saved, iout, flat.shape[0])


def _blend_aligned_diff_bwd(num_tiles, tile, grid_x, n_extra, interpret,
                            extras_only, chunk, res, cts):
    packed, bundle, saved, iout, n1 = res
    gout, _ = cts
    aligned_gid, chunk_tile, chunk_rank = bundle[0], bundle[1], bundle[2]
    gid_order = bundle[3] if len(bundle) > 3 and bundle[3] is not None \
        else None
    d_aligned = blend_bwd_pallas_aligned(packed, gout, saved, iout,
                                         chunk_tile, chunk_rank, num_tiles,
                                         tile, grid_x, n_extra, interpret,
                                         extras_only=extras_only, chunk=chunk)
    # already [ACAP, D] or [ACAP, E] slot-major — no relayout
    cols = d_aligned.shape[1]
    if gid_order is not None:
        # cached-binning path (frozen geometry): gather the per-slot grads
        # into gaussian-grouped order, one cumsum, segment-boundary diffs.
        # Faster than the scatter-add (17.7 vs 28.7 ms at 1.5M x 16 on v5e)
        # but needs the argsort indices only cache builds pay for.
        gauss_offsets, gauss_csum = bundle[4], bundle[5]
        d_sorted = d_aligned[gid_order]
        c = jnp.concatenate([jnp.zeros((1, cols), d_aligned.dtype),
                             jnp.cumsum(d_sorted, axis=0)], axis=0)
        d_flat = c[gauss_csum] - c[gauss_offsets]     # [N+1, cols]
    else:
        # fresh-binning path: ONE deterministic scatter-add keyed by the
        # (index-only) aligned gid list — XLA TPU scatter-add is sequential,
        # not atomic, so the determinism guarantee holds without paying the
        # third sort payload fresh binning would need for the chain form.
        # Sentinel slots point at the zero row n1-1, exact-zero grads.
        # Measured XLA/TPU cliff: a 16-column f32 scatter-add lowers ~5x
        # slower than 18 columns (129 vs 26 ms at 1.56M rows on v5e) — pad
        # narrow operands past the cliff and slice the result.
        pad = max(0, 18 - cols)
        if pad:
            d_aligned = jnp.concatenate(
                [d_aligned, jnp.zeros((d_aligned.shape[0], pad),
                                      d_aligned.dtype)], axis=1)
        d_flat = jnp.zeros((n1, cols + pad), d_aligned.dtype
                           ).at[aligned_gid].add(d_aligned)[:, :cols]
    if extras_only:
        # kernel emitted only the E feature rows; the rest of d_flat is zero
        d_flat = jnp.concatenate(
            [jnp.zeros((n1, _EXT), d_flat.dtype), d_flat], axis=1)
    return d_flat, None


blend_aligned_diff.defvjp(_blend_aligned_diff_fwd, _blend_aligned_diff_bwd)
