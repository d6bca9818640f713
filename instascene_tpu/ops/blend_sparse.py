"""Sparse-pixel extras blend: alpha-blend ONLY a sampled pixel subset.

The semantic contrastive losses read the rendered feature maps at a few
thousand sampled pixels (reference train_semantic.py:108-172), but the
full extras kernels still pay VPU work for all 256 pixels of every visited
tile — done-mask early termination can't help because with ~2-24 random
sampled pixels per tile at least one saturates late (measured: done0 moved
an extras render by <3%, bench_probes/probe_mv3.py).

This module restructures the LAYOUT instead: sampled pixels live on the
SUBLANE axis (S = 24..64 per tile) and the chunk's 128 slots on the LANE
axis, so every elementwise op touches S*128 slots instead of 128*256 —
an 8-32x VPU reduction at identical math. Per visit:

  [S, C] splat terms from a transposed packed block [D, C]
  lane-axis cumprod for the ordered transmittance chain
  MXU contractions for the feature sums (fwd: w[S,C] x ext[E,C] -> [S,E];
  bwd: w[S,C] x g[S,E] -> [C,E])

Forward semantics per sampled pixel are IDENTICAL to the full visit kernel
(ops/blend_visits.py; reference forward.cu:256-462) — same masks, same
blend order, same early-termination cut — because a pixel's blend is
independent of its neighbors. The backward mirrors the visit backward's
reverse re-walk (backward.cu:143-466) for the extras-only case.
tests/test_blend_sparse.py pins bit-exactness of values and grads against
the full kernels.

Pixel lists come from the step's own random draws (they depend only on
segmaps, never on the render), packed per tile by spix_from_idx; tiles
whose draw count overflows S are reported so callers can fall back to the
dense path (pipelines.train_semantic wraps both in lax.cond — exactness
does not depend on the tail bound).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blend_pallas import _EXT, _OPA, _XY, CHUNK
from .blend_visits import _check_visit_budget
from .preprocess import FILTER_INV_SQUARE, NEAR_N

_TW = 9


def _cumprod_incl_lanes(x):
    """Inclusive prefix product along axis 1 (lanes) — the lane-axis mirror
    of blend_pallas._cumprod_incl (log-step masked rolls)."""
    c = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    y = x
    shift = 1
    while shift < c:
        rolled = pltpu.roll(y, shift, axis=1)
        y = y * jnp.where(lane >= shift, rolled, 1.0)
        shift *= 2
    return y


def _shift_right_one_lanes(x, fill=1.0):
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= 1, pltpu.roll(x, 1, axis=1), fill)


def _splat_terms_T(btT, pxf, pyf):
    """btT [D, C] transposed packed chunk; pxf/pyf [S, 1]. Outputs [S, C].
    Same math as blend_pallas._splat_terms with the broadcast orientation
    flipped (attributes ride lanes, pixels ride sublanes)."""
    Ax, Ay, Az = btT[0:1, :], btT[1:2, :], btT[2:3, :]
    Bx, By, Bz = btT[3:4, :], btT[4:5, :], btT[5:6, :]
    Cx, Cy, Cz = btT[6:7, :], btT[7:8, :], btT[8:9, :]
    Twz = btT[_TW + 2:_TW + 3, :]
    px_ = pxf * Ax + pyf * Bx + Cx
    py_ = pxf * Ay + pyf * By + Cy
    pz_ = pxf * Az + pyf * Bz + Cz
    pz_ok = pz_ != 0.0
    pz = jnp.where(pz_ok, pz_, 1.0)
    inv_pz = 1.0 / pz
    sx = jnp.clip(px_ * inv_pz, -3e4, 3e4)
    sy = jnp.clip(py_ * inv_pz, -3e4, 3e4)
    rho3d = sx * sx + sy * sy
    dx = btT[_XY:_XY + 1, :] - pxf
    dy = btT[_XY + 1:_XY + 2, :] - pyf
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    use3d = rho3d <= rho2d
    rho = jnp.where(use3d, rho3d, rho2d)
    depth_ray = jnp.where(
        use3d, sx * btT[_TW:_TW + 1, :] + sy * btT[_TW + 1:_TW + 2, :] + Twz,
        Twz)
    power = -0.5 * rho
    G = jnp.exp(power)
    alpha = jnp.minimum(btT[_OPA:_OPA + 1, :] * G, 0.99)
    m = (pz_ok & (depth_ray >= NEAR_N) & (power <= 0.0)
         & (alpha >= 1.0 / 255.0))
    return dict(alpha=alpha, m=m)


def _sparse_fwd_kernel(vt_ref, vc_ref, vs0_ref, vs1_ref, vts_ref,
                       packedT_ref, spix_ref, out_ref, aux_ref,
                       Tst, done_s, *, tile, grid_x, n_extra, chunk):
    i = pl.program_id(0)
    E = n_extra
    tt = vt_ref[i]
    first = (i == 0) | (tt != vt_ref[jnp.maximum(i - 1, 0)])
    s0 = vs0_ref[i]
    s1 = vs1_ref[i]
    sp = spix_ref[0]                        # [S, 1] within-tile pixel or -1
    valid = sp >= 0

    @pl.when(first)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)
        aux = jnp.concatenate(
            [jnp.ones_like(sp, jnp.float32),           # final_T = 1
             jnp.zeros_like(sp, jnp.float32)], axis=1)  # n_contrib = 0
        aux_ref[0] = aux
        Tst[...] = jnp.ones_like(Tst)
        # padding rows start 'done' so the whole-visit skip keys on the
        # real sampled pixels only
        done_s[...] = jnp.broadcast_to((~valid).astype(jnp.int32),
                                       done_s.shape)

    saturated = (~first) & (jnp.min(done_s[:, 0:1]) > 0)

    @pl.when((s1 > s0) & ~saturated)
    def _work():
        ty = (tt // grid_x).astype(jnp.float32)
        tx = (tt % grid_x).astype(jnp.float32)
        spc = jnp.maximum(sp, 0)
        pxf = tx * tile + (spc % tile).astype(jnp.float32)   # [S, 1]
        pyf = ty * tile + (spc // tile).astype(jnp.float32)
        btT = packedT_ref[...]                               # [D, C]
        C = btT.shape[1]
        g = _splat_terms_T(btT, pxf, pyf)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        in_rng = (lane >= s0) & (lane < s1)
        slot = vc_ref[i] * chunk + lane - vts_ref[i]
        m = g["m"] & in_rng & valid
        alpha = g["alpha"]

        T_in = Tst[:, 0:1]
        done_in = done_s[:, 0:1] > 0
        am = jnp.where(m, alpha, 0.0)
        om = 1.0 - am
        P_incl = _cumprod_incl_lanes(om)
        P_excl = _shift_right_one_lanes(P_incl)
        done_cum = done_in | (T_in * P_incl < 1e-4)
        cmask = m & ~done_cum
        cut_val = jnp.max(jnp.where(done_cum, P_excl, 0.0), axis=1,
                          keepdims=True)
        P_c = jnp.maximum(P_incl, cut_val)
        ac = jnp.where(cmask, alpha, 0.0)
        w = ac * (T_in * P_excl)                             # [S, C]

        gslot = slot + 1
        lastc = jnp.max(jnp.where(cmask, gslot, 0), axis=1, keepdims=True)
        T_out = T_in * P_c[:, -1:]

        ext = btT[_EXT:_EXT + E, :]                          # [E, C]
        acc = jax.lax.dot_general(
            w, ext, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [S, E]
        out_ref[0] = out_ref[0] + acc
        aux = aux_ref[0]
        aux_ref[0] = jnp.concatenate(
            [T_out, jnp.maximum(aux[:, 1:2], lastc.astype(jnp.float32))],
            axis=1)
        Tst[:, 0:1] = T_out
        done_s[:, 0:1] = done_cum[:, -1:].astype(jnp.int32)


def _sparse_bwd_kernel(vt_ref, vc_ref, vs0_ref, vs1_ref, vts_ref,
                       packedT_ref, spix_ref, gout_ref, aux_ref, dout_ref,
                       Tst, *, tile, grid_x, n_extra, n_visits, chunk):
    i = pl.program_id(0)
    j = n_visits - 1 - i
    E = n_extra
    tt = vt_ref[j]
    nxt = jnp.minimum(j + 1, n_visits - 1)
    tile_first = (i == 0) | (tt != vt_ref[nxt])
    cv = vc_ref[j]
    chunk_first = (i == 0) | (cv != vc_ref[nxt])
    s0 = vs0_ref[j]
    s1 = vs1_ref[j]

    @pl.when(tile_first)
    def _init():
        Tst[:, 0:1] = aux_ref[0][:, 0:1]          # final_T per sampled pixel

    max_nc = jnp.max(aux_ref[0][:, 1:2])
    beyond = (cv * chunk + s0 - vts_ref[j]).astype(jnp.float32) >= max_nc
    work = (s1 > s0) & ~beyond

    @pl.when(chunk_first & ~work)
    def _zero():
        dout_ref[...] = jnp.zeros_like(dout_ref)

    @pl.when(work)
    def _work():
        ty = (tt // grid_x).astype(jnp.float32)
        tx = (tt % grid_x).astype(jnp.float32)
        sp = spix_ref[0]
        valid = sp >= 0
        spc = jnp.maximum(sp, 0)
        pxf = tx * tile + (spc % tile).astype(jnp.float32)
        pyf = ty * tile + (spc // tile).astype(jnp.float32)
        btT = packedT_ref[...]
        C = btT.shape[1]
        g = _splat_terms_T(btT, pxf, pyf)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        in_rng = (lane >= s0) & (lane < s1)
        slot = cv * chunk + lane - vts_ref[j]
        gslot = (slot + 1).astype(jnp.float32)
        nc = aux_ref[0][:, 1:2]

        cmask = g["m"] & in_rng & valid & (gslot <= nc)
        ac = jnp.where(cmask, g["alpha"], 0.0)
        oc = 1.0 - ac
        P_in = _cumprod_incl_lanes(oc)
        T_exit = Tst[:, 0:1]
        T_entry = T_exit / P_in[:, -1:]
        T_i = T_entry * _shift_right_one_lanes(P_in)
        w = ac * T_i                                        # [S, C]

        gext = gout_ref[0]                                  # [S, E]
        dext = jax.lax.dot_general(
            w, gext, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [C, E]
        rowm = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
        rowmask = (rowm >= s0) & (rowm < s1)
        base = jnp.where(chunk_first, jnp.zeros_like(dout_ref[...]),
                         dout_ref[...])
        dout_ref[...] = jnp.where(rowmask, dext, base)
        Tst[:, 0:1] = T_entry


def _sparse_fwd_call(packedT, spix, bundle, num_tiles, tile, grid_x,
                     n_extra, interpret, chunk):
    _sorted_gid, vc, vt, vs0, vs1, vts = bundle[:6]
    V = vt.shape[0]
    _check_visit_budget(V, interpret)
    S = spix.shape[1]
    D = packedT.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(V,),
        in_specs=[
            pl.BlockSpec((D, chunk), lambda i, vt, vc, s0, s1, ts:
                         (0, vc[i])),
            pl.BlockSpec((1, S, 1), lambda i, vt, vc, s0, s1, ts:
                         (vt[i], 0, 0))],
        out_specs=[
            pl.BlockSpec((1, S, n_extra), lambda i, vt, vc, s0, s1, ts:
                         (vt[i], 0, 0)),
            pl.BlockSpec((1, S, 2), lambda i, vt, vc, s0, s1, ts:
                         (vt[i], 0, 0))],
        scratch_shapes=[pltpu.VMEM((S, 128), jnp.float32),
                        pltpu.VMEM((S, 128), jnp.int32)],
    )
    kernel = functools.partial(_sparse_fwd_kernel, tile=tile, grid_x=grid_x,
                               n_extra=n_extra, chunk=chunk)
    out, aux = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, S, n_extra), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, S, 2), jnp.float32)],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(vt, vc, vs0, vs1, vts, packedT, spix)
    return out, aux


def _sparse_bwd_call(packedT, spix, gout, aux, bundle, num_tiles, tile,
                     grid_x, n_extra, interpret, chunk):
    _sorted_gid, vc, vt, vs0, vs1, vts = bundle[:6]
    V = vt.shape[0]
    _check_visit_budget(V, interpret)
    S = spix.shape[1]
    D = packedT.shape[0]
    P = packedT.shape[1]

    def tof(i, vt):
        return vt[V - 1 - i]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(V,),
        in_specs=[
            pl.BlockSpec((D, chunk), lambda i, vt, vc, s0, s1, ts:
                         (0, vc[V - 1 - i])),
            pl.BlockSpec((1, S, 1), lambda i, vt, vc, s0, s1, ts:
                         (tof(i, vt), 0, 0)),
            pl.BlockSpec((1, S, n_extra), lambda i, vt, vc, s0, s1, ts:
                         (tof(i, vt), 0, 0)),
            pl.BlockSpec((1, S, 2), lambda i, vt, vc, s0, s1, ts:
                         (tof(i, vt), 0, 0))],
        out_specs=[pl.BlockSpec((chunk, n_extra),
                                lambda i, vt, vc, s0, s1, ts:
                                (vc[V - 1 - i], 0))],
        scratch_shapes=[pltpu.VMEM((S, 128), jnp.float32)],
    )
    kernel = functools.partial(_sparse_bwd_kernel, tile=tile, grid_x=grid_x,
                               n_extra=n_extra, n_visits=V, chunk=chunk)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((P, n_extra), jnp.float32)],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(vt, vc, vs0, vs1, vts, packedT, spix, gout, aux)[0]


def _sparse_fwd_impl(flat, bundle, spix, num_tiles, tile, grid_x, n_extra,
                     interpret, chunk):
    sorted_gid = bundle[0]
    packedT = jnp.transpose(flat[sorted_gid])        # [D, P] slot-lane major
    out, aux = _sparse_fwd_call(packedT, spix, bundle, num_tiles, tile,
                                grid_x, n_extra, interpret, chunk)
    return out, aux, packedT


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def blend_sparse_diff(flat, binning_bundle, spix, num_tiles, tile, grid_x,
                      n_extra, interpret, chunk=CHUNK):
    """Differentiable sparse-pixel extras blend over the visit layout.

    flat [N+1, 21+E] packed attrs (pack_flat_cols); binning_bundle — a
    length>=9 cached visit bundle (the chain-reduce indices are required:
    sparse rendering serves the frozen-geometry semantic stage); spix
    [num_tiles, S, 1] int32 within-tile pixel indices (-1 padding, from
    spix_from_idx). Returns (feat [num_tiles, S, E], aux [num_tiles, S, 2]
    = (final_T, n_contrib)); grads flow to flat's extras columns only."""
    out, aux, _ = _sparse_fwd_impl(flat, binning_bundle, spix, num_tiles,
                                   tile, grid_x, n_extra, interpret, chunk)
    return out, aux


def _blend_sparse_fwd(flat, bundle, spix, num_tiles, tile, grid_x, n_extra,
                      interpret, chunk):
    out, aux, packedT = _sparse_fwd_impl(flat, bundle, spix, num_tiles,
                                         tile, grid_x, n_extra, interpret,
                                         chunk)
    return (out, aux), (packedT, bundle, spix, aux, flat.shape[0])


def _blend_sparse_bwd(num_tiles, tile, grid_x, n_extra, interpret, chunk,
                      res, cts):
    packedT, bundle, spix, aux, n1 = res
    gout, _ = cts
    d_sorted = _sparse_bwd_call(packedT, spix, gout, aux, bundle, num_tiles,
                                tile, grid_x, n_extra, interpret, chunk)
    gid_order, gauss_offsets, gauss_csum = bundle[6], bundle[7], bundle[8]
    # cached-binning chain reduction (same scheme as blend_visits)
    d_g = d_sorted[gid_order]
    c = jnp.concatenate([jnp.zeros((1, n_extra), d_sorted.dtype),
                         jnp.cumsum(d_g, axis=0)], axis=0)
    d_ext = c[gauss_csum] - c[gauss_offsets]
    d_flat = jnp.concatenate(
        [jnp.zeros((n1, _EXT), d_ext.dtype), d_ext], axis=1)
    return d_flat, None, None


blend_sparse_diff.defvjp(_blend_sparse_fwd, _blend_sparse_bwd)


def pick_sparse_s(batch: int, num_tiles: int) -> int:
    """Static per-tile pixel-slot count: mean draw density lambda plus a
    ~6-sigma Poisson tail and margin, rounded to the sublane multiple.
    Overflow beyond S is still EXACT — spix_from_idx reports it and the
    trainer falls back to the dense path via lax.cond — so S only tunes
    how often the (slower) fallback runs."""
    lam = batch / max(num_tiles, 1)
    s = int(lam + 6.0 * max(lam, 1.0) ** 0.5 + 10.0)
    return min(256, (s + 7) // 8 * 8)


def spix_from_idx(idx, width: int, height: int, tile: int, S: int,
                  valid=None):
    """Pack sampled flat pixel indices into per-tile slot lists.

    idx [B] int32 flat pixel indices (duplicates allowed — each occupies
    its own slot). valid [B] bool (optional): entries marked False claim no
    slot and are excluded from the overflow check (multi-view packing
    passes each view the window draw with other views masked out).
    Returns (spix [T, S, 1] int32 with -1 padding, t_of [B], slot_of [B],
    overflow bool). Sample j's rendered feature is
    feat[t_of[j], slot_of[j]] when valid and not overflow."""
    grid_x = (width + tile - 1) // tile
    grid_y = (height + tile - 1) // tile
    T = grid_x * grid_y
    B = idx.shape[0]
    y, x = idx // width, idx % width
    t = (y // tile) * grid_x + (x // tile)
    p2 = (y % tile) * tile + (x % tile)
    if valid is not None:
        t = jnp.where(valid, t, T)          # invalid entries sort past all
    order = jnp.argsort(t)                    # stable: deterministic slots
    t_s = t[order]
    # within-tile rank in sorted order: position minus the run start
    # (run starts propagate by a cummax — cheaper than searchsorted's
    # B log B random gathers at B = 64k)
    arange_b = jnp.arange(B, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), t_s[1:] != t_s[:-1]])
    start = jax.lax.cummax(jnp.where(is_start, arange_b, 0))
    rank_s = arange_b - start
    # invert the sort to index ranks by sample
    inv = jnp.zeros((B,), jnp.int32).at[order].set(
        jnp.arange(B, dtype=jnp.int32))
    rank = rank_s[inv]
    in_img = t < T
    overflow = jnp.any((rank >= S) & in_img)
    keep = (rank < S) & in_img
    spix = jnp.full((T, S), -1, jnp.int32).at[
        jnp.where(keep, t, T), jnp.clip(rank, 0, S - 1)].set(
        p2, mode="drop")
    return (spix[:, :, None], jnp.where(in_img, t, 0),
            jnp.clip(rank, 0, S - 1), overflow)
