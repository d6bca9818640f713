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
an 8-32x VPU reduction at identical math.

Round-5 v2 (grouped visits): a one-visit-per-grid-step formulation
measured a ~0.77 us/visit bookkeeping floor that swallowed the VPU win
(ablation: full 1.29 / no-scan 0.77 us per visit), so the kernels process
G consecutive visits per grid step. Because visits are tile-ascending and
their chunk ids are non-decreasing with step <= 1, a G-visit group touches
<= G+1 consecutive chunks and <= G consecutive tiles:

  * the packed table streams in by a manual double-buffered DMA of the
    group's (D, (G+1)*CHUNK) column span (BlockSpec granularity cannot
    express the unaligned span);
  * per-tile state (feature accum, transmittance, done, n_contrib) lives
    in scratch and is written ONCE, at the tile's last visit, into
    per-group output rows; per-chunk backward rows likewise at the
    chunk's last reversed visit. XLA gathers rows back into [T, S, E] /
    [P, E] by closed-form (group, row) indices from the traced visit
    arrays — no scatter, no segment-sum.

Forward semantics per sampled pixel are identical to the full visit kernel
(ops/blend_visits.py; reference forward.cu:256-462) — same masks, same
blend order, same early-termination cut — up to f32 summation order in the
feature contractions (the MXU shapes differ). The backward mirrors the
visit backward's reverse re-walk (backward.cu:143-466) for the extras-only
case. tests/test_blend_sparse.py pins parity of values and grads against
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
from .preprocess import FILTER_INV_SQUARE, NEAR_N

_TW = 9
GROUP = 8          # visits per grid step (fwd and bwd)


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


def _col_f32(row_vec, S):
    """[1, 128] lane-major row -> [S, 1] sublane column (f32). A plain
    transpose/relayout of a 1x128 vector is fragile in Mosaic; the
    iota-mask reduction is a couple of vreg ops."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
    v = jnp.broadcast_to(row_vec.astype(jnp.float32), (S, 128))
    return jnp.sum(jnp.where(lane == row, v, 0.0), axis=1, keepdims=True)


def _sp_col(sp_row, S):
    """int32 variant of _col_f32 (pixel ids are exact in f32)."""
    return _col_f32(sp_row, S).astype(jnp.int32)


def _pad_visits(bundle, G):
    """Pad the visit arrays to a multiple of G with no-work visits pinned to
    the last chunk/tile (carries stay intact; s0==s1 skips the body)."""
    sorted_gid, vc, vt, vs0, vs1, vts = bundle[:6]
    V0 = vt.shape[0]
    n_g = -(-V0 // G)
    pad = n_g * G - V0
    if pad:
        vt = jnp.concatenate([vt, jnp.broadcast_to(vt[-1:], (pad,))])
        vc = jnp.concatenate([vc, jnp.broadcast_to(vc[-1:], (pad,))])
        vs0 = jnp.concatenate([vs0, jnp.zeros((pad,), vs0.dtype)])
        vs1 = jnp.concatenate([vs1, jnp.zeros((pad,), vs1.dtype)])
        vts = jnp.concatenate([vts, jnp.zeros((pad,), vts.dtype)])
    return vc, vt, vs0, vs1, vts, n_g


def _sparse_fwd_kernel(vt_ref, vc_ref, vs0_ref, vs1_ref, vts_ref, c0_ref,
                       t0_ref, pT_hbm, spix_hbm, out_ref, aux_ref,
                       buf, sbuf, sems, acc, Tst, done_s, ncs,
                       *, S, tile, grid_x, n_extra, chunk, V, G):
    g = pl.program_id(0)
    n_g = pl.num_programs(0)
    E = n_extra
    span = (G + 1) * chunk

    # spix rows are stored [T, 1, 128] (lane-aligned for DMA tiling) and
    # streamed per group like the packed column span; the kernel extracts
    # the [S, 1] sublane column with an iota-mask reduction
    def dmas(slot, grp):
        return (pltpu.make_async_copy(
                    pT_hbm.at[:, pl.ds(c0_ref[grp] * chunk, span)],
                    buf.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(
                    spix_hbm.at[pl.ds(t0_ref[grp], G + 1)],
                    sbuf.at[slot], sems.at[slot, 1]))

    @pl.when(g == 0)
    def _():
        for d in dmas(0, 0):
            d.start()

    @pl.when(g + 1 < n_g)
    def _():
        for d in dmas((g + 1) % 2, g + 1):
            d.start()

    for d in dmas(g % 2, g):
        d.wait()
    c0 = c0_ref[g]
    t0 = t0_ref[g]

    for j in range(G):
        i = g * G + j
        tt = vt_ref[i]
        first = (i == 0) | (tt != vt_ref[jnp.maximum(i - 1, 0)])
        tlast = (i == V - 1) | (tt != vt_ref[jnp.minimum(i + 1, V - 1)])
        s0 = vs0_ref[i]
        s1 = vs1_ref[i]
        sp = _sp_col(sbuf[g % 2, tt - t0][0:1, :], S)  # [S,1] or -1
        valid = sp >= 0

        @pl.when(first)
        def _():
            acc[...] = jnp.zeros_like(acc)
            Tst[...] = jnp.ones_like(Tst)
            ncs[...] = jnp.zeros_like(ncs)
            done_s[...] = jnp.broadcast_to((~valid).astype(jnp.int32),
                                           done_s.shape)

        saturated = (~first) & (jnp.min(done_s[:, 0:1]) > 0)

        @pl.when((s1 > s0) & ~saturated)
        def _():
            ty = (tt // grid_x).astype(jnp.float32)
            tx = (tt % grid_x).astype(jnp.float32)
            spc = jnp.maximum(sp, 0)
            pxf = tx * tile + (spc % tile).astype(jnp.float32)
            pyf = ty * tile + (spc // tile).astype(jnp.float32)
            off = pl.multiple_of((vc_ref[i] - c0) * chunk, chunk)
            btT = buf[g % 2, :, pl.ds(off, chunk)]       # [D, C]
            C = chunk
            gterms = _splat_terms_T(btT, pxf, pyf)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
            in_rng = (lane >= s0) & (lane < s1)
            slot = vc_ref[i] * chunk + lane - vts_ref[i]
            m = gterms["m"] & in_rng & valid
            alpha = gterms["alpha"]

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
            w = ac * (T_in * P_excl)                     # [S, C]

            gslot = slot + 1
            lastc = jnp.max(jnp.where(cmask, gslot, 0), axis=1,
                            keepdims=True)
            ext = btT[_EXT:_EXT + E, :]                  # [E, C]
            acc[...] = acc[...] + jax.lax.dot_general(
                w, ext, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [S, E]
            ncs[:, 0:1] = jnp.maximum(ncs[:, 0:1], lastc.astype(jnp.float32))
            Tst[:, 0:1] = T_in * P_c[:, -1:]
            done_s[:, 0:1] = done_cum[:, -1:].astype(jnp.int32)

        @pl.when(tlast)
        def _():
            r = tt - t0
            out_ref[0, pl.ds(r, 1)] = acc[...][None]
            aux_ref[0, pl.ds(r, 1)] = jnp.concatenate(
                [Tst[:, 0:1], ncs[:, 0:1]], axis=1)[None]


def _sparse_bwd_kernel(vt_ref, vc_ref, vs0_ref, vs1_ref, vts_ref, ch_ref,
                       th_ref, pT_hbm, spix_hbm, gout_hbm, aux_hbm,
                       dout_ref, buf, sbuf, gbuf, abuf, sems, dacc, Tst,
                       *, S, tile, grid_x, n_extra, chunk, V, G):
    g = pl.program_id(0)
    n_g = pl.num_programs(0)
    E = n_extra
    span = (G + 1) * chunk

    # per-group DMAs: packed column span ending at the group's max chunk,
    # plus the spix/gout/aux row spans ending at the group's max tile.
    # gout rides transposed-padded [T, E, 128] and aux [T, 8, 128]
    # (row 0 = final_T, row 1 = n_contrib over lanes): DMA slices must be
    # tile-aligned in their last two dims
    def dmas(slot, grp):
        cb = jnp.maximum(ch_ref[grp] - G, 0)
        tb = jnp.maximum(th_ref[grp] - G, 0)
        return (pltpu.make_async_copy(
                    pT_hbm.at[:, pl.ds(cb * chunk, span)],
                    buf.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(
                    gout_hbm.at[pl.ds(tb, G + 1)],
                    gbuf.at[slot], sems.at[slot, 1]),
                pltpu.make_async_copy(
                    aux_hbm.at[pl.ds(tb, G + 1)],
                    abuf.at[slot], sems.at[slot, 2]),
                pltpu.make_async_copy(
                    spix_hbm.at[pl.ds(tb, G + 1)],
                    sbuf.at[slot], sems.at[slot, 3]))

    @pl.when(g == 0)
    def _():
        for d in dmas(0, 0):
            d.start()

    @pl.when(g + 1 < n_g)
    def _():
        for d in dmas((g + 1) % 2, g + 1):
            d.start()

    for d in dmas(g % 2, g):
        d.wait()
    cb = jnp.maximum(ch_ref[g] - G, 0)
    tb = jnp.maximum(th_ref[g] - G, 0)

    for j in range(G):
        i = V - 1 - (g * G + j)
        tt = vt_ref[i]
        nxt = jnp.minimum(i + 1, V - 1)
        tile_first = (g * G + j == 0) | (tt != vt_ref[nxt])
        cv = vc_ref[i]
        chunk_last = (i == 0) | (cv != vc_ref[jnp.maximum(i - 1, 0)])
        s0 = vs0_ref[i]
        s1 = vs1_ref[i]
        chunk_first = (g * G + j == 0) | (cv != vc_ref[nxt])
        trow = tt - tb

        a2 = abuf[g % 2, trow]                            # [8, 128]
        Tfin_col = _col_f32(a2[0:1, :], S)                # [S, 1]
        nc = _col_f32(a2[1:2, :], S)

        @pl.when(tile_first)
        def _():
            Tst[...] = Tfin_col

        @pl.when(chunk_first)
        def _():
            dacc[...] = jnp.zeros_like(dacc)

        max_nc = jnp.max(nc)
        beyond = (cv * chunk + s0 - vts_ref[i]).astype(jnp.float32) >= max_nc

        @pl.when((s1 > s0) & ~beyond)
        def _():
            ty = (tt // grid_x).astype(jnp.float32)
            tx = (tt % grid_x).astype(jnp.float32)
            sp = _sp_col(sbuf[g % 2, trow][0:1, :], S)
            valid = sp >= 0
            spc = jnp.maximum(sp, 0)
            pxf = tx * tile + (spc % tile).astype(jnp.float32)
            pyf = ty * tile + (spc // tile).astype(jnp.float32)
            off = pl.multiple_of((cv - cb) * chunk, chunk)
            btT = buf[g % 2, :, pl.ds(off, chunk)]
            C = chunk
            gterms = _splat_terms_T(btT, pxf, pyf)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
            in_rng = (lane >= s0) & (lane < s1)
            slot = cv * chunk + lane - vts_ref[i]
            gslot = (slot + 1).astype(jnp.float32)

            cmask = gterms["m"] & in_rng & valid & (gslot <= nc)
            ac = jnp.where(cmask, gterms["alpha"], 0.0)
            oc = 1.0 - ac
            P_in = _cumprod_incl_lanes(oc)
            T_exit = Tst[:, 0:1]
            T_entry = T_exit / P_in[:, -1:]
            T_i = T_entry * _shift_right_one_lanes(P_in)
            w = ac * T_i                                 # [S, C]

            g2 = gbuf[g % 2, trow][:, :S]                # [E, S] cotangents
            rowm = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
            rowmask = (rowm >= s0) & (rowm < s1)
            dext = jax.lax.dot_general(
                w, g2, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [C, E]
            dacc[...] = dacc[...] + jnp.where(rowmask, dext, 0.0)
            Tst[...] = T_entry

        @pl.when(chunk_last)
        def _():
            r = ch_ref[g] - cv
            dout_ref[0, pl.ds(r, 1)] = dacc[...][None]
            # the accumulator restarts with the next (smaller) chunk
            dacc[...] = jnp.zeros_like(dacc)


def _pad_table(packedT, chunk):
    """Pad the transposed table: +G+1 chunk columns (DMA over-read past the
    last group) and rows up to a sublane multiple (Mosaic requires DMA
    slices tile-aligned along dim 0)."""
    D = packedT.shape[0]
    D8 = -(-D // 8) * 8
    return jnp.pad(packedT, ((0, D8 - D), (0, (GROUP + 1) * chunk))), D8


def _sparse_fwd_call(packedT, spix, bundle, num_tiles, tile, grid_x,
                     n_extra, interpret, chunk, S):
    vc, vt, vs0, vs1, vts, n_g = _pad_visits(bundle, GROUP)
    V = n_g * GROUP
    c0 = vc[::GROUP]
    t0 = vt[::GROUP]
    pT_pad, D = _pad_table(packedT, chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(n_g,),
        in_specs=[
            # the packed table and spix rows stay in HBM (manual
            # double-buffered DMA); ANY in interpret mode, which has no
            # memory spaces
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.HBM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.HBM)],
        out_specs=[
            pl.BlockSpec((1, GROUP, S, n_extra),
                         lambda g, *_: (g, 0, 0, 0)),
            pl.BlockSpec((1, GROUP, S, 2), lambda g, *_: (g, 0, 0, 0))],
        scratch_shapes=[
            pltpu.VMEM((2, D, (GROUP + 1) * chunk), jnp.float32),
            pltpu.VMEM((2, GROUP + 1, 8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((S, n_extra), jnp.float32),
            pltpu.VMEM((S, 1), jnp.float32),
            pltpu.VMEM((S, 1), jnp.int32),
            pltpu.VMEM((S, 1), jnp.float32)],
    )
    kernel = functools.partial(_sparse_fwd_kernel, S=S, tile=tile,
                               grid_x=grid_x, n_extra=n_extra, chunk=chunk,
                               V=V, G=GROUP)
    spix_pad = jnp.concatenate(
        [spix, jnp.full((GROUP + 1,) + spix.shape[1:], -1, spix.dtype)])
    out_rows, aux_rows = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_g, GROUP, S, n_extra), jnp.float32),
            jax.ShapeDtypeStruct((n_g, GROUP, S, 2), jnp.float32)],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(vt, vc, vs0, vs1, vts, c0, t0, pT_pad, spix_pad)

    # rows -> per-tile maps: tile t's final state was written at its LAST
    # visit i_t; its group is i_t // G and its row t - vt[group start]
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    i_t = jnp.searchsorted(vt, tids, side="right").astype(jnp.int32) - 1
    g_t = i_t // GROUP
    r_t = tids - t0[g_t]
    feat = out_rows[g_t, r_t]                    # [T, S, E]
    aux = aux_rows[g_t, r_t]                     # [T, S, 2]
    return feat, aux


def _sparse_bwd_call(packedT, spix, gout, aux, bundle, num_tiles, tile,
                     grid_x, n_extra, interpret, chunk, S):
    vc, vt, vs0, vs1, vts, n_g = _pad_visits(bundle, GROUP)
    V = n_g * GROUP
    S = gout.shape[1]
    P = packedT.shape[1]
    n_chunks = P // chunk
    # reversed-group bases: the group's max chunk / max tile (its FIRST
    # reversed visit has the group's largest indices)
    rev_first = V - 1 - jnp.arange(n_g, dtype=jnp.int32) * GROUP
    ch = vc[rev_first]
    th = vt[rev_first]
    pT_pad, D = _pad_table(packedT, chunk)
    E = n_extra
    # lane-major DMA-able layouts: gout [T, E, 128] (S lanes), aux rows
    # [T, 8, 128] (row 0 = final_T, row 1 = n_contrib)
    gout2 = jnp.zeros((gout.shape[0], E, 128), gout.dtype
                      ).at[:, :, :S].set(jnp.swapaxes(gout, 1, 2))
    aux2 = jnp.zeros((aux.shape[0], 8, 128), aux.dtype
                     ).at[:, :2, :S].set(jnp.swapaxes(aux, 1, 2))
    pad_rows = lambda a: jnp.concatenate(
        [a, jnp.zeros((GROUP + 1,) + a.shape[1:], a.dtype)], axis=0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(n_g,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.HBM)
            for _ in range(4)],
        out_specs=[pl.BlockSpec((1, GROUP + 1, chunk, n_extra),
                                lambda g, *_: (g, 0, 0, 0))],
        scratch_shapes=[
            pltpu.VMEM((2, D, (GROUP + 1) * chunk), jnp.float32),
            pltpu.VMEM((2, GROUP + 1, 8, 128), jnp.int32),
            pltpu.VMEM((2, GROUP + 1, n_extra, 128), jnp.float32),
            pltpu.VMEM((2, GROUP + 1, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.VMEM((chunk, n_extra), jnp.float32),
            pltpu.VMEM((S, 1), jnp.float32)],
    )
    kernel = functools.partial(_sparse_bwd_kernel, S=S, tile=tile,
                               grid_x=grid_x, n_extra=n_extra, chunk=chunk,
                               V=V, G=GROUP)
    spix_pad = jnp.concatenate(
        [spix, jnp.full((GROUP + 1,) + spix.shape[1:], -1, spix.dtype)])
    dout_rows = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_g, GROUP + 1, chunk, n_extra),
                                        jnp.float32)],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(vt, vc, vs0, vs1, vts, ch, th, pT_pad, spix_pad, pad_rows(gout2),
      pad_rows(aux2))[0]

    # chunk c's rows were written once, at its last reversed visit (= its
    # first forward visit f_c), into group (V-1-f_c)//G, row ch[group] - c
    cids = jnp.arange(n_chunks, dtype=jnp.int32)
    f_c = jnp.searchsorted(vc, cids, side="left").astype(jnp.int32)
    g_c = (V - 1 - f_c) // GROUP
    r_c = ch[g_c] - cids
    return dout_rows[g_c, r_c].reshape(P, n_extra)


def _sparse_fwd_impl(flat, bundle, spix, num_tiles, tile, grid_x, n_extra,
                     interpret, chunk, S):
    sorted_gid = bundle[0]
    packedT = jnp.transpose(flat[sorted_gid])        # [D, P] slot-lane major
    out, aux = _sparse_fwd_call(packedT, spix, bundle, num_tiles, tile,
                                grid_x, n_extra, interpret, chunk, S)
    return out, aux, packedT


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def blend_sparse_diff(flat, binning_bundle, spix, num_tiles, tile, grid_x,
                      n_extra, interpret, chunk=CHUNK, S=64):
    """Differentiable sparse-pixel extras blend over the visit layout.

    flat [N+1, 21+E] packed attrs (pack_flat_cols); binning_bundle — a
    length>=9 cached visit bundle (the chain-reduce indices are required:
    sparse rendering serves the frozen-geometry semantic stage); spix
    [num_tiles, S, 1] int32 within-tile pixel indices (-1 padding, from
    spix_from_idx). Returns (feat [num_tiles, S, E], aux [num_tiles, S, 2]
    = (final_T, n_contrib)); grads flow to flat's extras columns only."""
    out, aux, _ = _sparse_fwd_impl(flat, binning_bundle, spix, num_tiles,
                                   tile, grid_x, n_extra, interpret, chunk,
                                   S)
    return out, aux


def _blend_sparse_fwd(flat, bundle, spix, num_tiles, tile, grid_x, n_extra,
                      interpret, chunk, S):
    out, aux, packedT = _sparse_fwd_impl(flat, bundle, spix, num_tiles,
                                         tile, grid_x, n_extra, interpret,
                                         chunk, S)
    return (out, aux), (packedT, bundle, spix, aux, flat.shape[0])


def _blend_sparse_bwd(num_tiles, tile, grid_x, n_extra, interpret, chunk,
                      S, res, cts):
    packedT, bundle, spix, aux, n1 = res
    gout, _ = cts
    d_sorted = _sparse_bwd_call(packedT, spix, gout, aux, bundle, num_tiles,
                                tile, grid_x, n_extra, interpret, chunk, S)
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
    return min(128, (s + 7) // 8 * 8)


def spix_from_idx(idx, width: int, height: int, tile: int, S: int,
                  valid=None):
    """Pack sampled flat pixel indices into per-tile slot lists.

    idx [B] int32 flat pixel indices (duplicates allowed — each occupies
    its own slot). valid [B] bool (optional): entries marked False claim no
    slot and are excluded from the overflow check (multi-view packing
    passes each view the window draw with other views masked out).
    Returns (spix [T, 8, 128] int32 lane-major rows, slots in row 0, -1
    padding (slots >= S always -1; S <= 128), t_of [B], slot_of [B],
    overflow bool). Sample j's rendered feature is feat[t_of[j], slot_of[j]] when
    valid and not overflow."""
    assert S <= 128, S
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
    spix = jnp.full((T, 128), -1, jnp.int32).at[
        jnp.where(keep, t, T), jnp.clip(rank, 0, S - 1)].set(
        p2, mode="drop")
    # row 0 of an 8-row band carries the slots (DMA slices must be
    # tile-aligned in the sublane dim)
    spix8 = jnp.full((T, 8, 128), -1, jnp.int32).at[:, 0, :].set(spix)
    return (spix8, jnp.where(in_img, t, 0),
            jnp.clip(rank, 0, S - 1), overflow)
