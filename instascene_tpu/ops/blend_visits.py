"""Pallas TPU blend kernels over the compact-sorted VISIT layout (round 3).

Replaces the aligned-flat layout for full-frame rendering: pairs stay at
their depth-sorted positions (see binning.VisitLayout), so

  * the pack gather runs over pair_cap rows instead of the aligned layout's
    ~1.7x chunk-padded capacity (the gather is pure per-row latency —
    measured width-independent ~8.6 ns/row on v5e),
  * the 13 ms aligned-gid scatter disappears entirely (sorted order IS the
    slot order),
  * the backward's per-gaussian reduction shrinks by the same row ratio.

The grid walks (chunk, tile)-intersection visits: a 128-pair chunk whose
slots span a tile boundary is visited once per intersecting tile with the
slot range [s0, s1) masked in-kernel. Visits are tile-ascending, so chunk
block indices are non-decreasing and per-tile output blocks see consecutive
revisits — the Pallas TPU resident-buffer invariant. Forward semantics match
ops/blend.py exactly (reference forward.cu:256-462); the backward re-walks
visits in reverse (backward.cu:143-466's recomputation trick) and writes
partial chunk rows read-modify-write (first visit of a chunk block
zero-fills it, covering slots owned by other tiles and the sentinel tail).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blend import TRACK_K
from .blend_pallas import (CHUNK, _COL, _EXT, _NRM, _OPA, _XY, _cumprod_incl,
                           _cumsum_excl, _cumsum_incl, _shift_down_one,
                           _splat_terms, PallasBlendFwdOut)
from .preprocess import FAR_N, FILTER_INV_SQUARE, NEAR_N

# The five per-visit s32 arrays (tile, chunk, s0, s1, tstart) are scalar-
# prefetched WHOLE into SMEM (1 MiB on v5e, shared with grid bookkeeping).
# Past ~46k visits Mosaic fails with an opaque "Ran out of memory in memory
# space smem" at compile time — fail early with the knobs that shrink the
# visit count instead. (Measured: a dilate=2 cached-superset bundle at 1080p
# with 300k gaussians builds 19.2M pair slots = 158k visits = 3.03 MiB.)
VISIT_SMEM_BUDGET_BYTES = 900 * 1024


def _check_visit_budget(n_visits: int, interpret: bool) -> None:
    if interpret:
        return  # interpret mode has no SMEM; CPU parity tests run any size
    need = 5 * 4 * n_visits
    if need > VISIT_SMEM_BUDGET_BYTES:
        raise ValueError(
            f"visit layout needs {need // 1024} KiB of SMEM scalar prefetch "
            f"({n_visits} visits x 5 s32 arrays) but the TPU budget is "
            f"~{VISIT_SMEM_BUDGET_BYTES // 1024} KiB. Shrink the pair list: "
            "lower dilate_tiles (a dilated cached-superset bundle grows the pair list "
            "~(1 + 2d/rect_tiles)^2), keep pair_cap snug, or split the "
            "frame into tile slabs (parallel/render_sharded.py).")


def _fwd_kernel_visits(vt_ref, vc_ref, vs0_ref, vs1_ref, vts_ref,
                       packed_ref, *refs, tile, grid_x, num_tiles,
                       n_extra, chunk=CHUNK, extras_only=False, viewer=False,
                       track=False, clip_rect=False, no_dist=False,
                       tiles_per_view=0, sampled_done=False):
    if sampled_done:
        # sampled-pixel mode (extras_only consumers whose loss reads only a
        # sampled pixel subset): done0 pre-latches every UNSAMPLED pixel, so
        # the whole-visit early termination fires once the tile's few
        # sampled pixels saturate. Sampled pixels' outputs are bit-identical
        # to the full render (a pixel's blend is independent of its
        # neighbors); unsampled outputs are zeros and must not be consumed.
        done0_ref = refs[0]
        refs = refs[1:]
    if track:
        # track mode: full body + the w>0.1 contributor buffer (the CUDA
        # gau_related_pixels analogue, forward.cu:422-428, deterministic
        # per-pixel top-K instead of an atomic append list). The packed
        # block carries the gaussian id as its LAST column.
        (out_ref, iout_ref, tid_ref, tw_ref,
         Tst, m1s, m2s, done_s, cnt_s) = refs
    else:
        out_ref, iout_ref, Tst, m1s, m2s, done_s = refs
        tid_ref = tw_ref = cnt_s = None
    i = pl.program_id(0)
    E = n_extra
    tt = vt_ref[i]
    prev_tt = vt_ref[jnp.maximum(i - 1, 0)]
    first = (i == 0) | (tt != prev_tt)
    s0 = vs0_ref[i]
    s1 = vs1_ref[i]

    # FULL mode writes every out/iout row and every carry absolutely in
    # _work, so a tile's first working visit needs no separate zero-store
    # pass — stale buffer contents are displaced by first-predicated selects
    # inside _work (~45% of 1080p visits are firsts; the double store was
    # measurable). The slim modes (viewer/extras_only) write only a row
    # subset and track's contributor buffers are RMW, so they keep the
    # explicit init. Empty tiles (their single s0==s1 visit) always need it.
    select_init = not (extras_only or viewer or track)

    # every tile owns >= one visit (empty tiles get an s0==s1 one), so init
    # runs exactly once per tile — no unvisited-row fixup needed
    @pl.when(first & (s1 <= s0) if select_init else first)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)
        out_ref[0, 9:10] = jnp.ones_like(out_ref[0, 9:10])  # final_T = 1
        iout_ref[...] = jnp.zeros_like(iout_ref)
        Tst[...] = jnp.ones_like(Tst)
        m1s[...] = jnp.zeros_like(m1s)
        m2s[...] = jnp.zeros_like(m2s)
        done_s[...] = done0_ref[0] if sampled_done \
            else jnp.zeros_like(done_s)
        if track:
            tid_ref[...] = jnp.full_like(tid_ref, -1)
            tw_ref[...] = jnp.zeros_like(tw_ref)
            cnt_s[...] = jnp.zeros_like(cnt_s)

    # whole-visit early termination (forward.cu:388-393): once every pixel
    # latched done, later visits of the tile cannot change anything
    saturated = (~first) & (jnp.min(done_s[0:1]) > 0)

    @pl.when((s1 > s0) & ~saturated)
    def _work():
        # merged virtual-image mode (tiles_per_view > 0): the tile space
        # concatenates several views' grids, so pixel coordinates come from
        # the view-LOCAL tile index — per-view splat math stays bit-exact
        # (no homography shift, no cross-product cancellation)
        ttl = tt % tiles_per_view if tiles_per_view else tt
        ty = (ttl // grid_x).astype(jnp.float32)
        tx = (ttl % grid_x).astype(jnp.float32)
        p = jax.lax.broadcasted_iota(jnp.int32, (1, tile * tile), 1)
        pxf = tx * tile + (p % tile).astype(jnp.float32)
        pyf = ty * tile + (p // tile).astype(jnp.float32)

        bt = packed_ref[...]                     # [C, D] slot-major block
        C = bt.shape[0]
        g = _splat_terms(bt, pxf, pyf)
        iota = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
        in_rng = (iota >= s0) & (iota < s1)
        # within-tile slot number (0-based): global sorted slot - tile_start
        slot = vc_ref[i] * chunk + iota - vts_ref[i]
        m = g["m"] & in_rng
        if clip_rect:
            # cached-superset mode: gate by the per-gaussian FRESH tile rect
            # (4 trailing packed cols) so extra dilated pairs reproduce the
            # fresh binning's rect clipping exactly (pack_flat_cols rect=)
            m = m & ((bt[:, -4:-3] <= tx) & (tx < bt[:, -3:-2])
                     & (bt[:, -2:-1] <= ty) & (ty < bt[:, -1:]))
        alpha = g["alpha"]
        depth_ray = g["depth_ray"]

        if select_init:
            # first working visit of a tile: displace the stale buffer
            # contents with the init values via scalar-predicated selects
            # (see select_init above) instead of a separate zero-store pass
            T_in = jnp.where(first, 1.0, Tst[0:1])
            done_in = (~first) & (done_s[0:1] > 0)
        else:
            T_in = Tst[0:1]
            done_in = done_s[0:1] > 0
        am = jnp.where(m, alpha, 0.0)
        om = 1.0 - am
        P_incl = _cumprod_incl(om)
        P_excl = _shift_down_one(P_incl)
        done_cum = done_in | (T_in * P_incl < 1e-4)
        cmask = m & ~done_cum
        cut_val = jnp.max(jnp.where(done_cum, P_excl, 0.0), axis=0,
                          keepdims=True)
        P_c = jnp.maximum(P_incl, cut_val)
        ac = jnp.where(cmask, alpha, 0.0)
        T_c = T_in * P_excl
        w = ac * T_c

        gslot = slot + 1
        lastc = jnp.max(jnp.where(cmask, gslot, 0), axis=0, keepdims=True)
        T_out = T_in * P_c[-1:, :]
        if select_init:
            out = jnp.where(first, 0.0, out_ref[0])
            iout = jnp.where(first, 0, iout_ref[0])
        else:
            out = out_ref[0]
            iout = iout_ref[0]

        if track:
            # contributor tracking: blend weight > 0.1, appended in blend
            # order to each pixel's next free slot (XLA-path parity:
            # ops/blend.py:160-173). Position = carried count + exclusive
            # within-visit count; K=10 slots are lossless (sum(w) <= 1).
            gid_col = bt[:, -1:]                     # f32 ids (exact < 2^24)
            big = cmask & (w > 0.1)
            bigf = big.astype(jnp.float32)
            slotk = cnt_s[0:1] + _cumsum_excl(bigf)  # [C, P2] float
            for s in range(TRACK_K):
                sel = big & (slotk == float(s))
                any_sel = jnp.max(sel.astype(jnp.int32), axis=0,
                                  keepdims=True) > 0
                val = jnp.max(jnp.where(sel, gid_col, -1.0), axis=0,
                              keepdims=True)
                wval = jnp.max(jnp.where(sel, w, 0.0), axis=0, keepdims=True)
                tid_ref[0, s:s + 1] = jnp.where(
                    any_sel, val.astype(jnp.int32), tid_ref[0, s:s + 1])
                tw_ref[0, s:s + 1] = jnp.where(any_sel, wval,
                                               tw_ref[0, s:s + 1])
            cnt_s[0:1] = jnp.minimum(
                cnt_s[0:1] + jnp.sum(bigf, axis=0, keepdims=True),
                float(TRACK_K))

        if extras_only:
            acc_ext = jnp.dot(bt[:, _EXT:_EXT + E].T, w,
                              preferred_element_type=jnp.float32)
            out_ref[0, 9:10] = T_out
            out_ref[0, 10:10 + E] = out[10:10 + E] + acc_ext
            iout_ref[0, 0:1] = jnp.maximum(iout[0:1], lastc)
            Tst[0:1] = T_out
            done_s[0:1] = done_cum[-1:, :].astype(jnp.int32)
            return

        if viewer:
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

        acc_sel = jnp.dot(bt[:, _NRM:_NRM + 7 + E].T, w,
                          preferred_element_type=jnp.float32)  # [7+E, P2]
        acc_nrm = acc_sel[0:3]
        acc_col = acc_sel[4:7]
        if not no_dist:
            # expected-depth accumulation: skipped with the distortion
            # machinery (no_dist callers use median-only surf depth,
            # depth_ratio == 1)
            acc_dep = jnp.sum(w * depth_ray, axis=0, keepdims=True)
            d_safe = jnp.where(m, depth_ray, 1.0)
            md = FAR_N / (FAR_N - NEAR_N) * (1.0 - NEAR_N / d_safe)
            mw = md * w
            m2w = md * md * w
            if select_init:
                m1_in = jnp.where(first, 0.0, m1s[0:1])
                m2_in = jnp.where(first, 0.0, m2s[0:1])
            else:
                m1_in = m1s[0:1]
                m2_in = m2s[0:1]
            # totals form of the 2DGS distortion increment (round 4): the
            # reference's per-contribution accumulation (forward.cu:396-410)
            # sums w_i*(md_i^2*A_<i + M2_<i - 2 md_i M1_<i), i.e. the
            # ordered pairwise sum over j<i of w_i w_j (md_i - md_j)^2.
            # Split pairs at the visit boundary: within-visit pairs collapse
            # to Wc*M2c - M1c^2 and cross pairs to M2c*W0 + Wc*M2_0
            # - 2 M1c*M1_0, all from [1,P2] totals — the per-entry exclusive
            # pair scan (a 7-step Hillis-Steele over [C, 2*P2]) and its
            # integrand disappear. W0 = 1 - T_in by the transmittance
            # identity (weights before this visit sum to 1 - T_in). The
            # backward already differentiates this pairwise form
            # (_bwd_kernel_visits uses final totals only).
            W_c = jnp.sum(w, axis=0, keepdims=True)
            M1_c = jnp.sum(mw, axis=0, keepdims=True)
            M2_c = jnp.sum(m2w, axis=0, keepdims=True)
            W_0 = 1.0 - T_in
            acc_dist = (W_c * M2_c - M1_c * M1_c
                        + M2_c * W_0 + W_c * m2_in - 2.0 * M1_c * m1_in)

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
        out_ref[0, 4:7] = out[4:7] + acc_nrm
        out_ref[0, 7:8] = jnp.where(has_cand, med_val, out[7:8])
        out_ref[0, 9:10] = T_out
        if E:
            out_ref[0, 10:10 + E] = out[10:10 + E] + acc_sel[7:7 + E]
        if no_dist:
            # distortion + expected-depth machinery compile-time skipped
            # (lambda_dist == 0, the reference default; depth_ratio == 1):
            # these rows must still be WRITTEN each working visit — FULL
            # mode displaces stale VMEM with absolute stores (see
            # select_init) — but their value is exact zero
            zrow = jnp.zeros_like(T_out)
            out_ref[0, 3:4] = zrow
            out_ref[0, 8:9] = zrow
            out_ref[0, 10 + E:11 + E] = zrow
            out_ref[0, 11 + E:12 + E] = zrow
        else:
            m1_new = m1_in + M1_c
            m2_new = m2_in + M2_c
            out_ref[0, 3:4] = out[3:4] + acc_dep
            out_ref[0, 8:9] = out[8:9] + acc_dist
            out_ref[0, 10 + E:11 + E] = m1_new
            out_ref[0, 11 + E:12 + E] = m2_new
            m1s[0:1] = m1_new
            m2s[0:1] = m2_new

        iout_ref[0, 0:1] = jnp.maximum(iout[0:1], lastc)
        iout_ref[0, 1:2] = jnp.where(has_cand, med_slot, iout[1:2])

        Tst[0:1] = T_out
        done_s[0:1] = done_cum[-1:, :].astype(jnp.int32)


def blend_fwd_pallas_visits(packed, visit_tile, visit_chunk, visit_s0,
                            visit_s1, visit_tstart, num_tiles: int,
                            tile: int, grid_x: int, n_extra: int,
                            interpret: bool = False, chunk: int = CHUNK,
                            extras_only: bool = False,
                            viewer: bool = False, track: bool = False,
                            clip_rect: bool = False, no_dist: bool = False,
                            tiles_per_view: int = 0, done0=None):
    """packed [P, D] slot-major (P = pair_cap, % chunk == 0). With track,
    packed's last column must be the gaussian id (f32) and the return gains
    (contrib_ids [T,K,P2] int32, contrib_w [T,K,P2] f32). tiles_per_view
    (merged virtual-image mode): num_tiles spans several views' grids
    stacked along the tile axis; pixel coords derive from tile % it.
    done0 [num_tiles, 1, P2] int32 (extras_only mode only): 1 pre-latches a
    pixel done (sampled-pixel fast path — see _fwd_kernel_visits)."""
    P, D = packed.shape
    assert P % chunk == 0, P
    assert done0 is None or extras_only, \
        "sampled-done masks serve the extras_only kernel only"
    V = visit_tile.shape[0]
    _check_visit_budget(V, interpret)
    P2 = tile * tile
    OC = 12 + n_extra

    out_specs = [
        pl.BlockSpec((1, OC, P2),
                     lambda i, vt, vc, s0, s1, ts: (vt[i], 0, 0)),
        pl.BlockSpec((1, 2, P2),
                     lambda i, vt, vc, s0, s1, ts: (vt[i], 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((num_tiles, OC, P2), jnp.float32),
                 jax.ShapeDtypeStruct((num_tiles, 2, P2), jnp.int32)]
    scratch = [pltpu.VMEM((1, P2), jnp.float32),
               pltpu.VMEM((1, P2), jnp.float32),
               pltpu.VMEM((1, P2), jnp.float32),
               pltpu.VMEM((1, P2), jnp.int32)]
    if track:
        out_specs += [
            pl.BlockSpec((1, TRACK_K, P2),
                         lambda i, vt, vc, s0, s1, ts: (vt[i], 0, 0)),
            pl.BlockSpec((1, TRACK_K, P2),
                         lambda i, vt, vc, s0, s1, ts: (vt[i], 0, 0))]
        out_shape += [
            jax.ShapeDtypeStruct((num_tiles, TRACK_K, P2), jnp.int32),
            jax.ShapeDtypeStruct((num_tiles, TRACK_K, P2), jnp.float32)]
        scratch += [pltpu.VMEM((1, P2), jnp.float32)]   # contributor count

    in_specs = [pl.BlockSpec((chunk, D),
                             lambda i, vt, vc, s0, s1, ts: (vc[i], 0))]
    inputs = [packed]
    if done0 is not None:
        in_specs.append(pl.BlockSpec(
            (1, 1, P2), lambda i, vt, vc, s0, s1, ts: (vt[i], 0, 0)))
        inputs.append(done0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(V,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    assert not (track and clip_rect), "track packs gid as the last column"
    kernel = functools.partial(_fwd_kernel_visits, tile=tile, grid_x=grid_x,
                               num_tiles=num_tiles, n_extra=n_extra,
                               chunk=chunk, extras_only=extras_only,
                               viewer=viewer, track=track,
                               clip_rect=clip_rect, no_dist=no_dist,
                               tiles_per_view=tiles_per_view,
                               sampled_done=done0 is not None)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=pltpu.InterpretParams() if interpret else False,
    )(visit_tile, visit_chunk, visit_s0, visit_s1, visit_tstart, *inputs)
    if track:
        out, iout, tids, tw = outs
        return PallasBlendFwdOut(out=out, iout=iout), tids, tw
    out, iout = outs
    return PallasBlendFwdOut(out=out, iout=iout)


def _bwd_kernel_visits(vt_ref, vc_ref, vs0_ref, vs1_ref, vts_ref,
                       packed_ref, gout_ref, sv_ref, iout_ref, dout_ref,
                       Tst, Ss, *, tile, grid_x, num_tiles, n_extra,
                       n_visits, chunk=CHUNK, extras_only=False,
                       clip_rect=False, no_dist=False, tiles_per_view=0):
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
        Tst[0:1] = sv_ref[0, 0:1]
        Ss[...] = jnp.zeros_like(Ss)

    # reverse-walk early skip: every slot of this visit lies beyond the
    # tile's deepest contributor -> cmask would be all-false, zero grads and
    # unchanged carries, so skipping is exact
    max_nc = jnp.max(iout_ref[0, 0:1])
    beyond = cv * chunk + s0 - vts_ref[j] >= max_nc
    work = (s1 > s0) & ~beyond

    # the first visit of a chunk block (reverse order) zero-fills the whole
    # block: covers slots owned by other tiles' visits (they RMW their rows
    # later... actually earlier tiles come LATER in reverse) and the sentinel
    # tail rows no visit masks in
    @pl.when(chunk_first & ~work)
    def _zero():
        dout_ref[...] = jnp.zeros_like(dout_ref)

    @pl.when(work)
    def _work():
        ttl = tt % tiles_per_view if tiles_per_view else tt
        ty = (ttl // grid_x).astype(jnp.float32)
        tx = (ttl % grid_x).astype(jnp.float32)
        p = jax.lax.broadcasted_iota(jnp.int32, (1, tile * tile), 1)
        pxf = tx * tile + (p % tile).astype(jnp.float32)
        pyf = ty * tile + (p // tile).astype(jnp.float32)

        bt = packed_ref[...]                     # [C, D]
        C = bt.shape[0]
        g = _splat_terms(bt, pxf, pyf)
        iota = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
        in_rng = (iota >= s0) & (iota < s1)
        slot = cv * chunk + iota - vts_ref[j]
        gslot = slot + 1
        alpha = g["alpha"]
        depth_ray = g["depth_ray"]

        n_contrib = iout_ref[0, 0:1]
        med_slot = iout_ref[0, 1:2]
        T_fin = sv_ref[0, 0:1]
        m1tot = sv_ref[0, 1:2]
        m2tot = sv_ref[0, 2:3]
        a_fin = 1.0 - T_fin

        cmask = g["m"] & in_rng & (gslot <= n_contrib)
        if clip_rect:
            cmask = cmask & ((bt[:, -4:-3] <= tx) & (tx < bt[:, -3:-2])
                             & (bt[:, -2:-1] <= ty) & (ty < bt[:, -1:]))
        ac = jnp.where(cmask, alpha, 0.0)
        oc = 1.0 - ac
        P_in = _cumprod_incl(oc)
        T_exit = Tst[0:1]
        T_entry = T_exit / P_in[-1:, :]
        T_i = T_entry * _shift_down_one(P_in)
        w = ac * T_i

        rowmask = in_rng                          # [C,1] rows this visit owns
        base = jnp.where(chunk_first, jnp.zeros_like(dout_ref[...]),
                         dout_ref[...])

        if extras_only:
            gext = gout_ref[0, 10:10 + E]
            dext = jnp.dot(w, gext.T, preferred_element_type=jnp.float32)
            dout_ref[...] = jnp.where(rowmask, dext, base)
            Tst[0:1] = T_entry
            return

        gcol = gout_ref[0, 0:3]
        gD = gout_ref[0, 3:4]
        gnrm = gout_ref[0, 4:7]
        gmed = gout_ref[0, 7:8]
        gdist = gout_ref[0, 8:9]
        gTfin = gout_ref[0, 9:10]

        gsel = jnp.concatenate(
            [gnrm, jnp.zeros_like(gD), gcol]
            + ([gout_ref[0, 10:10 + E]] if E else []), axis=0)  # [7+E, P2]
        dLdw = jnp.dot(bt[:, _NRM:_NRM + 7 + E], gsel,
                       preferred_element_type=jnp.float32)
        if not no_dist:
            d_safe = jnp.where(cmask, depth_ray, 1.0)
            inv_d = 1.0 / d_safe
            md = FAR_N / (FAR_N - NEAR_N) * (1.0 - NEAR_N * inv_d)
            dLdw = (dLdw + depth_ray * gD
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
        if no_dist:
            dLdd = jnp.where(is_med, gmed, 0.0)
        else:
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

        dsel = jnp.dot(w, gsel.T, preferred_element_type=jnp.float32)
        row_cols = (
            [rsum(pxf * dLdpx), rsum(pxf * dLdpy), rsum(pxf * dLdpz),
             rsum(pyf * dLdpx), rsum(pyf * dLdpy), rsum(pyf * dLdpz),
             rsum(dLdpx), rsum(dLdpy), rsum(dLdpz),
             rsum(dd3 * sx), rsum(dd3 * sy), rsum(dd3 + dd2),
             rsum(dxy_x), rsum(dxy_y),
             dsel[:, 0:3], rsum(dopa), dsel[:, 4:7 + E]])
        if clip_rect:
            # the 4 trailing rect columns are non-differentiable ints
            row_cols.append(jnp.zeros((C, 4), jnp.float32))
        rows = jnp.concatenate(row_cols, axis=1)
        dout_ref[...] = jnp.where(rowmask, rows, base)

        Tst[0:1] = T_entry
        Ss[0:1] = Ss[0:1] + tot


def blend_bwd_pallas_visits(packed, gout, saved, iout, visit_tile,
                            visit_chunk, visit_s0, visit_s1, visit_tstart,
                            num_tiles: int, tile: int, grid_x: int,
                            n_extra: int, interpret: bool = False,
                            extras_only: bool = False,
                            chunk: int = CHUNK,
                            clip_rect: bool = False,
                            no_dist: bool = False,
                            tiles_per_view: int = 0) -> jnp.ndarray:
    """packed [P, D] slot-major; returns d(packed) [P, rows]."""
    P, D = packed.shape
    V = visit_tile.shape[0]
    _check_visit_budget(V, interpret)
    P2 = tile * tile
    OC = 12 + n_extra
    rows = n_extra if extras_only else D

    def tile_of(i, vt):
        return vt[V - 1 - i]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(V,),
        in_specs=[
            pl.BlockSpec((chunk, D),
                         lambda i, vt, vc, s0, s1, ts: (vc[V - 1 - i], 0)),
            pl.BlockSpec((1, OC, P2),
                         lambda i, vt, vc, s0, s1, ts: (tile_of(i, vt), 0, 0)),
            pl.BlockSpec((1, 3, P2),
                         lambda i, vt, vc, s0, s1, ts: (tile_of(i, vt), 0, 0)),
            pl.BlockSpec((1, 2, P2),
                         lambda i, vt, vc, s0, s1, ts: (tile_of(i, vt), 0, 0))],
        out_specs=[pl.BlockSpec((chunk, rows),
                                lambda i, vt, vc, s0, s1, ts:
                                (vc[V - 1 - i], 0))],
        scratch_shapes=[pltpu.VMEM((1, P2), jnp.float32),
                        pltpu.VMEM((1, P2), jnp.float32)],
    )
    kernel = functools.partial(_bwd_kernel_visits, tile=tile, grid_x=grid_x,
                               num_tiles=num_tiles, n_extra=n_extra,
                               n_visits=V, chunk=chunk,
                               extras_only=extras_only, clip_rect=clip_rect,
                               no_dist=no_dist, tiles_per_view=tiles_per_view)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((P, rows), jnp.float32)],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(visit_tile, visit_chunk, visit_s0, visit_s1, visit_tstart,
      packed, gout, saved, iout)[0]


# ---------------------------------------------------------------- custom VJP

def _visits_fwd_impl(flat, bundle, num_tiles, tile, grid_x, n_extra,
                     interpret, chunk=CHUNK, extras_only=False, viewer=False,
                     clip_rect=False, no_dist=False, tiles_per_view=0,
                     done0=None):
    sorted_gid, vc, vt, vs0, vs1, vts = bundle[:6]
    packed = flat[sorted_gid]                 # [P, D] slot-major
    f = blend_fwd_pallas_visits(packed, vt, vc, vs0, vs1, vts, num_tiles,
                                tile, grid_x, n_extra, interpret,
                                chunk=chunk, extras_only=extras_only,
                                viewer=viewer, clip_rect=clip_rect,
                                no_dist=no_dist,
                                tiles_per_view=tiles_per_view, done0=done0)
    return f.out, f.iout, packed


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11, 12))
def blend_visits_diff(flat, binning_bundle, done0, num_tiles, tile, grid_x,
                      n_extra, interpret, extras_only=False, chunk=CHUNK,
                      clip_rect=False, no_dist=False, tiles_per_view=0):
    """Differentiable visit-layout Pallas blend.

    flat [N+1, D] per-gaussian packed attrs (sentinel zero row last);
    binning_bundle = (sorted_gid, visit_chunk, visit_tile, visit_s0,
    visit_s1, visit_tstart[, gid_order, gauss_offsets, gauss_csum]) — index
    data, non-differentiable. done0 (None, or [num_tiles, 1, P2] int32,
    extras_only mode): sampled-pixel fast path — 1 pre-latches a pixel done,
    so only sampled (0) pixels blend; their values and grads are
    bit-identical to done0=None while the whole-visit early termination
    skips most of the kernel (tests/test_sampled_done.py pins this).
    clip_rect: flat carries 4 trailing tile-rect
    columns and contributions are gated by tile ∈ rect (cached-superset
    mode, pack_flat_cols rect=). tiles_per_view: merged virtual-image mode
    (several views' tile grids concatenated; flat stacks the views' packed
    tables, bundle indices carry per-view offsets — see
    pipelines.train_semantic._mv_full_loss_merged). Returns
    (out [T,OC,P2], iout [T,2,P2])."""
    out, iout, _ = _visits_fwd_impl(flat, binning_bundle, num_tiles, tile,
                                    grid_x, n_extra, interpret, chunk,
                                    extras_only, clip_rect=clip_rect,
                                    no_dist=no_dist,
                                    tiles_per_view=tiles_per_view,
                                    done0=done0)
    return out, iout


def blend_visits_viewer(flat, binning_bundle, num_tiles, tile, grid_x,
                        n_extra, interpret, chunk=CHUNK, clip_rect=False):
    """Forward-only viewer blend over the visit layout (color + alpha
    [+ features]); not differentiable."""
    out, iout, _ = _visits_fwd_impl(
        jax.lax.stop_gradient(flat), binning_bundle, num_tiles, tile, grid_x,
        n_extra, interpret, chunk, viewer=True, clip_rect=clip_rect)
    return out, iout


def blend_visits_track(flat, binning_bundle, num_tiles, tile, grid_x,
                       n_extra, interpret, chunk=CHUNK):
    """Forward-only FULL blend + per-pixel w>0.1 contributor tracking
    (Pallas replacement for the XLA fallback the round-2 priors stage paid
    ~1.1 s/view for). Returns (out, iout, contrib_ids [T,K,P2] int32,
    contrib_w [T,K,P2] f32); not differentiable."""
    sorted_gid, vc, vt, vs0, vs1, vts = binning_bundle[:6]
    flat = jax.lax.stop_gradient(flat)
    n1 = flat.shape[0]
    # gaussian id as a trailing f32 column (exact for n < 2^24); the
    # sentinel zero row never passes the alpha gate, so its id is unread
    gid_col = jnp.arange(n1, dtype=jnp.float32)[:, None]
    packed = jnp.concatenate([flat, gid_col], axis=1)[sorted_gid]
    f, tids, tw = blend_fwd_pallas_visits(
        packed, vt, vc, vs0, vs1, vts, num_tiles, tile, grid_x, n_extra,
        interpret, chunk=chunk, track=True)
    return f.out, f.iout, tids, tw


def _blend_visits_diff_fwd(flat, bundle, done0, num_tiles, tile, grid_x,
                           n_extra, interpret, extras_only=False,
                           chunk=CHUNK, clip_rect=False, no_dist=False,
                           tiles_per_view=0):
    out, iout, packed = _visits_fwd_impl(flat, bundle, num_tiles, tile,
                                         grid_x, n_extra, interpret, chunk,
                                         extras_only, clip_rect=clip_rect,
                                         no_dist=no_dist,
                                         tiles_per_view=tiles_per_view,
                                         done0=done0)
    E = n_extra
    saved = jnp.concatenate([out[:, 9:10], out[:, 10 + E:12 + E]], axis=1)
    return (out, iout), (packed, bundle, saved, iout, flat.shape[0])


def _blend_visits_diff_bwd(num_tiles, tile, grid_x, n_extra, interpret,
                           extras_only, chunk, clip_rect, no_dist,
                           tiles_per_view, res, cts):
    packed, bundle, saved, iout, n1 = res
    gout, _ = cts
    sorted_gid, vc, vt, vs0, vs1, vts = bundle[:6]
    gid_order = bundle[6] if len(bundle) > 6 and bundle[6] is not None \
        else None
    d_sorted = blend_bwd_pallas_visits(packed, gout, saved, iout, vt, vc,
                                       vs0, vs1, vts, num_tiles, tile,
                                       grid_x, n_extra, interpret,
                                       extras_only=extras_only, chunk=chunk,
                                       clip_rect=clip_rect, no_dist=no_dist,
                                       tiles_per_view=tiles_per_view)
    cols = d_sorted.shape[1]
    if gid_order is not None:
        # cached-binning path: gather+cumsum+segment-diff chain (indices
        # built once per camera at cache time) — same scheme as the aligned
        # path but over pair_cap rows instead of the inflated capacity
        gauss_offsets, gauss_csum = bundle[7], bundle[8]
        d_g = d_sorted[gid_order]
        c = jnp.concatenate([jnp.zeros((1, cols), d_sorted.dtype),
                             jnp.cumsum(d_g, axis=0)], axis=0)
        d_flat = c[gauss_csum] - c[gauss_offsets]
    else:
        # fresh-binning path: one deterministic scatter-add keyed by the
        # sorted gid list (sentinel slots hit the zero row). The 18-column
        # scatter cliff (see blend_pallas._blend_aligned_diff_bwd) applies.
        pad = max(0, 18 - cols)
        if pad:
            d_sorted = jnp.concatenate(
                [d_sorted, jnp.zeros((d_sorted.shape[0], pad),
                                     d_sorted.dtype)], axis=1)
        d_flat = jnp.zeros((n1, cols + pad), d_sorted.dtype
                           ).at[sorted_gid].add(d_sorted)[:, :cols]
    if extras_only:
        d_flat = jnp.concatenate(
            [jnp.zeros((n1, _EXT), d_flat.dtype), d_flat], axis=1)
    if extras_only and clip_rect:
        # match flat's 4 trailing (non-differentiable) rect columns; the
        # full-mode kernel already emits their zero columns
        d_flat = jnp.concatenate([d_flat, jnp.zeros((n1, 4), d_flat.dtype)],
                                 axis=1)
    # done0's masked pixels carry zero cotangents structurally (their
    # n_contrib is 0, so the reverse walk's cmask never fires for them) —
    # the backward kernel needs no mask input
    return d_flat, None, None


blend_visits_diff.defvjp(_blend_visits_diff_fwd, _blend_visits_diff_bwd)
