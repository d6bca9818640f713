"""Public differentiable splatting op: preprocess → bin → blend.

The jit-facing equivalent of the reference's GaussianRasterizer
(diff_surfel_rasterization/__init__.py:179-248). No custom autograd glue is
needed: preprocess and blend are differentiable jnp (with exact reference
clamp/skip semantics), and binning is index-only (stop_gradient). The
"densification gradient hack" of the reference (backward.cu:652-655: the
viewspace mean2D grad is overwritten with dL/dT[0,2], dL/dT[1,2] scaled to NDC)
is reproduced with a zero-valued `t_offset` input added to T after the AABB is
computed — jax.grad w.r.t. t_offset yields exactly the blend's dL/dT, which
densify_stats() then scales the same way.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .binning import bin_gaussians
from .blend import BlendOut, blend_tiles
from .preprocess import preprocess_gaussians


class CameraMats(NamedTuple):
    """Static-shape camera bundle for the jitted render path."""
    w2v: jnp.ndarray        # [4,4]
    full_proj: jnp.ndarray  # [4,4]
    campos: jnp.ndarray     # [3]


@dataclass(frozen=True)
class RasterizeConfig:
    width: int
    height: int
    tile: int = 16
    chunk: int = 32
    pair_cap: int = 0        # 0 → auto: max(64*1024, 4*N)
    tile_cap: int = 0        # 0 → auto: min(pair_cap, 4096)
    track_contrib: bool = False
    impl: str = "auto"       # 'auto' | 'xla' | 'pallas'
    # feature-lifting fast path: the forward produces only the feature sums,
    # final transmittance and contributor counts (color/depth/normal/median/
    # distortion outputs are ZERO), and the backward computes only the extra-
    # channel gradients (geometry grads silently come back zero). Used by
    # semantic training, whose loss reads only the feature channels.
    bwd_extras_only: bool = False
    # pairs per Pallas grid step (and aligned-layout segment alignment).
    # Bigger chunks amortize grid-step overhead at the cost of more per-tile
    # padding and VMEM; must be a multiple of 128.
    pallas_chunk: int = 128
    # interactive-viewer fast path (pallas impl only): forward-only, emits
    # color + alpha [+ feature] maps; depth/normal/median/distortion outputs
    # are ZERO and gradients do not flow. ~40% less kernel work per frame.
    fwd_viewer: bool = False
    # cached-superset mode: pack the FRESH per-gaussian tile rect into the
    # attribute rows and gate contributions by tile ∈ rect in-kernel, so a
    # cached SUPERSET pair list (e.g. a tile-dilated bundle built at a
    # nearby camera) reproduces fresh binning's rect clipping exactly
    # (test_coherent.py pins this). Pallas visit kernels only. The
    # frame-coherent GUI cache built on it was FOLDED in round 4 — the
    # arithmetic cannot win (docs/PERFORMANCE.md round 4); the kernel mode
    # stays for cached-superset callers.
    clip_rect: bool = False
    # compile-time skip of the distortion + expected-depth machinery (the
    # per-visit m1/m2 pair scan in the forward, the md/dist/depth grad
    # chains in the backward) for callers whose loss reads neither rend_dist
    # nor the expected depth — lambda_dist == 0 and depth_ratio == 1 are the
    # reference defaults, so default geometry training pays this every step
    # otherwise. The skipped output rows come back exact zeros. Implemented
    # for the Pallas visit kernels only: the flag is ignored on the XLA
    # path (the CPU/test backend, where the traced lambda_dist scalar keeps
    # the chains live but throughput is not the goal).
    no_depth_dist: bool = False
    # opacity-aware tile culling (ops/preprocess.py docstring): bin only the
    # tiles where alpha >= 1/255 is reachable. Bit-identical output and
    # gradients (the kernels mask alpha < 1/255 exactly as forward.cu:386 /
    # backward.cu:324); strictly fewer pairs for opacity < ~0.353 — large
    # wins early in geometry training (init 0.1) and after opacity resets
    # (0.01). radii/visibility keep opacity-blind reference semantics.
    opacity_cull: bool = True
    # exact conic-vs-tile pair culling (preprocess.conic_cull_masks): drop
    # every (gaussian, tile) pair whose tile cannot reach alpha >= 1/255
    # anywhere — output-preserving for the same reason as opacity_cull
    # (test_conic_cull_exact). Default OFF: it cuts only 9-11% of pairs at
    # both bench profiles while the per-row interval decode adds ~5 ms to
    # binning and the rank→offset bit-rank decode rides every pair chain,
    # a measured net loss at 976x728 (12.4→11.7 it/s) AND 1080p (19.4→18.0
    # fps uniform, 20.4→19.0 trained) once the gather-size cliff is
    # controlled (bench_probes/probe_geo4.py, probe_fps3.py; docs/
    # PERFORMANCE.md round 4). Opt in for scenes whose splats span many
    # tiles with long dead corners. Requires opacity_cull (needs opacity).
    conic_cull: bool = False
    # when False, resolved() pins pair_cap exactly (no fast-gather snap) —
    # used by step-level cap autotuners that must compare EXACT candidate
    # caps (pipelines/train.pick_step_cap); product paths leave it True
    tune_gather: bool = True
    # packed-table feature-column count (E) the frame will gather. The
    # gather's fast/slow mode is keyed on (rows, COLUMNS, table rows) — the
    # round-4 tune always probed dim=21 (the geometry table), mistuning the
    # semantic paths whose table is 21+16 wide. Callers that splat extras
    # set this so resolved() probes the TRUE table shape.
    extras_dim: int = 0

    def packed_dim(self) -> int:
        """Column count of the packed attribute table the pack gather moves
        (blend_pallas.pack_flat_cols): 21 base + E extras + 4 rect columns
        in clip_rect mode + 1 gid column in contributor-tracking mode."""
        return (21 + self.extras_dim + (4 if self.clip_rect else 0)
                + (1 if self.track_contrib else 0))

    def resolved(self, n: int) -> "RasterizeConfig":
        # auto caps are deliberately tight — the sort is O(pair_cap); callers
        # (trainers) grow caps when n_dropped > 0
        import dataclasses

        import jax
        pair_cap = self.pair_cap or max(64 * 1024, 4 * n)
        tile_cap = self.tile_cap or min(pair_cap, 4096)
        impl = self.impl
        if impl == "auto":
            # track_contrib no longer forces the XLA path: the visit kernel
            # has a native contributor-tracking mode (round 3)
            impl = ("pallas" if jax.default_backend() not in ("cpu",)
                    else "xla")
        chunk = self.chunk
        if impl == "pallas":
            chunk = self.pallas_chunk
            # the visit layout indexes sorted pairs by whole chunks
            pair_cap = ((pair_cap + chunk - 1) // chunk) * chunk
            # snap to a measured fast-gather size: XLA's row gather is
            # bimodal (2-8x!) in the row count with no usable size rule —
            # see ops/gather_tune.py. Growing a cap is always safe.
            if self.tune_gather:
                from .gather_tune import fast_gather_cap
                pair_cap = fast_gather_cap(pair_cap, dim=self.packed_dim(),
                                           src_rows=n + 1, chunk=chunk)
        tile_cap = ((tile_cap + chunk - 1) // chunk) * chunk
        return dataclasses.replace(self, chunk=chunk, pair_cap=pair_cap,
                                   tile_cap=tile_cap, impl=impl)


def _blend_via_pallas(pre, T_used, opacities, extras, binning, bg,
                      width, height, cfg, visits_bundle=None, done0=None):
    """Differentiable Pallas blend → BlendOut, over the compact-sorted visit
    layout (full-frame default, round-3 redesign) or the aligned-flat layout
    (tile-subset / cached-aligned bundles). Tracker unsupported here —
    track_contrib forces the XLA path."""
    from .blend import BlendOut as _BlendOut
    from .blend_pallas import (blend_aligned_diff, blend_aligned_viewer,
                               pack_flat_cols)
    from .blend_visits import blend_visits_diff, blend_visits_viewer
    from .rasterize_pallas import maps_from_pallas

    E = extras.shape[1] if extras is not None else 0
    grid_x = (width + cfg.tile - 1) // cfg.tile
    grid_y = (height + cfg.tile - 1) // cfg.tile
    num_tiles = grid_x * grid_y
    rect = None
    if cfg.clip_rect:
        # cached-superset mode: gate pairs by the FRESH rect in-kernel; a
        # gaussian producing no pairs this frame gets an empty rect so its
        # stale cached pairs contribute exactly zero
        has_pairs = pre.tiles_touched > 0
        rect = (pre.rect_min,
                jnp.where(has_pairs[:, None], pre.rect_max, pre.rect_min))
    flat = pack_flat_cols(T_used, pre.xy, pre.normal_view, opacities,
                          pre.color, extras, rect=rect)
    interp = jax.default_backend() == "cpu"  # tests exercise interpret mode
    if visits_bundle is None and binning.visits is not None:
        v = binning.visits
        visits_bundle = (binning.sorted_gid, v.visit_chunk, v.visit_tile,
                         v.visit_s0, v.visit_s1, v.visit_tstart)
    if cfg.clip_rect:
        assert visits_bundle is not None and not cfg.track_contrib, \
            "clip_rect serves cached visit bundles (non-track) only"
    if visits_bundle is not None:
        if cfg.track_contrib:
            from .blend_visits import blend_visits_track
            from .rasterize_pallas import pallas_tiles_to_map
            out, iout, tids, tw = blend_visits_track(
                flat, tuple(visits_bundle), num_tiles, cfg.tile, grid_x, E,
                interp, cfg.pallas_chunk)
            maps = maps_from_pallas(out, iout, width, height, cfg.tile, E)
            color = maps["color_nobg"] + maps["final_T"][..., None] * bg
            return _BlendOut(
                color=color, depth=maps["depth"],
                alpha=1.0 - maps["final_T"], normal=maps["normal"],
                median_depth=maps["median_depth"],
                distortion=maps["distortion"], extra=maps["extra"],
                final_T=maps["final_T"], n_contrib=maps["n_contrib"],
                contrib_ids=pallas_tiles_to_map(tids, width, height,
                                                cfg.tile),
                contrib_w=pallas_tiles_to_map(tw, width, height, cfg.tile),
                extra_tiles=out[:, 10:10 + E, :])
        if cfg.fwd_viewer:
            out, iout = blend_visits_viewer(flat, tuple(visits_bundle),
                                            num_tiles, cfg.tile, grid_x, E,
                                            interp, cfg.pallas_chunk,
                                            clip_rect=cfg.clip_rect)
        else:
            assert done0 is None or cfg.bwd_extras_only, \
                "sampled-done masks require the extras-only mode"
            out, iout = blend_visits_diff(flat, tuple(visits_bundle), done0,
                                          num_tiles, cfg.tile, grid_x, E,
                                          interp, cfg.bwd_extras_only,
                                          cfg.pallas_chunk,
                                          clip_rect=cfg.clip_rect,
                                          no_dist=cfg.no_depth_dist)
    elif cfg.fwd_viewer:
        out, iout = blend_aligned_viewer(flat, tuple(binning.aligned),
                                         num_tiles, cfg.tile, grid_x, E,
                                         interp, cfg.pallas_chunk)
    else:
        out, iout = blend_aligned_diff(flat, tuple(binning.aligned),
                                       num_tiles, cfg.tile, grid_x, E, interp,
                                       cfg.bwd_extras_only, cfg.pallas_chunk)
    maps = maps_from_pallas(out, iout, width, height, cfg.tile, E)
    color = maps["color_nobg"] + maps["final_T"][..., None] * bg
    return _BlendOut(color=color, depth=maps["depth"],
                     alpha=1.0 - maps["final_T"], normal=maps["normal"],
                     median_depth=maps["median_depth"],
                     distortion=maps["distortion"], extra=maps["extra"],
                     final_T=maps["final_T"], n_contrib=maps["n_contrib"],
                     contrib_ids=None, contrib_w=None,
                     extra_tiles=out[:, 10:10 + E, :])


class RasterizeOut(NamedTuple):
    blend: BlendOut
    radii: jnp.ndarray        # [N] int32 screen radius (0 → culled)
    visible: jnp.ndarray      # [N] bool
    depth: jnp.ndarray        # [N] per-gaussian view z
    n_dropped: jnp.ndarray    # [] int32 binning overflow diagnostic
    T: jnp.ndarray            # [N,3,3] splat→pixel transforms (pre-offset)
    total_pairs: jnp.ndarray  # [] int32 true (gaussian, tile) pair count


@partial(jax.jit, static_argnames=("width", "height", "sh_degree", "cfg",
                                   "full_height"))
def _rasterize_impl(means3d, scales, rotations, opacities, w2v, full_proj,
                    campos, bg, colors, shs, extras, t_offset, alive,
                    cached_binning, width, height, sh_degree,
                    cfg: RasterizeConfig, y_offset=None, full_height=None,
                    done0=None):
    pre = preprocess_gaussians(
        means3d, scales, rotations, w2v, full_proj, campos, width, height,
        color=colors, shs=shs, sh_degree=sh_degree, tile=cfg.tile, alive=alive,
        y_offset=y_offset, full_height=full_height,
        opacity=opacities if cfg.opacity_cull else None,
        conic_cull=cfg.conic_cull and cached_binning is None)
    if cached_binning is not None:
        # frozen-geometry fast path (semantic training): the per-camera tile
        # lists are constant, so the expand+sort is skipped entirely.
        # XLA layout caches (tile_indices, tile_count); pallas caches the
        # 6-array aligned bundle.
        from .binning import AlignedLayout, BinningOut, VisitLayout
        if len(cached_binning) == 2:
            tile_indices, tile_count = cached_binning
            binning = BinningOut(tile_indices=tile_indices,
                                 tile_count=tile_count,
                                 tile_start=None, sorted_gid=None,
                                 total_pairs=jnp.int32(0),
                                 n_dropped=jnp.int32(0), aligned=None)
        elif len(cached_binning) in (6, 9, 10):
            # visit-layout cache: (sorted_gid, vchunk, vtile, vs0, vs1,
            # vtstart[, gid_order, gauss_offsets, gauss_csum])
            binning = BinningOut(tile_indices=None, tile_count=None,
                                 tile_start=None,
                                 sorted_gid=cached_binning[0],
                                 total_pairs=jnp.int32(0),
                                 n_dropped=jnp.int32(0), aligned=None,
                                 visits=VisitLayout(*cached_binning[1:6]))
        else:
            binning = BinningOut(tile_indices=None, tile_count=None,
                                 tile_start=None, sorted_gid=None,
                                 total_pairs=jnp.int32(0),
                                 n_dropped=jnp.int32(0),
                                 aligned=AlignedLayout(*cached_binning))
    else:
        layout = "visits" if cfg.impl == "pallas" else "padded"
        binning = bin_gaussians(pre, width, height, cfg.pair_cap,
                                cfg.tile_cap, tile=cfg.tile, layout=layout,
                                align=cfg.pallas_chunk)

    n = means3d.shape[0]
    T_used = pre.T if t_offset is None else pre.T + t_offset
    if cfg.impl == "pallas":
        vb = (cached_binning if cached_binning is not None
              and len(cached_binning) in (6, 9, 10) else None)
        out = _blend_via_pallas(pre, T_used, opacities, extras, binning, bg,
                                width, height, cfg, visits_bundle=vb,
                                done0=done0)
        return RasterizeOut(blend=out,
                            radii=pre.radius.astype(jnp.int32),
                            visible=pre.valid & (pre.radius > 0),
                            depth=pre.depth,
                            n_dropped=binning.n_dropped,
                            T=pre.T, total_pairs=binning.total_pairs)
    packT = jnp.concatenate([T_used.reshape(n, 9),
                             jnp.zeros((1, 9), T_used.dtype)], axis=0)
    pad1 = lambda a: jnp.concatenate(
        [a, jnp.zeros((1,) + a.shape[1:], a.dtype)], axis=0)
    extra_p = pad1(extras) if extras is not None else None

    out = blend_tiles(binning.tile_indices, packT, pad1(pre.xy),
                      pad1(pre.normal_view),
                      pad1(jnp.reshape(opacities, (n,))),
                      pad1(pre.color), extra_p, bg,
                      width, height, tile=cfg.tile, chunk=cfg.chunk,
                      track_contrib=cfg.track_contrib)
    return RasterizeOut(blend=out,
                        radii=pre.radius.astype(jnp.int32),
                        visible=pre.valid & (pre.radius > 0),
                        depth=pre.depth,
                        n_dropped=binning.n_dropped,
                        T=pre.T, total_pairs=binning.total_pairs)


def rasterize(means3d: jnp.ndarray, scales: jnp.ndarray, rotations: jnp.ndarray,
              opacities: jnp.ndarray, cam: CameraMats, bg: jnp.ndarray,
              cfg: RasterizeConfig,
              colors: Optional[jnp.ndarray] = None,
              shs: Optional[jnp.ndarray] = None, sh_degree: int = 0,
              extras: Optional[jnp.ndarray] = None,
              t_offset: Optional[jnp.ndarray] = None,
              alive: Optional[jnp.ndarray] = None,
              cached_binning=None, y_offset=None,
              full_height: Optional[int] = None,
              done0: Optional[jnp.ndarray] = None) -> RasterizeOut:
    """Rasterize 2D Gaussian surfels.

    means3d [N,3]; scales [N,2] (activated); rotations [N,4] (w,x,y,z);
    opacities [N] or [N,1] (activated); exactly one of colors [N,3] / shs
    [N,K,3]; extras [N,E] optional feature channels; t_offset [N,3,3] optional
    zero tensor for densification gradients. y_offset/full_height (slab
    rendering): render pixel rows [y_offset, y_offset+cfg.height) of a
    full_height-tall image — the basis of image-space sharded rendering.
    done0 [num_tiles, 1, tile*tile] int32 (pallas visit path with
    bwd_extras_only only): sampled-pixel fast path — 1 pre-latches a pixel
    done; sampled (0) pixels' extras and grads are bit-identical to
    done0=None while unsampled outputs come back zero (must not be
    consumed). See blend_visits.blend_visits_diff."""
    if extras is not None and cfg.extras_dim != int(extras.shape[1]):
        # single chokepoint for the true packed-table width: the fast-gather
        # cap snap in resolved() must probe 21 + E columns, not 21
        from dataclasses import replace
        cfg = replace(cfg, extras_dim=int(extras.shape[1]))
    cfg = cfg.resolved(means3d.shape[0])
    if (cached_binning is None and y_offset is None and full_height is None
            and done0 is None):
        plan = _slab_plan(cfg)
        if plan is not None:
            return _rasterize_slabs(means3d, scales, rotations, opacities,
                                    cam, bg, colors, shs, extras, t_offset,
                                    alive, sh_degree, cfg, plan)
    return _rasterize_impl(means3d, scales, rotations, opacities,
                           cam.w2v, cam.full_proj, cam.campos, bg,
                           colors, shs, extras, t_offset, alive,
                           cached_binning, cfg.width, cfg.height, sh_degree,
                           cfg, y_offset, full_height, done0)


def _slab_plan(cfg: RasterizeConfig):
    """Graceful scale degradation: when a single full-frame launch's visit
    arrays would blow the kernel's SMEM scalar-prefetch budget (a 4K frame
    at bench-scale pair caps does — blend_visits.VISIT_SMEM_BUDGET_BYTES),
    split the frame into the fewest horizontal tile slabs whose per-slab
    visit counts fit, each with a proportional (1.5x-margin) pair cap.
    Returns None (no split needed) or [(y0_px, slab_h_px, slab_pair_cap)].
    The CUDA reference sizes its buffers dynamically and renders any
    resolution (rasterize_points.cu:39-100); XLA needs static shapes, so
    scale is bought with sequential slabs instead — same machinery as the
    multi-chip image-space sharding (parallel/render_sharded.py), one chip.
    Applied uniformly on every backend so the product path is testable on
    CPU."""
    if cfg.impl != "pallas":
        return None
    from .blend_visits import VISIT_SMEM_BUDGET_BYTES
    chunk = cfg.pallas_chunk
    grid_x = (cfg.width + cfg.tile - 1) // cfg.tile
    grid_y = (cfg.height + cfg.tile - 1) // cfg.tile
    fits = lambda cap, rows: (5 * 4 * (cap // chunk + grid_x * rows)
                              <= VISIT_SMEM_BUDGET_BYTES)
    if fits(cfg.pair_cap, grid_y):
        return None
    for n_slabs in range(2, grid_y + 1):
        rows = -(-grid_y // n_slabs)
        cap = int(cfg.pair_cap * rows / grid_y * 1.5)
        cap = max(chunk, -(-cap // chunk) * chunk)
        if fits(cap, rows):
            break
    else:
        raise ValueError(
            f"cannot slab-split {cfg.width}x{cfg.height} under the visit "
            f"SMEM budget even at one tile row per slab")
    plan = []
    y0 = 0
    while y0 < cfg.height:
        h = min(rows * cfg.tile, cfg.height - y0)
        plan.append((y0, h, cap))
        y0 += h
    return plan


def _rasterize_slabs(means3d, scales, rotations, opacities, cam: CameraMats,
                     bg, colors, shs, extras, t_offset, alive, sh_degree,
                     cfg: RasterizeConfig, plan) -> RasterizeOut:
    """Sequential tile-slab rendering (see _slab_plan). Per-pixel maps
    concatenate along image rows; extra_tiles concatenates along the tile
    axis (slabs are whole tile rows in order, so local-tile concatenation
    IS the global row-major tile order); per-gaussian quantities merge as
    max/OR (a slab call clamps rects to its own rows)."""
    from dataclasses import replace

    from .blend import BlendOut as _BlendOut
    outs = []
    for y0, h, cap in plan:
        scfg = replace(cfg, height=h, pair_cap=cap)
        outs.append(_rasterize_impl(
            means3d, scales, rotations, opacities,
            cam.w2v, cam.full_proj, cam.campos, bg, colors, shs, extras,
            t_offset, alive, None, cfg.width, h, sh_degree, scfg,
            jnp.float32(y0), cfg.height))
    cat = lambda get: jnp.concatenate([get(o.blend) for o in outs], axis=0)
    b0 = outs[0].blend
    blend = _BlendOut(
        color=cat(lambda b: b.color), depth=cat(lambda b: b.depth),
        alpha=cat(lambda b: b.alpha), normal=cat(lambda b: b.normal),
        median_depth=cat(lambda b: b.median_depth),
        distortion=cat(lambda b: b.distortion),
        extra=cat(lambda b: b.extra), final_T=cat(lambda b: b.final_T),
        n_contrib=cat(lambda b: b.n_contrib),
        contrib_ids=(cat(lambda b: b.contrib_ids)
                     if b0.contrib_ids is not None else None),
        contrib_w=(cat(lambda b: b.contrib_w)
                   if b0.contrib_w is not None else None),
        extra_tiles=(cat(lambda b: b.extra_tiles)
                     if b0.extra_tiles is not None else None))
    radii = outs[0].radii
    visible = outs[0].visible
    n_dropped = outs[0].n_dropped
    total = outs[0].total_pairs
    for o in outs[1:]:
        radii = jnp.maximum(radii, o.radii)
        visible = visible | o.visible
        n_dropped = n_dropped + o.n_dropped
        total = total + o.total_pairs
    return RasterizeOut(blend=blend, radii=radii, visible=visible,
                        depth=outs[0].depth, n_dropped=n_dropped,
                        T=outs[0].T, total_pairs=total)


def rasterize_extras_tiles(means3d, scales, rotations, opacities,
                           cam: CameraMats, cfg: RasterizeConfig, extras,
                           mini_bundle, sel_tiles, alive=None):
    """Sparse feature render over a tile subset: blend only `mini_bundle`'s
    chunks (see binning.select_tiles_bundle) with the extras-only kernels and
    gather the selected tiles' feature rows straight from the tile-major
    kernel output — no full-image map reconstruction. Returns [K, P2, E]
    (row-major pixels within each 16x16 tile). Differentiable w.r.t.
    `extras`; powers the tile-subsampled multi-view contrastive loss."""
    from .blend_pallas import blend_aligned_diff, pack_flat_cols

    cfg = cfg.resolved(means3d.shape[0])
    grid_x = (cfg.width + cfg.tile - 1) // cfg.tile
    grid_y = (cfg.height + cfg.tile - 1) // cfg.tile
    num_tiles = grid_x * grid_y
    pre = preprocess_gaussians(
        means3d, scales, rotations, cam.w2v, cam.full_proj, cam.campos,
        cfg.width, cfg.height, color=means3d[:, :3] * 0.0, tile=cfg.tile,
        alive=alive)
    E = extras.shape[1]
    flat = pack_flat_cols(pre.T, pre.xy, pre.normal_view, opacities,
                          pre.color, extras)
    interp = jax.default_backend() == "cpu"
    out, _ = blend_aligned_diff(flat, tuple(mini_bundle), num_tiles,
                                cfg.tile, grid_x, E, interp,
                                True,  # extras_only
                                cfg.pallas_chunk)
    ext = out[sel_tiles][:, 10:10 + E, :]            # [K, E, P2]
    return jnp.transpose(ext, (0, 2, 1))             # [K, P2, E]


def densify_screen_grad(t_grad: jnp.ndarray, depth: jnp.ndarray,
                        width: int, height: int) -> jnp.ndarray:
    """Convert dL/dT into the reference's NDC-space viewspace grad used for
    densification stats (backward.cu:652-655): grad_x = dL/dT[0,2]·z·W/2,
    grad_y = dL/dT[1,2]·z·H/2. Returns [N,2]."""
    gx = t_grad[:, 0, 2] * depth * 0.5 * width
    gy = t_grad[:, 1, 2] * depth * 0.5 * height
    return jnp.stack([gx, gy], axis=-1)


class VisitBinningCache(NamedTuple):
    """Typed frozen-geometry binning cache, visit layout (one camera).

    A NamedTuple, so it still satisfies the length-10 `cached_binning`
    tuple protocol of _rasterize_impl while giving callers named fields
    (the semantic trainer's MV tile-subsample path reads sorted_gid +
    tile_bounds by name instead of positional arity checks)."""
    sorted_gid: jnp.ndarray     # [pair_cap] gaussian id per sorted slot
    visit_chunk: jnp.ndarray    # [V] chunk index per (chunk, tile) visit
    visit_tile: jnp.ndarray     # [V] tile index per visit
    visit_s0: jnp.ndarray       # [V] slot range start within the chunk
    visit_s1: jnp.ndarray       # [V] slot range end
    visit_tstart: jnp.ndarray   # [V] first-visit-of-tile flags/starts
    gid_order: jnp.ndarray      # [pair_cap] chain-reduce permutation
    gauss_offsets: jnp.ndarray  # [N+1] per-gaussian segment starts
    gauss_csum: jnp.ndarray     # [N+1] per-gaussian segment ends
    tile_bounds: jnp.ndarray    # [num_tiles+1] pair-space tile ranges


@partial(jax.jit, static_argnames=("width", "height", "tile", "pair_cap",
                                   "tile_cap", "layout", "align",
                                   "dilate_tiles", "conic_cull"))
def _binning_cache_impl(xyz, scales, rotations, alive, w2v, full_proj, campos,
                        width, height, tile, pair_cap, tile_cap, layout,
                        align=128, dilate_tiles=0, opacity=None,
                        conic_cull=False):
    pre = preprocess_gaussians(xyz, scales, rotations, w2v, full_proj, campos,
                               width, height, color=xyz * 0.0, tile=tile,
                               alive=alive, opacity=opacity,
                               conic_cull=conic_cull and not dilate_tiles)
    b = bin_gaussians(pre, width, height, pair_cap, tile_cap, tile=tile,
                      layout=layout, align=align, dilate_tiles=dilate_tiles)
    if layout == "visits":
        # visit-layout cache (compact-sorted; the pallas default): index data
        # + chain-reduction indices (the cached-binning backward's gather +
        # cumsum + segment-diff reduction, ~1.6x a scatter-add) + the
        # pair-space tile range table (tile-subset mini bundles source their
        # contiguous per-tile runs from it — select_tiles_bundle)
        from .binning import chain_reduce_indices
        chain = chain_reduce_indices(b.sorted_gid, xyz.shape[0])
        v = b.visits
        tile_bounds = jnp.concatenate(
            [b.tile_start, jnp.minimum(b.total_pairs, pair_cap)[None]]
        ).astype(jnp.int32)
        return (VisitBinningCache(
            b.sorted_gid, v.visit_chunk, v.visit_tile, v.visit_s0,
            v.visit_s1, v.visit_tstart, *chain, tile_bounds),
            b.tile_count, b.n_dropped)
    if layout == "aligned":
        from .binning import chain_reduce_indices
        chain = chain_reduce_indices(b.aligned.aligned_gid, xyz.shape[0])
        return (tuple(b.aligned)[:3] + chain
                + (b.aligned.tile_chunk_start,)), b.tile_count, b.n_dropped
    return ((b.tile_indices, b.tile_count.astype(jnp.int32)),
            b.tile_count, b.n_dropped)


def compute_binning_cache(params, cam: CameraMats, width: int, height: int,
                          tile: int = 16, pair_cap: int = 0,
                          tile_cap: int = 0, impl: str = "auto",
                          pallas_chunk: int = 128, dilate_tiles: int = 0,
                          opacity_cull: bool = True,
                          conic_cull: bool = False, extras_dim: int = 0,
                          tune_gather: bool = True):
    """Precompute the frozen-geometry binning for one camera. Returns
    (cache_tuple, tile_count, n_dropped); pass cache_tuple as
    rasterize(..., cached_binning=...). dilate_tiles expands every rect,
    building a SUPERSET bundle a nearby camera can render exactly through
    cfg.clip_rect (see RasterizeConfig).
    opacity_cull must match the consuming RasterizeConfig so cached and
    fresh pair lists agree slot-for-slot (either way is output-exact — the
    kernels re-mask — but n_contrib slot numbering follows the list).
    extras_dim: feature-column count the consuming step will gather — the
    cache's pair_cap is what sizes that gather, so the fast-cap snap must
    probe the true table width (RasterizeConfig.packed_dim)."""
    n = params.capacity
    cfg = RasterizeConfig(width=width, height=height, tile=tile,
                          pair_cap=pair_cap, tile_cap=tile_cap,
                          impl=impl, pallas_chunk=pallas_chunk,
                          extras_dim=extras_dim,
                          tune_gather=tune_gather).resolved(n)
    layout = "visits" if cfg.impl == "pallas" else "padded"
    return _binning_cache_impl(
        params.xyz, params.scaling_activated(), params.rotation_normalized(),
        params.alive, cam.w2v, cam.full_proj, cam.campos,
        cfg.width, cfg.height, cfg.tile, cfg.pair_cap, cfg.tile_cap, layout,
        align=cfg.pallas_chunk, dilate_tiles=dilate_tiles,
        opacity=params.opacity_activated() if opacity_cull else None,
        conic_cull=conic_cull and opacity_cull)
