"""Semantic feature-lifting pipeline — train_semantic.py parity
(reference train_semantic.py:17-237).

Stage 1 (RobustSemanticPriors): forward-render every training view with the
deterministic contributor tracker, run the spatial-track mask clustering on
host, write output_dict.npy + mask_sorted/ + mask_filtered/, init per-gaussian
features (optionally gram-schmidt anchors).

Stage 2 (train_segfeat): 10k iterations of jit-compiled contrastive training on
the 16-dim feature channel with frozen geometry — single-view ProtoNCE on two
segmap types, multi-view ProtoNCE over 5 consecutive views every 10th iter,
3D ProtoNCE over visible gaussians.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..models import gaussians as gmod
from ..models.optimizer import adam_step, init_adam_state, semantic_lrs
from ..ops.rasterize import CameraMats, RasterizeConfig, rasterize
from ..semantic.contrastive import (contrastive_loss,
                                    sample_from_ids, sample_valid_pixels)
from ..semantic.spatial_track import ClusteringArgs, GausCluster
from .train import CameraTensors, camera_tensors


def render_features(params: gmod.GaussianParams, cam: CameraMats, bg,
                    cfg: RasterizeConfig, seg_feature: Optional[jnp.ndarray]
                    = None, cached_binning=None, done0=None):
    """Render with the (possibly externally-supplied, for grad) seg feature.
    `cached_binning=(tile_indices, tile_count)` skips the expand+sort — valid
    because geometry is frozen during semantic training. done0 (pallas visit
    caches only): sampled-pixel done mask — see ops.rasterize.rasterize."""
    feat = seg_feature if seg_feature is not None else params.seg_feature
    if feat is not None:
        feat = feat / (jnp.linalg.norm(feat, axis=1, keepdims=True) + 1e-6)
    return rasterize(params.xyz, params.scaling_activated(),
                     params.rotation_normalized(),
                     params.opacity_activated()[:, 0], cam, bg, cfg,
                     shs=params.features(),
                     sh_degree=params.active_sh_degree, extras=feat,
                     alive=params.alive, cached_binning=cached_binning,
                     done0=done0)


def _pix_to_tile(idx, width, tile, grid_x):
    """Flat pixel index -> (tile index, within-tile row-major position)."""
    y, x = idx // width, idx % width
    t = (y // tile) * grid_x + (x // tile)
    p2 = (y % tile) * tile + (x % tile)
    return t, p2


def _done0_from_idx(idx_list, width, height, tile):
    """[num_tiles, 1, P2] int32 done-mask: 1 everywhere except the sampled
    flat pixel indices in `idx_list` (each [batch] int32). Pixels the loss
    never reads start 'done', so the extras kernels' whole-visit early
    termination fires once the few sampled pixels per tile saturate —
    bit-exact for the sampled values (a pixel's blend is independent of its
    neighbors; tests/test_sampled_done.py)."""
    grid_x = (width + tile - 1) // tile
    grid_y = (height + tile - 1) // tile
    d = jnp.ones((grid_x * grid_y, 1, tile * tile), jnp.int32)
    for idx in idx_list:
        t, p2 = _pix_to_tile(idx, width, tile, grid_x)
        d = d.at[t, jnp.zeros_like(t), p2].set(0)
    return d


def _draw_sv_pixel_idx(key, segmap, sorted_segmap, cf, batch: int,
                       consider_negative: bool, has_sampler: bool,
                       seg_samp, sorted_samp):
    """Draw the single-view losses' pixel index sets BEFORE rendering (the
    draws depend only on the segmaps/samplers, never on the render), so the
    render can be given a sampled-pixel done mask. Key-splitting order is
    identical to the in-loss drawing it replaces — the sampled indices, and
    therefore the losses, are bit-identical. Returns (draws, k) where draws
    is [(idx, any_valid, neg)] per segmap type and k the advanced key."""
    H, W = segmap.shape
    seg_list = ([(segmap, 0)] if cf is None
                else [(segmap, 0), (sorted_segmap, 1)])
    k = key
    draws = []
    for seg, mask_type in seg_list:
        labels_flat = seg.reshape(-1)
        neg = consider_negative and mask_type == 0
        k, sub = jax.random.split(k)
        if neg:
            idx = jax.random.randint(sub, (batch,), 0, labels_flat.shape[0])
            any_valid = jnp.bool_(True)
        elif has_sampler:
            idx, any_valid = sample_from_ids(
                sub, seg_samp if mask_type == 0 else sorted_samp, batch)
        else:
            idx, any_valid = sample_valid_pixels(sub, labels_flat > 0, batch)
        draws.append((idx, any_valid, neg))
    return draws, k


def single_view_and_3d_losses(params, seg_feature, out, key, segmap,
                              sorted_segmap, seg3d_labels, cf, lam_sv,
                              lam_3d, batch, max_labels,
                              consider_negative: bool, has_sampler: bool,
                              seg_samp, sorted_samp, vis3d_samp,
                              tile: int = 16, sv_draws=None,
                              fetch_override=None, visible_override=None):
    """Single-view ProtoNCE on [raw/filtered, sorted] segmaps + 3D ProtoNCE
    over visible gaussians (reference train_semantic.py:108-141, :175-195).
    `out` is the camera's feature render. Shared by the single-chip step and
    the per-device body of the DP step.

    Sampled features come straight from the kernels' tile-major output
    (out.blend.extra_tiles) when available: converting the flat pixel index
    to (tile, in-tile) coordinates lets XLA dead-code-eliminate the
    [H,W,E] feature-map transpose AND its gradient un-transpose (~6 ms/step
    at 976x728x16 on v5e) — only the 32k sampled rows ever materialize.

    sv_draws: pre-drawn pixel index sets from _draw_sv_pixel_idx (the
    sampled-done fast path draws before rendering); the key is then advanced
    by the same splits so the 3D draw below stays bit-identical.
    fetch_override(set_index, idx) -> [batch, E] replaces the map fetch
    (sparse-pixel path); visible_override replaces out.visible (out may
    then be None)."""
    H, W = segmap.shape
    ext_tiles = out.blend.extra_tiles if out is not None else None

    def fetch(si, idx):
        if fetch_override is not None:
            return fetch_override(si, idx)
        if ext_tiles is None:
            return out.blend.extra.reshape(-1, seg_feature.shape[1])[idx]
        grid_x = (W + tile - 1) // tile
        t, p2 = _pix_to_tile(idx, W, tile, grid_x)
        return ext_tiles[t, :, p2]                       # [batch, E]

    if sv_draws is None:
        sv_draws, k = _draw_sv_pixel_idx(
            key, segmap, sorted_segmap, cf, batch, consider_negative,
            has_sampler, seg_samp, sorted_samp)
    else:
        k = key
        for _ in sv_draws:          # burn the same splits (key parity)
            k, _sub = jax.random.split(k)

    total = 0.0
    seg_list = ([(segmap, 0)] if cf is None
                else [(segmap, 0), (sorted_segmap, 1)])
    for si, ((seg, mask_type), (idx, any_valid, neg)) in enumerate(
            zip(seg_list, sv_draws)):
        labels_flat = seg.reshape(-1)
        f = fetch(si, idx)
        l = labels_flat[idx]
        weight = 1.0 if mask_type == 1 else 0.5
        cl = contrastive_loss(f, l, max_labels,
                              predef_u=cf if mask_type == 1 else None,
                              consider_negative=neg)
        total = total + jnp.where(any_valid, cl, 0.0) * lam_sv * weight

    # 3D over visible gaussians (:175-195). Normalize AFTER the gather —
    # row-wise normalization commutes with row selection, and normalizing
    # only the 32k sampled rows instead of all N costs ~5 ms less on v5e
    k, sub = jax.random.split(k)
    if has_sampler:
        idx, any_valid = sample_from_ids(sub, vis3d_samp, batch)
    else:
        vis = visible_override if visible_override is not None \
            else out.visible
        idx, any_valid = sample_valid_pixels(sub, vis & (seg3d_labels > 0),
                                             batch)
    f3 = seg_feature[idx]
    f3 = f3 / (jnp.linalg.norm(f3, axis=1, keepdims=True) + 1e-6)
    cl = contrastive_loss(f3, seg3d_labels[idx], max_labels,
                          predef_u=cf)
    total = total + jnp.where(any_valid, cl, 0.0) * lam_3d
    return total


@struct.dataclass
class SemanticCamera:
    """Per-camera dynamic inputs of one semantic train step (registered
    pytree; built once per camera by SegSplatting._camera_bundles)."""
    w2v: jnp.ndarray            # [4,4]
    full_proj: jnp.ndarray      # [4,4]
    campos: jnp.ndarray         # [3]
    segmap: jnp.ndarray         # [H,W] raw/filtered instance labels
    sorted_segmap: jnp.ndarray  # [H,W] cluster-consistent labels
    binning: Optional[tuple] = None      # frozen-geometry cache bundle
    seg_samp: Optional[jnp.ndarray] = None     # valid-ids sampler packs
    sorted_samp: Optional[jnp.ndarray] = None
    vis3d_samp: Optional[jnp.ndarray] = None


@struct.dataclass
class SemanticMVBlock:
    """The every-10th-iter multi-view window (n_mv stacked views). Pass
    None to semantic_train_step to skip the MV loss entirely — the window
    size and the tile-subsample count are read from the array shapes, and
    `sel_tiles is not None` selects the tile-subsampled variant."""
    w2v: jnp.ndarray            # [V,4,4]
    full_proj: jnp.ndarray      # [V,4,4]
    campos: jnp.ndarray         # [V,3]
    segmaps: jnp.ndarray        # [V,H,W] sorted segmaps
    binning: Optional[tuple] = None      # stacked per-view cache bundles
    sel_tiles: Optional[jnp.ndarray] = None  # [V,K] sorted unique tile ids


@struct.dataclass
class SemanticHypers:
    """Training-constant scalars/arrays shared by every step."""
    bg: jnp.ndarray
    lrs: dict                   # per-field LRs (models.optimizer.semantic_lrs)
    lam_sv: jnp.ndarray
    lam_mv: jnp.ndarray
    lam_3d: jnp.ndarray
    seg3d_labels: jnp.ndarray   # [capacity] 3D prior labels
    class_feat: Optional[jnp.ndarray] = None  # [max_labels,E] prototypes


@dataclass(frozen=True)
class SemanticStepConfig:
    """Static (trace-time) configuration of semantic_train_step."""
    raster: RasterizeConfig
    batch: int
    max_labels: int
    consider_negative: bool = False
    # opt-in: merged virtual-image MV launches (see config.mv_merged)
    mv_merged: bool = False
    # opt-in: sparse-pixel extras kernels (ops/blend_sparse; config.sparse_px)
    # — measured slower than the dense sampled-done path at bench scale in
    # its first formulation (grid-step overhead dominates the shrunken
    # VPU work); kept for further tuning
    sparse_px: bool = False


def _mv_tile_subsample_loss(params, seg_feature, mv: "SemanticMVBlock",
                            key, cf, batch: int, max_labels: int,
                            cfg: RasterizeConfig):
    """Tile-subsampled multi-view ProtoNCE (TPU addition, no reference
    equivalent): uniformly pre-sampled tiles per view are rendered through
    mini aligned bundles — two-stage cluster sampling of the same pixel
    population (tiles are equal-sized, so tile-then-pixel uniform sampling
    is uniform over pixels); ~10x less multi-view render work at somewhat
    higher gradient variance. Enable with --mv_tile_subsample K.
    Returns (loss_term, truncated_chunk_count)."""
    from ..ops.binning import select_tiles_bundle
    from ..ops.rasterize import VisitBinningCache, rasterize_extras_tiles
    if not isinstance(mv.binning, VisitBinningCache):
        raise ValueError(
            "mv_tile_subsample requires the visit-layout (pallas) binning "
            "cache — set pipe.rasterizer_impl='pallas' or run on a non-CPU "
            "backend")
    n_mv = mv.w2v.shape[0]
    K = mv.sel_tiles.shape[1]
    tile = cfg.tile
    grid_x = (cfg.width + tile - 1) // tile
    n = params.capacity
    lane = jnp.arange(tile * tile, dtype=jnp.int32)
    px = lane % tile
    py = lane // tile
    feat_n = seg_feature / (jnp.linalg.norm(
        seg_feature, axis=1, keepdims=True) + 1e-6)
    E = seg_feature.shape[1]

    mv_trunc = jnp.int32(0)
    feats, labels = [], []
    for i in range(n_mv):
        mcam = CameraMats(mv.w2v[i], mv.full_proj[i], mv.campos[i])
        sel = mv.sel_tiles[i]
        gid, mtile, mrank, n_tr = select_tiles_bundle(
            mv.binning.sorted_gid[i], mv.binning.tile_bounds[i], sel,
            chunk_cap=K * 8, n=n, align=cfg.pallas_chunk)
        mv_trunc = mv_trunc + n_tr  # no silent caps: surfaced to the bar
        f = rasterize_extras_tiles(
            params.xyz, params.scaling_activated(),
            params.rotation_normalized(),
            params.opacity_activated()[:, 0], mcam, cfg, feat_n,
            (gid, mtile, mrank), sel, alive=params.alive)
        ty, tx = sel // grid_x, sel % grid_x
        yy = ty[:, None] * tile + py[None, :]
        xx = tx[:, None] * tile + px[None, :]
        flat_idx = (yy * cfg.width + xx).reshape(-1)
        # edge tiles of non-multiple-of-16 frames hang past the image:
        # zero (=invalid) labels for out-of-image pixels so the
        # valid-pixel sampler never pairs a rendered feature with a
        # clamped/wrapped segmap label
        in_img = ((yy < cfg.height) & (xx < cfg.width)).reshape(-1)
        feats.append(f.reshape(-1, E))
        labels.append(jnp.where(
            in_img, mv.segmaps[i].reshape(-1)[
                jnp.clip(flat_idx, 0, cfg.height * cfg.width - 1)], 0))
    feats_mv = jnp.concatenate(feats)
    labels_mv = jnp.concatenate(labels)
    idx, any_valid = sample_valid_pixels(key, labels_mv > 0, batch)
    cl = contrastive_loss(feats_mv[idx], labels_mv[idx], max_labels,
                          predef_u=cf)
    return jnp.where(any_valid, cl, 0.0), mv_trunc


def _mv_full_loss_merged(params, seg_feature, mv: "SemanticMVBlock", key,
                         cf, batch: int, max_labels: int,
                         cfg: RasterizeConfig, group_max: int = 0):
    """Reference-exact multi-view ProtoNCE through MERGED virtual-image
    launches (round 5; reference train_semantic.py:145-172).

    Instead of five separate full-view renders (five pack gathers, five
    fwd/bwd kernel launches, five chain reductions — measured 5.7x a plain
    step at bench scale), the window's views are concatenated along the
    TILE axis: view v's cached visit lists shift by v*(tiles, chunks,
    slots), its packed attribute table stacks into one [V*(N+1), D] flat,
    and ONE extras-only kernel launch blends all views (the kernel derives
    pixel coords from tile % tiles_per_view, so per-view math is BIT-EXACT
    — no homography shift). The backward likewise runs once over the
    concatenated rows, reducing per (view, gaussian) through the cached
    per-view chain indices with static offsets. Views are grouped into the
    fewest launches whose visit arrays fit the kernel's SMEM scalar-
    prefetch budget (blend_visits.VISIT_SMEM_BUDGET_BYTES).

    Loss parity: the sampled pixels, their labels and their feature values
    are identical to the per-view path (same sorted pair lists, same visit
    masks, same blend order), so the loss matches _mv_full_loss to f32
    exactness (tests/test_mv_merged.py pins this)."""
    from ..ops.blend_pallas import pack_flat_cols
    from ..ops.blend_visits import (VISIT_SMEM_BUDGET_BYTES,
                                    blend_visits_diff)
    from ..ops.preprocess import preprocess_gaussians

    b = mv.binning
    n_mv = mv.w2v.shape[0]
    n1 = params.capacity + 1
    cap = b.sorted_gid.shape[1]
    vlen = b.visit_chunk.shape[1]
    tile = cfg.tile
    chunk = cfg.pallas_chunk
    grid_x = (cfg.width + tile - 1) // tile
    grid_y = (cfg.height + tile - 1) // tile
    T_tiles = grid_x * grid_y
    E = seg_feature.shape[1]
    interp = jax.default_backend() == "cpu"
    g_max = group_max or (max(1, VISIT_SMEM_BUDGET_BYTES // (5 * 4 * vlen))
                          if not interp else n_mv)
    groups = [list(range(s, min(s + g_max, n_mv)))
              for s in range(0, n_mv, g_max)]

    featn = seg_feature / (jnp.linalg.norm(
        seg_feature, axis=1, keepdims=True) + 1e-6)
    opac = params.opacity_activated()[:, 0]
    scal = params.scaling_activated()
    rot = params.rotation_normalized()
    zeros3 = params.xyz * 0.0   # color column unused in extras-only mode

    outs = []
    for grp in groups:
        V = len(grp)
        flats = []
        for v in grp:
            pre = preprocess_gaussians(
                params.xyz, scal, rot, mv.w2v[v], mv.full_proj[v],
                mv.campos[v], cfg.width, cfg.height, color=zeros3,
                tile=tile, alive=params.alive)
            flats.append(pack_flat_cols(pre.T, pre.xy, pre.normal_view,
                                        opac, pre.color, featn))
        flat_cat = jnp.concatenate(flats, axis=0)
        sl = slice(grp[0], grp[0] + V)

        def off(a, k):
            return (a[sl] + (jnp.arange(V, dtype=a.dtype) * k)[:, None]
                    ).reshape(-1)
        bundle9 = (off(b.sorted_gid, n1), off(b.visit_chunk, cap // chunk),
                   off(b.visit_tile, T_tiles),
                   b.visit_s0[sl].reshape(-1), b.visit_s1[sl].reshape(-1),
                   off(b.visit_tstart, cap), off(b.gid_order, cap),
                   off(b.gauss_offsets, cap), off(b.gauss_csum, cap))
        out, _ = blend_visits_diff(flat_cat, bundle9, None, V * T_tiles,
                                   tile, grid_x, E, interp, True, chunk,
                                   False, False, T_tiles)
        outs.append(out)

    # sampling semantics identical to the reference (and to _mv_full_loss):
    # uniform over label-valid pixels of the window's sorted segmaps
    labels_mv = mv.segmaps.reshape(-1)
    idx, any_valid = sample_valid_pixels(key, labels_mv > 0, batch)
    HW = cfg.height * cfg.width
    view_of = idx // HW
    pix = idx % HW
    y, x = pix // cfg.width, pix % cfg.width
    t_loc = (y // tile) * grid_x + (x // tile)
    p2 = (y % tile) * tile + (x % tile)
    f_mv = 0.0
    for gi, grp in enumerate(groups):
        V = len(grp)
        local_v = jnp.clip(view_of - grp[0], 0, V - 1)
        fv = outs[gi][local_v * T_tiles + t_loc, 10:10 + E, p2]  # [batch, E]
        in_grp = (view_of >= grp[0]) & (view_of < grp[0] + V)
        f_mv = f_mv + jnp.where(in_grp[:, None], fv, 0.0)
    cl = contrastive_loss(f_mv, labels_mv[idx], max_labels, predef_u=cf)
    return jnp.where(any_valid, cl, 0.0)


def _sparse_view_feats(params, featn, w2v, full_proj, campos, cb,
                       cfg: RasterizeConfig, spix, S: int):
    """One view's sparse-pixel feature render (ops/blend_sparse): returns
    (feat [T, S, E], visible [N] bool). cb is a cached visit bundle with
    chain-reduce indices (VisitBinningCache or its first 9 fields)."""
    from ..ops.blend_pallas import pack_flat_cols
    from ..ops.blend_sparse import blend_sparse_diff
    from ..ops.preprocess import preprocess_gaussians
    pre = preprocess_gaussians(
        params.xyz, params.scaling_activated(),
        params.rotation_normalized(), w2v, full_proj, campos,
        cfg.width, cfg.height, color=params.xyz * 0.0, tile=cfg.tile,
        alive=params.alive)
    flat = pack_flat_cols(pre.T, pre.xy, pre.normal_view,
                          params.opacity_activated()[:, 0], pre.color,
                          featn)
    grid_x = (cfg.width + cfg.tile - 1) // cfg.tile
    grid_y = (cfg.height + cfg.tile - 1) // cfg.tile
    interp = jax.default_backend() == "cpu"
    feat, _aux = blend_sparse_diff(flat, tuple(cb)[:9], spix,
                                   grid_x * grid_y, cfg.tile, grid_x,
                                   featn.shape[1], interp, cfg.pallas_chunk,
                                   S)
    return feat, pre.valid & (pre.radius > 0)


def _mv_full_loss_sparse(params, seg_feature, featn, mv: "SemanticMVBlock",
                         draw, cf, batch: int, max_labels: int,
                         cfg: RasterizeConfig, spix_v, t_of, slot_of,
                         S: int):
    """Reference-exact multi-view ProtoNCE through per-view SPARSE renders:
    only the drawn pixels blend (ops/blend_sparse — bit-identical values).
    draw = (idx, any_valid) from the shared pre-render sampling; spix_v /
    t_of / slot_of from spix_from_idx per view."""
    n_mv = mv.w2v.shape[0]
    idx, any_valid = draw
    HW = cfg.height * cfg.width
    view_of = idx // HW
    f_mv = 0.0
    for v in range(n_mv):
        cb = jax.tree.map(lambda a: a[v], mv.binning)
        feat_v, _vis = _sparse_view_feats(params, featn, mv.w2v[v],
                                          mv.full_proj[v], mv.campos[v],
                                          cb, cfg, spix_v[v], S)
        fv = feat_v[t_of, slot_of, :]                     # [batch, E]
        f_mv = f_mv + jnp.where((view_of == v)[:, None], fv, 0.0)
    labels_mv = mv.segmaps.reshape(-1)
    cl = contrastive_loss(f_mv, labels_mv[idx], max_labels, predef_u=cf)
    return jnp.where(any_valid, cl, 0.0)


def _mv_full_loss(params, seg_feature, mv: "SemanticMVBlock", key, cf,
                  bg, batch: int, max_labels: int, cfg: RasterizeConfig,
                  sampled_done: bool = False, draw=None):
    """Reference-exact multi-view ProtoNCE: render all n_mv full views
    (train_semantic.py:145-172). sampled_done (pallas visit caches): the
    batch pixels are drawn BEFORE rendering (they depend only on the
    segmaps) and each view renders with a done mask latching every
    unsampled pixel — the sampled features are bit-identical while the
    extras kernels skip almost all tile work (~2-3 sampled pixels per tile
    at the reference batch size). draw: externally pre-drawn
    (idx, any_valid) (the fast path shares one draw across cond
    branches)."""
    n_mv = mv.w2v.shape[0]
    labels_mv = mv.segmaps.reshape(-1)
    idx, any_valid = (draw if draw is not None
                      else sample_valid_pixels(key, labels_mv > 0, batch))
    HW = cfg.height * cfg.width
    view_of = idx // HW
    pix = idx % HW
    grid_x = (cfg.width + cfg.tile - 1) // cfg.tile
    t, p2 = _pix_to_tile(pix, cfg.width, cfg.tile, grid_x)

    done_v = None
    if sampled_done:
        grid_y = (cfg.height + cfg.tile - 1) // cfg.tile
        done_v = jnp.ones((n_mv, grid_x * grid_y, 1,
                           cfg.tile * cfg.tile), jnp.int32
                          ).at[view_of, t, jnp.zeros_like(t), p2].set(0)

    def render_one(i):
        mcam = CameraMats(mv.w2v[i], mv.full_proj[i], mv.campos[i])
        cb = (None if mv.binning is None else
              jax.tree.map(lambda a: a[i], mv.binning))
        return render_features(
            params, mcam, bg, cfg, seg_feature, cb,
            done0=None if done_v is None else done_v[i]).blend

    blends = [render_one(i) for i in range(n_mv)]
    if blends[0].extra_tiles is not None:
        # fetch the sampled features straight from the kernels' tile-major
        # output (same trick as the single-view loss): the five [H,W,E]
        # map transposes and their gradient un-transposes
        # dead-code-eliminate (~6 ms each at 976x728x16 on v5e)
        # per-view masked gathers (batch-sized) instead of stacking the
        # five tile-major buffers into one [V,T,E,P2] copy
        f_mv = 0.0
        for v, b in enumerate(blends):
            fv = b.extra_tiles[t, :, p2]                      # [batch, E]
            f_mv = f_mv + jnp.where((view_of == v)[:, None], fv, 0.0)
    else:
        feats_mv = jnp.stack([b.extra for b in blends]
                             ).reshape(-1, seg_feature.shape[1])
        f_mv = feats_mv[idx]
    cl = contrastive_loss(f_mv, labels_mv[idx], max_labels, predef_u=cf)
    return jnp.where(any_valid, cl, 0.0)


@partial(jax.jit, static_argnames=("scfg",))
def semantic_train_step(params, opt_state, key, cam: SemanticCamera,
                        mv: Optional[SemanticMVBlock],
                        hyp: SemanticHypers, scfg: SemanticStepConfig):
    """One contrastive step: single-view + 3D ProtoNCE on `cam`, plus the
    multi-view ProtoNCE over `mv`'s window when mv is not None (the pytree
    structure — mv present/absent, samplers present/absent, class_feat
    present/absent — IS the trace signature; no boolean statics)."""
    cfg = scfg.raster
    batch, max_labels = scfg.batch, scfg.max_labels
    cam_m = CameraMats(cam.w2v, cam.full_proj, cam.campos)
    cf = hyp.class_feat
    has_sampler = cam.seg_samp is not None

    from ..ops.rasterize import VisitBinningCache
    # sparse-pixel fast path (visit-layout caches): the losses read the
    # render at sampled pixels only, the draws depend only on segmaps, so
    # the pixels are drawn FIRST and only they blend (ops/blend_sparse —
    # bit-identical values/grads, tests/test_blend_sparse.py). Tiles whose
    # draw count overflows the static slot budget S (a ~6-sigma Poisson
    # tail) flip a flag and lax.cond falls back to the dense sampled-done
    # render — exactness never depends on the tail bound.
    use_fast = scfg.sparse_px and isinstance(cam.binning, VisitBinningCache)
    use_done = isinstance(cam.binning, VisitBinningCache)
    mv_full = mv is not None and mv.sel_tiles is None
    mv_merged = (scfg.mv_merged and mv_full
                 and isinstance(mv.binning, VisitBinningCache))

    def loss_fn(seg_feature):
        mv_trunc = jnp.int32(0)
        k, k_sv = jax.random.split(key)
        if not use_fast:
            # dense path: XLA layout caches / CPU backend render plainly;
            # visit caches use the sampled-done masks (bit-exact,
            # tests/test_sampled_done.py)
            sv_draws = done0 = None
            if use_done:
                sv_draws, _ = _draw_sv_pixel_idx(
                    k_sv, cam.segmap, cam.sorted_segmap, cf, batch,
                    scfg.consider_negative, has_sampler, cam.seg_samp,
                    cam.sorted_samp)
                done0 = _done0_from_idx([d[0] for d in sv_draws],
                                        cfg.width, cfg.height, cfg.tile)
            out = render_features(params, cam_m, hyp.bg, cfg, seg_feature,
                                  cam.binning, done0=done0)
            total = single_view_and_3d_losses(
                params, seg_feature, out, k_sv, cam.segmap,
                cam.sorted_segmap, hyp.seg3d_labels, cf, hyp.lam_sv,
                hyp.lam_3d, batch, max_labels, scfg.consider_negative,
                has_sampler, cam.seg_samp, cam.sorted_samp, cam.vis3d_samp,
                tile=cfg.tile, sv_draws=sv_draws)
            if mv is not None and mv.sel_tiles is not None:
                k2, sub = jax.random.split(k)
                cl, mv_trunc2 = _mv_tile_subsample_loss(
                    params, seg_feature, mv, sub, cf, batch, max_labels,
                    cfg)
                return total + cl * hyp.lam_mv, mv_trunc2
            if mv is not None:
                k2, sub = jax.random.split(k)
                if scfg.mv_merged and isinstance(mv.binning,
                                                 VisitBinningCache):
                    cl = _mv_full_loss_merged(params, seg_feature, mv, sub,
                                              cf, batch, max_labels, cfg)
                else:
                    cl = _mv_full_loss(params, seg_feature, mv, sub, cf,
                                       hyp.bg, batch, max_labels, cfg,
                                       sampled_done=use_done)
                total = total + cl * hyp.lam_mv
            return total, mv_trunc

        from ..ops.blend_sparse import pick_sparse_s, spix_from_idx
        W, H, tile = cfg.width, cfg.height, cfg.tile
        grid_x = (W + tile - 1) // tile
        T = grid_x * ((H + tile - 1) // tile)

        # draw every pixel set first (shared verbatim by both cond branches)
        sv_draws, _ = _draw_sv_pixel_idx(
            k_sv, cam.segmap, cam.sorted_segmap, cf, batch,
            scfg.consider_negative, has_sampler, cam.seg_samp,
            cam.sorted_samp)
        idx_all = jnp.concatenate([d[0] for d in sv_draws])
        S_sv = pick_sparse_s(int(idx_all.shape[0]), T)
        spix_sv, t_of, slot_of, overflow = spix_from_idx(
            idx_all, W, H, tile, S_sv)

        mv_draw = mv_pack = None
        sub_cl = None
        if mv is not None:
            k, sub = jax.random.split(k)
        if mv is not None and mv.sel_tiles is not None:
            sub_cl, mv_trunc = _mv_tile_subsample_loss(
                params, seg_feature, mv, sub, cf, batch, max_labels, cfg)
        if mv_full:
            n_mv = mv.w2v.shape[0]
            mv_draw = sample_valid_pixels(sub, mv.segmaps.reshape(-1) > 0,
                                          batch)
            HW = H * W
            view_of = mv_draw[0] // HW
            pix = mv_draw[0] % HW
            S_mv = pick_sparse_s(batch, n_mv * T)
            spix_l, tl, sl = [], None, None
            for v in range(n_mv):
                sp_v, t_v, s_v, ov = spix_from_idx(
                    pix, W, H, tile, S_mv, valid=view_of == v)
                overflow = overflow | ov
                spix_l.append(sp_v)
                # the per-view (t, slot) agree wherever that view owns the
                # sample; merge by ownership for one shared fetch table
                tl = t_v if tl is None else jnp.where(view_of == v, t_v, tl)
                sl = s_v if sl is None else jnp.where(view_of == v, s_v, sl)
            mv_pack = (spix_l, tl, sl)

        def dense_branch(feat):
            done0 = _done0_from_idx([d[0] for d in sv_draws], W, H, tile)
            out = render_features(params, cam_m, hyp.bg, cfg, feat,
                                  cam.binning, done0=done0)
            total = single_view_and_3d_losses(
                params, feat, out, k_sv, cam.segmap, cam.sorted_segmap,
                hyp.seg3d_labels, cf, hyp.lam_sv, hyp.lam_3d, batch,
                max_labels, scfg.consider_negative, has_sampler,
                cam.seg_samp, cam.sorted_samp, cam.vis3d_samp,
                tile=cfg.tile, sv_draws=sv_draws)
            if mv_full:
                cl = (_mv_full_loss_merged(params, feat, mv, sub, cf, batch,
                                           max_labels, cfg) if mv_merged
                      else _mv_full_loss(params, feat, mv, sub, cf, hyp.bg,
                                         batch, max_labels, cfg,
                                         sampled_done=True, draw=mv_draw))
                total = total + cl * hyp.lam_mv
            return total

        def sparse_branch(feat):
            featn = feat / (jnp.linalg.norm(feat, axis=1, keepdims=True)
                            + 1e-6)
            feat_sv, visible = _sparse_view_feats(
                params, featn, cam.w2v, cam.full_proj, cam.campos,
                cam.binning, cfg, spix_sv, S_sv)

            def fetch(si, _idx):
                sl_ = slice(si * batch, (si + 1) * batch)
                return feat_sv[t_of[sl_], slot_of[sl_], :]

            total = single_view_and_3d_losses(
                params, feat, None, k_sv, cam.segmap, cam.sorted_segmap,
                hyp.seg3d_labels, cf, hyp.lam_sv, hyp.lam_3d, batch,
                max_labels, scfg.consider_negative, has_sampler,
                cam.seg_samp, cam.sorted_samp, cam.vis3d_samp,
                tile=cfg.tile, sv_draws=sv_draws, fetch_override=fetch,
                visible_override=visible)
            if mv_full:
                cl = _mv_full_loss_sparse(
                    params, feat, featn, mv, mv_draw, cf, batch,
                    max_labels, cfg, mv_pack[0], mv_pack[1], mv_pack[2],
                    S_mv)
                total = total + cl * hyp.lam_mv
            return total

        if mv_merged:
            # merged-MV opt-in keeps its dedicated dense route
            total = dense_branch(seg_feature)
        else:
            total = jax.lax.cond(overflow, dense_branch, sparse_branch,
                                 seg_feature)
        if sub_cl is not None:
            total = total + sub_cl * hyp.lam_mv
        return total, mv_trunc

    (loss, mv_trunc), g = jax.value_and_grad(
        loss_fn, has_aux=True)(params.seg_feature)
    grads = params.replace(seg_feature=g)  # only seg_feature is read below
    new_params, new_opt = adam_step(
        params, grads, opt_state, hyp.lrs,
        frozen_fields=("xyz", "features_dc", "features_rest", "scaling",
                       "rotation", "opacity"))
    return new_params, new_opt, loss, mv_trunc


class SegSplatting:
    """Reference train_semantic.py SegSplatting parity."""

    def __init__(self, dataset, opt, pipe, output_root: str = "output",
                 dp: int = 0):
        self.dataset = dataset
        self.opt = opt
        self.pipe = pipe
        self.dp = int(dp)
        self.data_dir = dataset.source_path
        sp = self.data_dir.rstrip("/").split("/")
        self.model_path = os.path.join(
            output_root, sp[-2] if len(sp) > 1 else "scene", sp[-1],
            dataset.model_path)
        self.params = gmod.load_ply(
            os.path.join(self.data_dir, "point_cloud.ply"),
            max_sh_degree=3, seg_feat_dim=dataset.seg_feat_dim,
            load_seg_feat=dataset.load_seg_feat)
        self.bg = jnp.asarray(
            [1.0, 1.0, 1.0] if dataset.white_background else [0.0, 0.0, 0.0])
        self.class_feat = None
        self.scene = None
        self.rng = random.Random(0)
        self.key = jax.random.PRNGKey(0)

    def _load_scene(self):
        from ..data.dataset import Scene
        self.scene = Scene(self.dataset, load_images=True,
                           output_root=os.path.dirname(
                               os.path.dirname(os.path.dirname(
                                   self.model_path))) or "output")
        self.cam_objs = self.scene.get_train_cameras()
        self.cams = [camera_tensors(c) for c in self.cam_objs]
        self._max_labels_memo = None  # label space may change with segmaps

    def robust_semantic_priors(self):
        """Stage 1 (train_semantic.py:33-72)."""
        if self.dataset.preload_robust_semantic and os.path.exists(
                self.dataset.preload_robust_semantic):
            seg_dir = self.dataset.preload_robust_semantic
        else:
            seg_dir = os.path.join(self.model_path, "semantic_association")
            os.makedirs(seg_dir, exist_ok=True)

        self._load_scene()
        n_alive = int(self.params.n_alive())

        def trace_fn(view_idx: int):
            cam_obj = self.cam_objs[view_idx]
            ct = self.cams[view_idx]
            cfg = RasterizeConfig(width=int(cam_obj.width),
                                  height=int(cam_obj.height),
                                  track_contrib=True)
            out = render_features(self.params,
                                  CameraMats(ct.w2v, ct.full_proj, ct.campos),
                                  self.bg, cfg)
            return (np.asarray(out.blend.contrib_ids),
                    np.asarray(cam_obj.segmap))

        gc = GausCluster(n_alive, np.asarray(self.params.xyz)[:n_alive],
                         [c.image_name for c in self.cam_objs], trace_fn)
        self.gausclustering = gc

        out_path = os.path.join(seg_dir, "output_dict.npy")
        if not os.path.exists(out_path):
            import shutil
            for d in ("mask_filtered", "mask_sorted", "mask_undersegment"):
                p = os.path.join(self.data_dir, "sam", d)
                if os.path.exists(p):
                    shutil.rmtree(p)
            gc.maskclustering(seg_dir)

        priors = np.load(out_path, allow_pickle=True).item()
        self.seg3d_masks = priors["mask_3d_labels"]
        self.seg3d_labels = np.argmax(
            self.seg3d_masks.astype(np.int16), axis=1).astype(np.int32)
        if not os.path.exists(os.path.join(self.data_dir, "sam/mask_sorted")):
            gc.rearrange_mask(os.path.join(self.data_dir, "sam/mask"),
                              priors["mask_2d_clusters"])
        if (len(priors["underseg_mask_ids"]) > 0 and
                not os.path.exists(os.path.join(self.data_dir,
                                                "sam/mask_filtered"))):
            gc.filter_undersegment_mask(os.path.join(self.data_dir, "sam/mask"),
                                        priors["underseg_mask_ids"])

        # reload cameras (picks up mask_sorted / mask_filtered)
        self._load_scene()
        self.params, self.class_feat = gmod.set_3d_feat(
            self.params, self.seg3d_masks, self.dataset.seg_feat_dim,
            gram_feat=self.opt.gram_feat_3d)
        # pad 3D labels to capacity
        lab = np.zeros(self.params.capacity, np.int32)
        lab[:len(self.seg3d_labels)] = self.seg3d_labels
        self.seg3d_labels_padded = jnp.asarray(lab)

    def _precompute_binning(self, tile: int = 16):
        """Frozen geometry ⇒ per-camera tile lists are constant: compute the
        expand+sort once per camera and cache the blend-ready layout on
        device (aligned bundle for the Pallas path, padded indices for XLA).
        Removes the sort from the contrastive hot loop entirely."""
        from ..ops.rasterize import CameraMats, compute_binning_cache

        # probe pass: read per-tile counts + true pair totals (XLA layout is
        # the cheap probe), then rebuild with a snug power-of-two pair_cap —
        # pack traffic in the hot loop scales with the aligned capacity
        max_count = 0
        max_pairs = 0
        for ct, cam in zip(self.cams, self.cam_objs):
            _, tc, _ = compute_binning_cache(
                self.params, CameraMats(ct.w2v, ct.full_proj, ct.campos),
                int(cam.width), int(cam.height), tile=tile, tile_cap=128,
                impl="xla")
            max_count = max(max_count, int(jnp.max(tc)))
            max_pairs = max(max_pairs, int(jnp.sum(tc)))
        k = max(128, (max_count + 127) // 128 * 128)
        # near-exact cap at 1k granularity: the hot loop's pack gather and
        # backward chain-reduce run over pair_cap rows every step (measured
        # 11 ms/step difference between a 1.54x and a 1.05x cap at waldo
        # scale on v5e); geometry is FROZEN, so the probed per-camera totals
        # are exact and only rounding margin is needed (round 5: was 1.1x)
        pair_cap = max(128 * 1024,
                       (int(max_pairs * 1.02) + 1023) // 1024 * 1024)
        impl = getattr(self.pipe, "rasterizer_impl", "auto")
        edim = int(self.dataset.seg_feat_dim)  # true gather width: 21 + E
        cache = []
        for ct, cam in zip(self.cams, self.cam_objs):
            cb, tc, nd = compute_binning_cache(
                self.params, CameraMats(ct.w2v, ct.full_proj, ct.campos),
                int(cam.width), int(cam.height), tile=tile, tile_cap=k,
                pair_cap=pair_cap, impl=impl, extras_dim=edim)
            if int(nd) > 0:  # safety: grow once on overflow
                pair_cap *= 2
                cb, tc, nd = compute_binning_cache(
                    self.params, CameraMats(ct.w2v, ct.full_proj, ct.campos),
                    int(cam.width), int(cam.height), tile=tile, tile_cap=k,
                    pair_cap=pair_cap, impl=impl, extras_dim=edim)
            cache.append(cb)
        self.binning_cache = cache
        self.binning_k = k
        return cache

    def _precompute_sampling(self):
        """Per-camera valid-index sampler packs (contrastive.valid_ids_pack)
        — segmap labels and frozen-geometry visibility are constants, so the
        hot loop pays one randint + one gather per sampler (the previous
        csum + searchsorted formulation cost ~7 ms per 32k draw on v5e)."""
        from functools import partial as _partial

        from ..ops.preprocess import preprocess_gaussians

        @_partial(jax.jit, static_argnames=("width", "height"))
        def _vis(xyz, scales, rotations, alive, w2v, full_proj, campos,
                 width, height):
            pre = preprocess_gaussians(xyz, scales, rotations, w2v,
                                       full_proj, campos, width, height,
                                       color=xyz * 0.0, alive=alive)
            return pre.valid & (pre.radius > 0)

        from ..semantic.contrastive import valid_ids_pack

        lab3d_ok = self.seg3d_labels_padded > 0
        seg_cs, sorted_cs, vis_cs = [], [], []
        for ct, cam in zip(self.cams, self.cam_objs):
            seg = (jnp.asarray(cam.segmap).reshape(-1) > 0
                   if cam.segmap is not None
                   else jnp.zeros(int(cam.width) * int(cam.height), bool))
            seg_cs.append(valid_ids_pack(seg))
            srt = (jnp.asarray(cam.sorted_segmap).reshape(-1) > 0
                   if cam.sorted_segmap is not None
                   else jnp.zeros(int(cam.width) * int(cam.height), bool))
            sorted_cs.append(valid_ids_pack(srt))
            vis = _vis(self.params.xyz, self.params.scaling_activated(),
                       self.params.rotation_normalized(), self.params.alive,
                       ct.w2v, ct.full_proj, ct.campos,
                       int(cam.width), int(cam.height))
            vis_cs.append(valid_ids_pack(vis & lab3d_ok))
        self.sampling_packs = (seg_cs, sorted_cs, vis_cs)
        return self.sampling_packs

    def _camera_bundles(self) -> List[SemanticCamera]:
        """One SemanticCamera pytree per training view: device-resident
        camera mats + segmaps (uploading [H,W] maps per step costs ~1 ms
        each over the tunnel; they are training-constant), the
        frozen-geometry binning cache and the valid-ids sampler packs."""
        seg_cs, sorted_cs, vis_cs = self.sampling_packs
        bundles = []
        for ci, (ct, cam) in enumerate(zip(self.cams, self.cam_objs)):
            zeros = jnp.zeros((int(cam.height), int(cam.width)), jnp.int32)
            bundles.append(SemanticCamera(
                w2v=ct.w2v, full_proj=ct.full_proj, campos=ct.campos,
                segmap=(jnp.asarray(cam.segmap) if cam.segmap is not None
                        else zeros),
                sorted_segmap=(jnp.asarray(cam.sorted_segmap)
                               if cam.sorted_segmap is not None else zeros),
                binning=self.binning_cache[ci],
                seg_samp=seg_cs[ci], sorted_samp=sorted_cs[ci],
                vis3d_samp=vis_cs[ci]))
        return bundles

    def _max_labels(self) -> int:
        # memoized: the label space is fixed once the (re)loaded segmaps and
        # 3D priors exist — no need to rescan every image per training run
        cached = getattr(self, "_max_labels_memo", None)
        if cached is not None:
            return cached
        m = 1
        for c in self.cam_objs:
            if c.segmap is not None:
                m = max(m, int(c.segmap.max()))
            if c.sorted_segmap is not None:
                m = max(m, int(c.sorted_segmap.max()))
        m = max(m, int(self.seg3d_labels.max()) + 1)
        self._max_labels_memo = int((m + 7) // 8 * 8)
        return self._max_labels_memo

    def _train_segfeat_dp(self, iterations: int, opt_state, max_labels: int,
                          progress: bool, save_every: int):
        """DP contrastive loop: `dp` cameras per step (one per chip), full
        single-view + 3D loss structure, pmean'd feature gradients. The
        every-10th-iter multi-view loss is not distributed — each DP step
        already mixes `dp` views' gradients (see build_dp_semantic_step)."""
        from tqdm import tqdm

        from ..parallel.data_parallel import (build_dp_semantic_step,
                                              make_mesh)
        opt = self.opt
        mesh = make_mesh(self.dp)
        sizes = {(int(c.width), int(c.height)) for c in self.cam_objs}
        if len(sizes) != 1:
            raise ValueError(f"--dp requires uniform camera resolution; "
                             f"got {sizes}")
        width, height = sizes.pop()
        cfg = RasterizeConfig(
            width=width, height=height, bwd_extras_only=True,
            impl=getattr(self.pipe, "rasterizer_impl", "auto"),
            extras_dim=int(self.dataset.seg_feat_dim))
        seg_cs, sorted_cs, vis_cs = self.sampling_packs
        has_cf = self.class_feat is not None
        cf = (jnp.asarray(np.pad(self.class_feat,
                                 ((0, max(0, max_labels
                                          - len(self.class_feat))), (0, 0))))
              if has_cf else jnp.zeros((max_labels,
                                        self.dataset.seg_feat_dim)))
        step = build_dp_semantic_step(
            cfg, mesh, batch=int(opt.sample_batchsize),
            max_labels=max_labels, lam_sv=opt.lambda_singview_contras,
            lam_3d=opt.lambda_3D_contras,
            consider_negative=bool(opt.consider_negative_labels),
            has_class_feat=has_cf, has_sampler=True, has_cached_binning=True,
            cb_len=len(self.binning_cache[0]))
        lr = jnp.float32(semantic_lrs(opt)["seg_feature"])
        zeros_map = jnp.zeros((height, width), jnp.int32)

        dev_seg = {}

        def seg_of(v, sorted_=False):
            # device-cached: uploading [H,W] maps per step costs ~1ms each
            key = (v, sorted_)
            if key not in dev_seg:
                c = self.cam_objs[v]
                m = c.sorted_segmap if sorted_ else c.segmap
                dev_seg[key] = (jnp.asarray(m) if m is not None
                                else zeros_map)
            return dev_seg[key]

        stack = []
        bar = tqdm(range(1, iterations + 1), desc="Contrastive(DP)",
                   disable=not progress)
        for it in bar:
            idxs = []
            for _ in range(self.dp):
                if not stack:
                    stack = list(range(len(self.cams)))
                idxs.append(stack.pop(self.rng.randint(0, len(stack) - 1)))
            cts = [self.cams[v] for v in idxs]
            self.key, *subs = jax.random.split(self.key, self.dp + 1)
            cb = tuple(jnp.stack([self.binning_cache[v][f] for v in idxs])
                       for f in range(len(self.binning_cache[0])))
            self.params, opt_state, loss = step(
                self.params, opt_state, jnp.stack(subs),
                jnp.stack([ct.w2v for ct in cts]),
                jnp.stack([ct.full_proj for ct in cts]),
                jnp.stack([ct.campos for ct in cts]),
                jnp.stack([seg_of(v) for v in idxs]),
                jnp.stack([seg_of(v, True) for v in idxs]),
                self.seg3d_labels_padded, cf, self.bg, lr, cb,
                jnp.stack([seg_cs[v] for v in idxs]),
                jnp.stack([sorted_cs[v] for v in idxs]),
                jnp.stack([vis_cs[v] for v in idxs]))
            if it % 10 == 0:
                bar.set_postfix({"ContraLoss": f"{float(loss):.3f}"})
            if it % save_every == 0 or it == iterations:
                self.save(it)
        self.export_segment_results(iterations, use_hdbscan=True,
                                    note=f"iteration_{iterations}_hdbscan")

    def train_segfeat(self, iterations: Optional[int] = None,
                      progress: bool = True, save_every: int = 2500):
        """Stage 2 (train_semantic.py:75-237)."""
        from tqdm import tqdm
        opt = self.opt
        iterations = iterations or opt.iterations
        opt_state = init_adam_state(self.params)
        lrs = semantic_lrs(opt)
        max_labels = self._max_labels()
        if not hasattr(self, "binning_cache"):
            self._precompute_binning()
        if not hasattr(self, "sampling_packs"):
            self._precompute_sampling()
        if self.dp:
            return self._train_segfeat_dp(iterations, opt_state, max_labels,
                                          progress, save_every)
        # tiny scenes: shrink the MV window to the camera count instead of
        # crashing (reference train_semantic.py:148 raises on
        # len(cams) <= sample_mv_frames; window range matches it otherwise)
        n_mv = min(int(opt.sample_mv_frames), len(self.cams))
        self.mv_trunc_total = 0
        cf = (jnp.asarray(np.pad(self.class_feat,
                                 ((0, max(0, max_labels
                                          - len(self.class_feat))), (0, 0))))
              if self.class_feat is not None else None)

        from ..models.optimizer import dev_scalar
        hyp = SemanticHypers(
            bg=self.bg, lrs=lrs,
            lam_sv=dev_scalar(opt.lambda_singview_contras),
            lam_mv=dev_scalar(opt.lambda_multiview_contras),
            lam_3d=dev_scalar(opt.lambda_3D_contras),
            seg3d_labels=self.seg3d_labels_padded, class_feat=cf)
        bundles = self._camera_bundles()
        scfg_of = {}  # one static config per camera resolution

        def scfg_for(ci):
            wh = (int(self.cam_objs[ci].width), int(self.cam_objs[ci].height))
            if wh not in scfg_of:
                scfg_of[wh] = SemanticStepConfig(
                    raster=RasterizeConfig(
                        width=wh[0], height=wh[1], bwd_extras_only=True,
                        impl=getattr(self.pipe, "rasterizer_impl", "auto"),
                        extras_dim=int(self.dataset.seg_feat_dim)),
                    batch=int(opt.sample_batchsize), max_labels=max_labels,
                    consider_negative=bool(opt.consider_negative_labels),
                    mv_merged=bool(getattr(opt, "mv_merged", 0)),
                    sparse_px=bool(getattr(opt, "sparse_px", 0)))
            return scfg_of[wh]

        stack = []
        bar = tqdm(range(1, iterations + 1), desc="Contrastive",
                   disable=not progress)
        from ..utils.profiling import TraceWindow
        tracer = TraceWindow(getattr(self, "profile_trace", None),
                             *getattr(self, "profile_window", (100, 120)))
        for it in bar:
            tracer.tick(it)
            if not stack:
                stack = list(range(len(self.cams)))
            ci = stack.pop(self.rng.randint(0, len(stack) - 1))
            cam_obj = self.cam_objs[ci]
            do_mv = (opt.lambda_multiview_contras > 0 and it % 10 == 0)
            mv_k = int(getattr(opt, "mv_tile_subsample", 0))
            num_tiles = (((int(cam_obj.width) + 15) // 16)
                         * ((int(cam_obj.height) + 15) // 16))
            mv_k = min(mv_k, num_tiles)
            mv = None
            if do_mv:
                v0 = self.rng.randint(0, max(0, len(self.cams) - n_mv - 1))
                window = range(v0, v0 + n_mv)
                mv_sel = None
                if mv_k:
                    mv_sel = jnp.asarray(np.stack(
                        [np.sort(np.asarray(
                            self.rng.sample(range(num_tiles), mv_k),
                            np.int32)) for _ in range(n_mv)]))
                mv = SemanticMVBlock(
                    w2v=jnp.stack([self.cams[v].w2v for v in window]),
                    full_proj=jnp.stack(
                        [self.cams[v].full_proj for v in window]),
                    campos=jnp.stack([self.cams[v].campos for v in window]),
                    segmaps=jnp.stack(
                        [bundles[v].sorted_segmap for v in window]),
                    binning=jax.tree.map(
                        lambda *xs: jnp.stack(xs),
                        *[self.binning_cache[v] for v in window]),
                    sel_tiles=mv_sel)

            self.key, sub = jax.random.split(self.key)
            self.params, opt_state, loss, mv_trunc = semantic_train_step(
                self.params, opt_state, sub, bundles[ci], mv, hyp,
                scfg_for(ci))
            if do_mv and mv_k:
                # no silent caps: deepest-chunk truncation in the MV
                # tile-subsample path is counted and reported
                self.mv_trunc_total += int(mv_trunc)
            if it % 10 == 0:
                post = {"ContraLoss": f"{float(loss):.3f}"}
                if self.mv_trunc_total:
                    post["mv_trunc"] = self.mv_trunc_total
                bar.set_postfix(post)
            if it % save_every == 0 or it == iterations:
                self.save(it)
        tracer.close()  # finalize a trace left open mid-window
        self.export_segment_results(iterations, use_hdbscan=True,
                                    note=f"iteration_{iterations}_hdbscan")

    def save(self, iteration: int) -> str:
        path = os.path.join(self.model_path,
                            f"point_cloud/iteration_{iteration}",
                            "point_cloud.ply")
        gmod.save_ply(self.params, path)
        return path

    @staticmethod
    def _save_png(path: str, rgb01: np.ndarray) -> None:
        from PIL import Image
        Image.fromarray(np.uint8(np.clip(rgb01, 0, 1) * 255.0)).save(path)

    def render_views(self, save_mask: bool = False, view_idx=()):
        """Per-view feature exports (reference train_semantic.py:353-428):
        render/segfeat/<name>.npy (raw [H,W,F] features, memoized) +
        .png (PCA visualization); with save_mask, render/segmask/<name>.png
        colors each pixel by its best per-instance mean-feature match
        (score >= 0.75, else black)."""
        from ..semantic.export import pca_proj_matrix

        save_dir = os.path.join(self.model_path, "render")
        os.makedirs(os.path.join(save_dir, "segfeat"), exist_ok=True)
        os.makedirs(os.path.join(save_dir, "segmask"), exist_ok=True)
        if self.scene is None:
            self._load_scene()

        inst_feats = inst_colors = None
        if save_mask:
            feats = np.asarray(self.params.seg_feature)
            inst_feats = np.stack(
                [feats[self.seg3d_masks[:, k]].mean(0)
                 for k in range(self.seg3d_masks.shape[1])])
            rng = np.random.default_rng(0)
            inst_colors = rng.random((len(inst_feats), 3)) * 0.7 + 0.3

        views = (self.cam_objs if not view_idx
                 else [self.cam_objs[i] for i in view_idx])
        proj = None
        from ..render import render as render_full
        for cam_obj in views:
            name = cam_obj.image_name
            npy = os.path.join(save_dir, "segfeat", f"{name}.npy")
            if os.path.exists(npy):
                feat = np.load(npy)
            else:
                pkg = render_full(cam_obj, self.params, self.pipe, self.bg,
                                  viewer=True)
                feat = np.asarray(pkg["seg_feature"])
                np.save(npy, feat)
            if proj is None:
                proj = pca_proj_matrix(np.asarray(self.params.seg_feature))
            fn = feat / (np.linalg.norm(feat, axis=-1, keepdims=True) + 1e-6)
            rgb = np.clip(fn @ proj * 0.5 + 0.5, 0, 1)
            self._save_png(os.path.join(save_dir, "segfeat", f"{name}.png"), rgb)
            if save_mask:
                infn = inst_feats / (np.linalg.norm(
                    inst_feats, axis=1, keepdims=True) + 1e-6)
                score = fn @ infn.T                       # [H,W,K]
                best = score.argmax(-1)
                ok = np.take_along_axis(
                    score, best[..., None], axis=-1)[..., 0] >= 0.75
                mask_rgb = inst_colors[best] * ok[..., None]
                self._save_png(os.path.join(save_dir, "segmask", f"{name}.png"),
                          mask_rgb)

    def export_segment_results(self, iteration: int, score_threshold: float
                               = 0.9, use_hdbscan: bool = False,
                               note: Optional[str] = None):
        """Per-instance point clouds; HDBSCAN path follows Garfield
        (train_semantic.py:240-350; sklearn HDBSCAN replaces cuML)."""
        from ..semantic.export import export_segment_results
        save_dir = os.path.join(
            self.model_path, "point_cloud",
            note if note else f"iteration_{iteration}")
        params_c = gmod.compact(self.params)
        export_segment_results(
            np.asarray(params_c.xyz),
            np.asarray(params_c.seg_feature_normed()),
            self.seg3d_masks, self.seg3d_labels, save_dir,
            score_threshold=score_threshold, use_hdbscan=use_hdbscan)
