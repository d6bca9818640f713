"""Tile binning: (gaussian, tile) pair expansion, depth sort, per-tile ranges.

TPU-native replacement for cuda_rasterizer/rasterizer_impl.cu:70-138
(duplicateWithKeys + CUB radix sort + identifyTileRanges). XLA needs static
shapes, so pairs live in a fixed-capacity buffer (`pair_cap`) with overflow
reporting.

Two consumable layouts:
  * padded  — [num_tiles, tile_cap] index matrix (XLA blend path; simple but
    pays max-per-tile padding)
  * aligned — pairs packed contiguously per tile, each tile's segment padded
    to a CHUNK multiple (Pallas path: the kernel walks real chunks only, and
    the backward inverts the sort with pure gathers — see AlignedLayout)

The expansion uses the scatter-ones + cumsum "interval expand" trick instead of
one-thread-per-gaussian atomics; sorting uses a single fused int32 key
(tile bits | quantized depth) under jax.lax.sort instead of 64-bit radix keys.
Deterministic by construction. All outputs are index data — gradients never
flow through this module.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .preprocess import PreprocessOut

ALIGN = 128  # chunk alignment of the aligned layout (= blend_pallas.CHUNK)


class AlignedLayout(NamedTuple):
    """Pairs grouped by tile, each tile's segment CHUNK-aligned.

    aligned_gid      [aligned_cap]  gaussian id per aligned slot (N sentinel)
    chunk_tile       [n_chunks]     owning tile per chunk
    chunk_rank       [n_chunks]     chunk index within its tile (n_chunks
                                    marks the leftover sentinel chunks)

    The backward reduces per-slot grads per gaussian with one deterministic
    scatter-add over aligned_gid, so fresh per-step binning keeps no
    inverse-permutation data. The three optional fields below are a faster
    gather+cumsum+segment-diff reduction (measured 17.7 vs 28.7 ms at 1.5M
    slots x 16ch on v5e) whose indices cost an extra argsort to build —
    worth it only when binning is cached (frozen-geometry semantic stage);
    chain_reduce_indices() fills them at cache-build time.

    gid_order        [aligned_cap]  slot ids sorted by gaussian id (stable)
    gauss_offsets    [N+1]          exclusive slot-count prefix per gaussian
    gauss_csum       [N+1]          inclusive slot-count prefix per gaussian
    tile_chunk_start [num_tiles+1]  first chunk index per tile (real chunks
                                    are tile-ascending, so tile t owns chunks
                                    [start[t], start[t+1])); cache-build-time
                                    extra enabling tile-subset mini bundles
                                    (select_tiles_bundle)
    """
    aligned_gid: jnp.ndarray
    chunk_tile: jnp.ndarray
    chunk_rank: jnp.ndarray
    gid_order: Optional[jnp.ndarray] = None
    gauss_offsets: Optional[jnp.ndarray] = None
    gauss_csum: Optional[jnp.ndarray] = None
    tile_chunk_start: Optional[jnp.ndarray] = None


def select_tiles_bundle(sorted_gid: jnp.ndarray,
                        tile_bounds: jnp.ndarray,
                        sel_tiles: jnp.ndarray, chunk_cap: int, n: int,
                        align: int = ALIGN):
    """Mini ALIGNED bundle covering only `sel_tiles` (sorted ascending,
    UNIQUE, K tiles), sourced from the compact-sorted layout: tile t's slots
    are the contiguous run sorted_gid[tile_bounds[t]:tile_bounds[t+1]]
    (tile_bounds [num_tiles+1] is the visit cache's pair-space range table).
    The aligned kernels then render just those tiles' chunks, writing only
    their rows of the full [num_tiles, ...] output (unselected rows are never
    visited NOR read downstream).

    Returns (mini_gid [chunk_cap*align + K*align], mini_tile, mini_rank,
    n_trunc): the extra K chunks at the tail carry the init-only rank for
    selected-but-empty tiles (kernels zero their output rows) and the skip
    rank otherwise. Chunks beyond chunk_cap are truncated DEEPEST-first per
    tile (they sit behind the earlier chunks in blend order, where
    transmittance is lowest); n_trunc counts them (in chunks).

    This powers the tile-subsampled multi-view contrastive loss — an
    opt-in TPU-native speedup with no reference equivalent (the reference
    renders all five full views every 10th iteration,
    train_semantic.py:145-172)."""
    K = sel_tiles.shape[0]
    n_chunks_mini = chunk_cap + K
    per_tile_cap = max(chunk_cap // K, 1)
    starts_p = tile_bounds[sel_tiles]                        # [K] pair units
    cnt_p = tile_bounds[sel_tiles + 1] - starts_p            # [K] pair units
    cnt_full = (cnt_p + align - 1) // align                  # [K] chunks
    cnt = jnp.minimum(cnt_full, per_tile_cap)                # per-tile clamp
    off_incl = jnp.cumsum(cnt)
    off = off_incl - cnt                                     # exclusive
    total_mini = off_incl[-1]
    n_trunc = jnp.sum(cnt_full - cnt)

    j = jnp.arange(chunk_cap, dtype=jnp.int32)
    t_idx = jnp.searchsorted(off_incl, j, side="right").astype(jnp.int32)
    t_idx = jnp.clip(t_idx, 0, K - 1)
    rank = j - off[t_idx]
    valid = j < total_mini
    # leftover slots between the real run and the tail: pin to the FIRST
    # empty tile when empties exist (its init-only chunk comes right after,
    # keeping that block's visits consecutive), else to the last real tile
    empty = cnt == 0
    n_empty = jnp.sum(empty.astype(jnp.int32))
    last_t = sel_tiles[jnp.clip(t_idx[jnp.maximum(total_mini - 1, 0)],
                                0, K - 1)]
    first_empty = jnp.min(jnp.where(empty, sel_tiles, jnp.int32(2 ** 30)))
    leftover_pin = jnp.where(n_empty > 0, first_empty, last_t)
    mini_tile = jnp.where(valid, sel_tiles[t_idx], leftover_pin)
    mini_rank = jnp.where(valid, rank, n_chunks_mini)
    # K tail chunks: init-only for selected-but-empty tiles (they own no
    # real chunk, so nothing else zero-initializes their output row). The
    # empties are COMPACTED to the front of the tail, ascending, and the
    # remaining skip slots all pin to the last empty (or last real) tile —
    # interleaving skips between empty inits would split a block's visit
    # run, and Pallas TPU flushes stale VMEM over it (same invariant as
    # bin_gaussians' leftover-chunk rule).
    e_rank = jnp.cumsum(empty.astype(jnp.int32)) - empty.astype(jnp.int32)
    tile_of_rank = jnp.full((K,), -1, jnp.int32).at[
        jnp.where(empty, e_rank, K)].set(sel_tiles, mode="drop")
    last_empty = jnp.max(jnp.where(empty, sel_tiles, -1))
    pin = jnp.where(n_empty > 0, jnp.maximum(last_empty, 0), last_t)
    kk = jnp.arange(K, dtype=jnp.int32)
    in_empty = kk < n_empty
    tail_tile = jnp.where(in_empty, tile_of_rank[kk], pin)
    tail_rank = jnp.where(in_empty, n_chunks_mini + 1, n_chunks_mini)
    mini_tile = jnp.concatenate([mini_tile, tail_tile])
    mini_rank = jnp.concatenate([mini_rank, tail_rank])

    lane = jnp.arange(align, dtype=jnp.int32)
    # pair-space source: within-tile pair index = rank*align + lane, valid
    # while below the tile's (unclamped) pair count — the run is contiguous
    # in sorted space, not chunk-aligned
    pairpos = (rank[:, None] * align + lane[None, :])        # [cap, align]
    slot_src = (starts_p[t_idx][:, None] + pairpos).reshape(-1)
    lane_ok = (pairpos < cnt_p[t_idx][:, None]).reshape(-1)
    gid = jnp.where(jnp.repeat(valid, align) & lane_ok,
                    sorted_gid[jnp.clip(slot_src, 0,
                                        sorted_gid.shape[0] - 1)], n)
    gid = jnp.concatenate([gid, jnp.full((K * align,), n, jnp.int32)])
    return (gid.astype(jnp.int32), mini_tile.astype(jnp.int32),
            mini_rank.astype(jnp.int32), n_trunc)


def chain_reduce_indices(aligned_gid: jnp.ndarray, n: int):
    """Build the gather+cumsum reduction indices from an aligned gid list.

    One stable sort over the slots (cache-build-time only). Sentinel slots
    (gid == n) sort last and land in segment n, which maps to the packed
    sentinel zero row — their grads are exact zeros either way."""
    acap = aligned_gid.shape[0]
    iota = jnp.arange(acap, dtype=jnp.int32)
    sorted_gid, gid_order = jax.lax.sort((aligned_gid, iota), num_keys=1)
    gauss_ids = jnp.arange(n + 1, dtype=aligned_gid.dtype)
    gauss_csum = jnp.searchsorted(sorted_gid, gauss_ids,
                                  side="right").astype(jnp.int32)
    gauss_offsets = jnp.searchsorted(sorted_gid, gauss_ids,
                                     side="left").astype(jnp.int32)
    return gid_order, gauss_offsets, gauss_csum


class VisitLayout(NamedTuple):
    """Compact-sorted layout (round-3 redesign): pairs stay at their SORTED
    positions — no per-tile chunk alignment, so the pack gather and the
    backward reduction run over exactly pair_cap rows instead of the aligned
    layout's ~1.7x inflated capacity, and the 13 ms aligned-gid scatter
    disappears (the sorted gid list IS the slot list).

    The kernel grid walks (chunk, tile)-intersection VISITS: chunk c of 128
    sorted pairs is visited once per tile whose [start, end) range intersects
    it, with the slot range [s0, s1) masked in-kernel. Visits are generated
    tile-ascending (chunk indices are then non-decreasing), so both the input
    chunk blocks and the per-tile output blocks see consecutive revisits —
    the Pallas TPU invariant that makes resident-buffer carries exact.
    Empty tiles get one s0==s1 visit (output init only); chunks past the last
    real pair get tail visits (masked empty) so the backward kernel's output
    blocks are all zero-initialized; remaining padding visits pin to the last
    chunk/tile.

    visit_chunk  [V]  sorted-pair chunk index per visit
    visit_tile   [V]  tile whose range this visit serves
    visit_s0/s1  [V]  slot range [s0, s1) of the chunk belonging to the tile
    visit_tstart [V]  tile_start of the tile (global slot base for the
                      within-tile contributor numbering)
    gid_order / gauss_offsets / gauss_csum: optional chain-reduce indices
    (chain_reduce_indices over sorted_gid), cache-build-time extra.
    """
    visit_chunk: jnp.ndarray
    visit_tile: jnp.ndarray
    visit_s0: jnp.ndarray
    visit_s1: jnp.ndarray
    visit_tstart: jnp.ndarray
    gid_order: Optional[jnp.ndarray] = None
    gauss_offsets: Optional[jnp.ndarray] = None
    gauss_csum: Optional[jnp.ndarray] = None


def build_visits(tile_start: jnp.ndarray, tile_end: jnp.ndarray,
                 total: jnp.ndarray, pair_cap: int, num_tiles: int,
                 chunk: int = ALIGN) -> VisitLayout:
    """Visit list for the compact-sorted layout. pair_cap % chunk == 0."""
    assert pair_cap % chunk == 0, pair_cap
    n_chunks = pair_cap // chunk
    s = jnp.minimum(tile_start, pair_cap)
    e = jnp.minimum(tile_end, pair_cap)
    nonempty = e > s
    c_lo = jnp.minimum(s // chunk, n_chunks - 1)
    nv = jnp.where(nonempty, (e + chunk - 1) // chunk - c_lo, 1)
    voff = jnp.cumsum(nv)
    v_real = voff[-1]
    v_cap = n_chunks + num_tiles
    j = jnp.arange(v_cap, dtype=jnp.int32)
    t_of = jnp.clip(jnp.searchsorted(voff, j, side="right"
                                     ).astype(jnp.int32), 0, num_tiles - 1)
    rank = j - (voff - nv)[t_of]
    real = j < v_real
    covered = jnp.minimum(total, pair_cap)
    c_tail0 = (covered + chunk - 1) // chunk
    k_tail = j - v_real
    tail_ok = k_tail < n_chunks - c_tail0
    vchunk = jnp.where(real, c_lo[t_of] + rank,
                       jnp.where(tail_ok, c_tail0 + k_tail, n_chunks - 1))
    vchunk = jnp.clip(vchunk, 0, n_chunks - 1)
    vtile = jnp.where(real, t_of, num_tiles - 1)
    lo = vchunk * chunk
    vs0 = jnp.where(real, jnp.clip(s[t_of] - lo, 0, chunk), 0)
    vs1 = jnp.where(real, jnp.clip(e[t_of] - lo, 0, chunk), 0)
    vtstart = jnp.where(real, s[t_of], 0)
    return VisitLayout(visit_chunk=vchunk.astype(jnp.int32),
                       visit_tile=vtile.astype(jnp.int32),
                       visit_s0=vs0.astype(jnp.int32),
                       visit_s1=vs1.astype(jnp.int32),
                       visit_tstart=vtstart.astype(jnp.int32))


def aligned_cap(pair_cap: int, num_tiles: int, align: int = ALIGN) -> int:
    """Aligned-layout capacity. Slack beyond pair_cap covers per-tile
    chunk-rounding plus one chunk per empty tile; the worst case is
    num_tiles chunks, but reserving it all made the pack gather and the
    kernel grid up to ~50% sentinel slots at 1080p. Reserve half (typical
    scenes use well under it) — bin_gaussians counts chunk overflow into
    n_dropped, so callers' grow-and-retry loops handle the pathological
    mostly-empty-frame case."""
    return ((pair_cap + align - 1) // align + num_tiles // 2 + 64) * align


class BinningOut(NamedTuple):
    tile_indices: Optional[jnp.ndarray]  # [num_tiles, tile_cap] int32; N sentinel
    tile_count: jnp.ndarray     # [num_tiles] int32 (uncapped true count)
    tile_start: jnp.ndarray     # [num_tiles] int32 offsets into the sorted list
    sorted_gid: jnp.ndarray     # [pair_cap] int32 (sentinel N beyond total)
    total_pairs: jnp.ndarray    # [] int32
    n_dropped: jnp.ndarray      # [] int32 pairs dropped by pair_cap/tile_cap
    aligned: Optional[AlignedLayout]
    visits: Optional["VisitLayout"] = None


def dilate_rects(rect_min: jnp.ndarray, rect_max: jnp.ndarray,
                 tiles_touched: jnp.ndarray, grid_x: int, grid_y: int,
                 dilate_tiles: int):
    """Expand visible gaussians' tile rects by `dilate_tiles` per side,
    clamped to the grid; recount tiles_touched. Invisible gaussians
    (tiles_touched == 0) stay empty — dilation must not resurrect culled
    splats."""
    vis = tiles_touched > 0
    d = jnp.int32(dilate_tiles)
    gmax = jnp.array([grid_x, grid_y], jnp.int32)
    rmin = jnp.where(vis[:, None], jnp.maximum(rect_min - d, 0), rect_min)
    rmax = jnp.where(vis[:, None], jnp.minimum(rect_max + d, gmax), rect_max)
    tiles = (rmax[:, 0] - rmin[:, 0]) * (rmax[:, 1] - rmin[:, 1])
    touched = jnp.where(vis, tiles, 0).astype(jnp.int32)
    return rmin, rmax, touched


def bin_gaussians(pre: PreprocessOut, width: int, height: int,
                  pair_cap: int, tile_cap: int, tile: int = 16,
                  layout: str = "padded", align: int = ALIGN,
                  dilate_tiles: int = 0) -> BinningOut:
    """layout: 'padded' | 'aligned' | 'visits' | 'both'; `align` is the
    aligned-layout chunk size (must equal the Pallas kernels' chunk).

    dilate_tiles > 0 expands every visible gaussian's tile rect by that many
    tiles per side (clamped to the grid), building a SUPERSET binning valid
    for any nearby camera whose fresh rects stay inside the dilated ones
    (rendered exactly through cfg.clip_rect's in-kernel rect gate)."""
    n = pre.depth.shape[0]
    grid_x = (width + tile - 1) // tile
    grid_y = (height + tile - 1) // tile
    num_tiles = grid_x * grid_y

    tiles_touched = jax.lax.stop_gradient(pre.tiles_touched)
    depth = jax.lax.stop_gradient(pre.depth)
    rect_min = pre.rect_min
    rect_max = pre.rect_max
    if dilate_tiles:
        rect_min, rect_max, tiles_touched = dilate_rects(
            rect_min, rect_max, tiles_touched, grid_x, grid_y, dilate_tiles)

    # exclusive prefix sum → start offset per gaussian (rasterizer_impl.cu:283)
    csum = jnp.cumsum(tiles_touched)
    total = csum[-1]
    offsets = csum - tiles_touched  # exclusive

    # interval-expand: slot j belongs to gaussian g with offsets[g] <= j < csum[g]
    scatter_pos = jnp.minimum(offsets, pair_cap)
    slot_valid = jnp.arange(pair_cap, dtype=jnp.int32) < jnp.minimum(total, pair_cap)
    if n >= (1 << 21):
        # fallback scale (>2M gaussians): dedicated marker-ones gid chain
        marker = jnp.zeros((pair_cap + 1,), jnp.int32)
        marker = marker.at[scatter_pos].add(jnp.ones((n,), jnp.int32))
        gid = jnp.cumsum(marker[:pair_cap]) - 1                  # [pair_cap]
        gid = jnp.where(slot_valid, gid, 0)

    tile_bits = max(int(np.ceil(np.log2(num_tiles + 2))), 1)
    # ≤22 depth bits keeps the downstream f32-exactness margin; clamp after
    # the cast so the deepest gaussian cannot round up into the next tile's
    # key range
    depth_bits = min(22, 31 - tile_bits)
    # merged rect|depth chain (below): when rect_min coords and the quantized
    # depth fit one non-negative int32 together, the expand runs 3 broadcast
    # chains instead of 4 (each chain is a 1-D scatter + [pair_cap] cumsum)
    bits_x = max(int(np.ceil(np.log2(grid_x + 1))), 1)
    bits_y = max(int(np.ceil(np.log2(grid_y + 1))), 1)
    merged_rect_depth = bits_x + bits_y + 12 <= 31
    if merged_rect_depth:
        depth_bits = min(depth_bits, 31 - bits_x - bits_y)
    # per-gaussian quantized depth (pair slots inherit their gaussian's value)
    g_valid = tiles_touched > 0
    dmin = jnp.min(jnp.where(g_valid, depth, jnp.inf))
    dmax = jnp.max(jnp.where(g_valid, depth, -jnp.inf))
    dqg = jnp.clip((depth - dmin) / jnp.maximum(dmax - dmin, 1e-12), 0.0, 1.0)
    dqg = jnp.clip((dqg * ((1 << depth_bits) - 1)).astype(jnp.int32),
                   0, (1 << depth_bits) - 1)

    # broadcast per-gaussian values into pair space. TPU random row gathers
    # cost ~8 ns/row — a [pair_cap] gather dominated binning — but pair slots
    # are grouped by gaussian in INDEX order, so a segmented broadcast is one
    # scatter-add of adjacent DIFFERENCES at the run starts plus one int32
    # cumsum (exact; empty runs telescope through the shared start slot).
    # Columns: pair offset, rect fields packed 10|10|10 (rw | rmin_y |
    # rmin_x, good to 1023 tiles per axis ≈ 16K resolution), quantized depth.
    rw_g = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1)

    # one 1-D scatter+cumsum per column: a single [pair_cap, 3] buffer makes
    # XLA pick a transposed {0,1} layout to please the 2-D cumsum, turning
    # the scatter into strided single-word writes (measured 13 ms vs 3 ms
    # for the three 1-D chains at 1.65M pairs on v5e)
    def seg_broadcast(col):
        d = col - jnp.concatenate([jnp.zeros((1,), jnp.int32), col[:-1]])
        buf = jnp.zeros((pair_cap + 1,), jnp.int32).at[scatter_pos].add(d)
        return jnp.cumsum(buf[:pair_cap])

    arange_pairs = jnp.arange(pair_cap, dtype=jnp.int32)
    if n < (1 << 21):
        # round-5: pack the GAUSSIAN ID (<=21 bits) | rect width (10 bits)
        # into one chain, which makes the separate marker-ones gid chain
        # REDUNDANT: consecutive non-empty gaussians have distinct packed
        # values, so run starts are exactly the slots where the broadcast
        # changes, and the pair offset is a cummax of the start positions.
        # One scatter+cumsum chain fewer — the probe_sort_floor split shows
        # the expand scatters (not the sort, 1.7 ms) dominate binning
        # (8.6 of 13.7 ms at 1080p).
        bA = seg_broadcast(((jnp.arange(n, dtype=jnp.int32) << 10)
                            | rw_g).astype(jnp.int32))
        gid = bA >> 10
        rw = jnp.maximum(bA & 1023, 1)
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), bA[1:] != bA[:-1]])
        b_off = jax.lax.cummax(jnp.where(is_start, arange_pairs, 0))
        gid = jnp.where(slot_valid, gid, 0)
    elif pair_cap < (1 << 21):
        # pack pair offset (21 bits) | rect width (10 bits) into one chain
        b1 = seg_broadcast(((offsets.astype(jnp.int32) << 10)
                            | rw_g).astype(jnp.int32))
        b_off = b1 >> 10
        rw = jnp.maximum(b1 & 1023, 1)
    else:
        b_off = seg_broadcast(offsets.astype(jnp.int32))
        rw = jnp.maximum(seg_broadcast(rw_g.astype(jnp.int32)), 1)
    if merged_rect_depth:
        # rmin_y | rmin_x | quantized depth in ONE chain (saves a scatter +
        # [pair_cap] cumsum; at 1080p: 7 + 7 + 17 bits)
        b2 = seg_broadcast(((rect_min[:, 1] << (bits_x + depth_bits))
                            | (rect_min[:, 0] << depth_bits)
                            | dqg).astype(jnp.int32))
        b_depth = b2 & ((1 << depth_bits) - 1)
        rmin_x = (b2 >> depth_bits) & ((1 << bits_x) - 1)
        rmin_y = b2 >> (bits_x + depth_bits)
    else:
        b_rect = seg_broadcast(((rect_min[:, 1] << 10)
                                | rect_min[:, 0]).astype(jnp.int32))
        b_depth = seg_broadcast(dqg)
        rmin_y = (b_rect >> 10) & 1023
        rmin_x = b_rect & 1023
    rank = jnp.where(slot_valid, arange_pairs - b_off, 0)
    if pre.cull_lo is not None and not dilate_tiles:
        # conic pair culling (preprocess.conic_cull_masks): tiles_touched
        # counted only KEPT row-major offsets, so pair rank r maps to the
        # r-th set bit of the per-gaussian 64-bit keep-mask (two more
        # broadcast chains; bit patterns ride the same diff-scatter + cumsum
        # telescoping — int32 wraparound is exact mod 2³²). Ranks past the
        # window population map linearly onto offsets >= 64 (always kept).
        as_i32 = lambda u: jax.lax.bitcast_convert_type(u, jnp.int32)
        as_u32 = lambda i: jax.lax.bitcast_convert_type(i, jnp.uint32)
        m0 = as_u32(seg_broadcast(as_i32(pre.cull_lo)))
        m1 = as_u32(seg_broadcast(as_i32(pre.cull_hi)))
        p0 = jax.lax.population_count(m0).astype(jnp.int32)
        ptot = p0 + jax.lax.population_count(m1).astype(jnp.int32)
        in_win = rank < ptot
        use_hi = rank >= p0
        word = jnp.where(use_hi, m1, m0)
        r = rank - jnp.where(use_hi, p0, 0)
        pos = jnp.zeros_like(rank)
        for half in (16, 8, 4, 2, 1):
            low = word & jnp.uint32((1 << half) - 1)
            cnt = jax.lax.population_count(low).astype(jnp.int32)
            go_hi = r >= cnt
            word = jnp.where(go_hi, word >> half, word)
            r = r - jnp.where(go_hi, cnt, 0)
            pos = pos + jnp.where(go_hi, half, 0)
        offset = jnp.where(in_win, pos + jnp.where(use_hi, 32, 0),
                           64 + rank - ptot)
    else:
        offset = rank
    dy = offset // rw
    dx = offset - dy * rw
    tile_id = (rmin_y + dy) * grid_x + (rmin_x + dx)
    tile_id = jnp.where(slot_valid, tile_id, num_tiles)          # sentinel tile

    # single fused int32 sort key: tile_id in the high bits, depth quantized
    # into the remaining bits (the CUDA reference sorts exact f32 depth bits;
    # sub-quantum depth ties get an arbitrary — but deterministic — order,
    # which only permutes near-coincident splats). One int32 key + payloads
    # sorts ~3x faster than a 2-key lexicographic sort on TPU.
    # is_stable=False: ties within a (tile, depth-quantum) key are already
    # arbitrary-but-deterministic; the unstable variant sorts ~30% faster
    key = tile_id * (1 << depth_bits) + jnp.where(slot_valid, b_depth, 0)
    sorted_key, sorted_gid = jax.lax.sort((key, gid), num_keys=1,
                                          is_stable=False)
    sorted_tile = (sorted_key >> depth_bits).astype(jnp.int32)
    sorted_gid = jnp.where(sorted_tile < num_tiles, sorted_gid, n)

    # per-tile [start, end) ranges (identifyTileRanges, rasterizer_impl.cu:116-138)
    # one searchsorted over num_tiles+1 targets: end[t] == start[t+1] because
    # tile ids are the sort key's high bits (left-search at t+1 lands at the
    # first slot past every tile-t key), halving the range-lookup cost
    tile_ids_all = jnp.arange(num_tiles, dtype=jnp.int32)
    bounds = jnp.searchsorted(sorted_tile,
                              jnp.arange(num_tiles + 1, dtype=jnp.int32),
                              side="left").astype(jnp.int32)
    tile_start = bounds[:num_tiles]
    tile_end = bounds[1:]
    tile_count = tile_end - tile_start

    tile_indices = None
    if layout in ("padded", "both"):
        k_idx = jnp.arange(tile_cap, dtype=jnp.int32)
        flat_pos = tile_start[:, None] + k_idx[None, :]
        in_range = k_idx[None, :] < tile_count[:, None]
        flat_pos = jnp.where(in_range & (flat_pos < pair_cap), flat_pos,
                             pair_cap - 1)
        tile_indices = jnp.where(in_range, sorted_gid[flat_pos], n
                                 ).astype(jnp.int32)

    visits = None
    if layout == "visits":
        assert pair_cap % align == 0, pair_cap
        visits = build_visits(tile_start, tile_end, total, pair_cap,
                              num_tiles, chunk=align)

    aligned = None
    if layout in ("aligned", "both"):
        acap = aligned_cap(pair_cap, num_tiles, align)
        n_chunks = acap // align
        # per-tile aligned segment starts (CHUNK multiples)
        padded_counts = ((tile_count + align - 1) // align) * align
        astart = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                  jnp.cumsum(padded_counts)[:-1]
                                  .astype(jnp.int32)])
        astart_chunks = astart // align
        total_chunks = (astart[-1] + padded_counts[-1]) // align
        qs = jnp.arange(n_chunks, dtype=jnp.int32)
        ct = jnp.searchsorted(astart_chunks, qs, side="right"
                              ).astype(jnp.int32) - 1
        # Tiles with ZERO pairs own no chunk, so no grid step would ever
        # initialize their output block — the kernel would return whatever
        # was in that memory. The aligned capacity reserves >= one spare
        # chunk per tile (aligned_cap), so assign one tail chunk to each
        # empty tile: its slots are all sentinels, the kernel zero-inits the
        # block and writes T=1 (correct empty-tile output).
        empty = tile_count == 0
        ecs = jnp.cumsum(empty.astype(jnp.int32))
        k_tail = qs - total_chunks
        kth_empty = jnp.searchsorted(ecs, k_tail + 1, side="left"
                                     ).astype(jnp.int32)
        # Leftover tail chunks past the empty tiles must NOT use a num_tiles
        # sentinel: the kernels' output BlockSpec clamps it to block
        # num_tiles-1, revisiting that block NON-consecutively whenever any
        # tile is empty and tile num_tiles-1 is not — and Pallas TPU flushes
        # the stale VMEM buffer over its rendered output at grid end. Assign
        # them to the last tile the grid already visited (the last empty tile
        # if any exist, else num_tiles-1, which is then the last real tile)
        # so every output block's visits stay consecutive; their chunk_rank is
        # forced past any real count (below) so all their slots are sentinel
        # gaussians and the kernel's accumulation is a numeric no-op.
        any_empty = ecs[-1] > 0
        last_empty = jnp.max(jnp.where(empty, tile_ids_all, -1))
        leftover_tile = jnp.where(any_empty, jnp.maximum(last_empty, 0),
                                  num_tiles - 1)
        in_empty_range = (k_tail >= 0) & (k_tail < ecs[-1])
        tail_tile = jnp.where(in_empty_range,
                              jnp.clip(kth_empty, 0, num_tiles - 1),
                              leftover_tile)
        is_tail = qs >= total_chunks
        is_leftover = is_tail & ~in_empty_range
        chunk_tile = jnp.where(is_tail, tail_tile, ct)
        # ranks: real chunks 0..; empty-tile tail chunks n_chunks+1 (kernels
        # run init-only: zero output + T=1, skipping the splat body on their
        # all-sentinel slots); leftover tail chunks n_chunks (skip entirely)
        chunk_rank = jnp.where(
            is_tail, jnp.where(is_leftover, n_chunks, n_chunks + 1),
            qs - astart_chunks[jnp.clip(ct, 0, num_tiles - 1)])
        # sorted position j of tile t maps to aligned slot j + delta[t],
        # delta = astart - tile_start. Broadcast delta over the (ascending)
        # sorted_tile runs with the same diff-scatter + cumsum telescoping as
        # above (absent tiles share a start slot and telescope through),
        # avoiding a [pair_cap] random gather.
        delta = astart - tile_start                        # [num_tiles]
        ddiff = delta - jnp.concatenate([jnp.zeros(1, jnp.int32), delta[:-1]])
        dbuf = jnp.zeros((pair_cap + 1,), jnp.int32
                         ).at[jnp.minimum(tile_start, pair_cap)].add(ddiff)
        delta_b = jnp.cumsum(dbuf[:pair_cap])
        st_ok = sorted_tile < num_tiles
        a_of_sorted = arange_pairs + delta_b
        # gaussian id per aligned slot, by scattering the sorted ids to their
        # aligned slots (cheaper than the equivalent gather; unwritten slots
        # — per-tile alignment padding, empty/leftover chunks — keep the
        # sentinel id n, which the kernels treat as a zero row)
        aligned_gid = jnp.full((acap,), n, jnp.int32).at[
            jnp.where(st_ok, a_of_sorted, acap)].set(sorted_gid, mode="drop")
        aligned = AlignedLayout(
            aligned_gid=aligned_gid.astype(jnp.int32),
            chunk_tile=chunk_tile.astype(jnp.int32),
            chunk_rank=jnp.clip(chunk_rank, 0, n_chunks + 1).astype(jnp.int32),
            tile_chunk_start=jnp.concatenate(
                [astart_chunks, total_chunks[None]]).astype(jnp.int32))

    # pairs dropped: beyond pair_cap (plus per-tile beyond tile_cap for padded)
    n_dropped = jnp.maximum(total - pair_cap, 0)
    if layout in ("aligned", "both"):
        # aligned chunk overflow: per-tile chunk rounding + one chunk per
        # empty tile exceeded the slack in aligned_cap — data beyond acap was
        # dropped and/or some empty tiles got no init chunk. Report it (in
        # pair units) so grow-and-retry loops recompile with larger caps.
        chunks_needed = total_chunks + ecs[-1]
        n_dropped = n_dropped + jnp.maximum(
            chunks_needed - acap // align, 0) * align
    if layout in ("padded", "both"):
        n_dropped = n_dropped + jnp.sum(jnp.maximum(tile_count - tile_cap, 0))

    return BinningOut(tile_indices=tile_indices,
                      tile_count=tile_count, tile_start=tile_start,
                      sorted_gid=sorted_gid, total_pairs=total,
                      n_dropped=n_dropped, aligned=aligned, visits=visits)
