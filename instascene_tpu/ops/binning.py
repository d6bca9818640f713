"""Tile binning: (gaussian, tile) pair expansion, depth sort, per-tile ranges.

TPU-native replacement for cuda_rasterizer/rasterizer_impl.cu:70-138
(duplicateWithKeys + CUB radix sort + identifyTileRanges). XLA needs static
shapes, so pairs live in a fixed-capacity buffer (`pair_cap`) with overflow
reporting, and the per-tile gaussian lists are materialized as a padded
[num_tiles, tile_cap] index matrix gathered from the sorted flat list.

The expansion uses the scatter-ones + cumsum "interval expand" trick instead of
one-thread-per-gaussian atomics; sorting uses a lexicographic (tile, depth)
jax.lax.sort instead of packed 64-bit radix keys. Deterministic by construction.
All outputs are index data — gradients never flow through this module.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .preprocess import PreprocessOut


class BinningOut(NamedTuple):
    tile_indices: jnp.ndarray   # [num_tiles, tile_cap] int32 gaussian ids; N = sentinel
    tile_count: jnp.ndarray     # [num_tiles] int32 (uncapped true count)
    tile_start: jnp.ndarray     # [num_tiles] int32 offsets into the sorted list
    sorted_gid: jnp.ndarray     # [pair_cap] int32 (sentinel N beyond total)
    total_pairs: jnp.ndarray    # [] int32
    n_dropped: jnp.ndarray      # [] int32 pairs dropped by pair_cap/tile_cap


def bin_gaussians(pre: PreprocessOut, width: int, height: int,
                  pair_cap: int, tile_cap: int, tile: int = 16) -> BinningOut:
    n = pre.depth.shape[0]
    grid_x = (width + tile - 1) // tile
    grid_y = (height + tile - 1) // tile
    num_tiles = grid_x * grid_y

    tiles_touched = jax.lax.stop_gradient(pre.tiles_touched)
    depth = jax.lax.stop_gradient(pre.depth)
    rect_min = pre.rect_min
    rect_max = pre.rect_max

    # exclusive prefix sum → start offset per gaussian (rasterizer_impl.cu:283)
    csum = jnp.cumsum(tiles_touched)
    total = csum[-1]
    offsets = csum - tiles_touched  # exclusive

    # interval-expand: slot j belongs to gaussian g with offsets[g] <= j < csum[g]
    marker = jnp.zeros((pair_cap + 1,), jnp.int32)
    scatter_pos = jnp.minimum(offsets, pair_cap)
    marker = marker.at[scatter_pos].add(jnp.ones((n,), jnp.int32))
    gid = jnp.cumsum(marker[:pair_cap]) - 1                      # [pair_cap]
    slot_valid = jnp.arange(pair_cap, dtype=jnp.int32) < jnp.minimum(total, pair_cap)
    gid = jnp.where(slot_valid, gid, 0)

    # decode which tile of the gaussian's rect this pair covers
    rank = jnp.arange(pair_cap, dtype=jnp.int32) - offsets[gid]
    rw = jnp.maximum(rect_max[gid, 0] - rect_min[gid, 0], 1)
    dy = rank // rw
    dx = rank - dy * rw
    tile_id = (rect_min[gid, 1] + dy) * grid_x + (rect_min[gid, 0] + dx)
    tile_id = jnp.where(slot_valid, tile_id, num_tiles)          # sentinel tile

    # single fused int32 sort key: tile_id in the high bits, depth quantized
    # into the remaining bits (the CUDA reference sorts exact f32 depth bits;
    # sub-quantum depth ties get an arbitrary — but deterministic — order,
    # which only permutes near-coincident splats). One int32 key + one payload
    # sorts ~3x faster than a 2-key lexicographic sort on TPU.
    tile_bits = max(int(np.ceil(np.log2(num_tiles + 2))), 1)
    depth_bits = 31 - tile_bits
    d = depth[gid]
    dmin = jnp.min(jnp.where(slot_valid, d, jnp.inf))
    dmax = jnp.max(jnp.where(slot_valid, d, -jnp.inf))
    dq = jnp.clip((d - dmin) / jnp.maximum(dmax - dmin, 1e-12), 0.0, 1.0)
    dq = (dq * ((1 << depth_bits) - 1)).astype(jnp.int32)
    key = tile_id * (1 << depth_bits) + jnp.where(slot_valid, dq, 0)
    sorted_key, sorted_gid = jax.lax.sort((key, gid), num_keys=1)
    sorted_tile = (sorted_key >> depth_bits).astype(jnp.int32)
    sorted_gid = jnp.where(sorted_tile < num_tiles, sorted_gid, n)

    # per-tile [start, end) ranges (identifyTileRanges, rasterizer_impl.cu:116-138)
    tile_ids_all = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile, tile_ids_all, side="left"
                                  ).astype(jnp.int32)
    tile_end = jnp.searchsorted(sorted_tile, tile_ids_all, side="right"
                                ).astype(jnp.int32)
    tile_count = tile_end - tile_start

    # padded per-tile index matrix (gather from the flat sorted list)
    k_idx = jnp.arange(tile_cap, dtype=jnp.int32)
    flat_pos = tile_start[:, None] + k_idx[None, :]
    in_range = k_idx[None, :] < tile_count[:, None]
    flat_pos = jnp.where(in_range & (flat_pos < pair_cap), flat_pos, pair_cap - 1)
    tile_indices = jnp.where(in_range, sorted_gid[flat_pos], n)
    # pairs dropped: beyond pair_cap plus per-tile beyond tile_cap
    n_dropped = (jnp.maximum(total - pair_cap, 0)
                 + jnp.sum(jnp.maximum(tile_count - tile_cap, 0)))

    return BinningOut(tile_indices=tile_indices.astype(jnp.int32),
                      tile_count=tile_count, tile_start=tile_start,
                      sorted_gid=sorted_gid, total_pairs=total,
                      n_dropped=n_dropped)
