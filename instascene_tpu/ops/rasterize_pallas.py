"""Pallas-backed rasterize path: pack → kernel → maps.

Forward-only entry (used for inference/benchmarks) plus the custom-VJP
differentiable blend wrapper (blend_pallas_diff) used by training once the
backward kernel is validated."""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .binning import bin_gaussians
from .blend import BlendOut
from .blend_pallas import CHUNK, blend_fwd_pallas
from .preprocess import preprocess_gaussians


def pack_inputs(pre, opacities, extras, tile_indices):
    """Gather per-gaussian attrs into the packed [T, D, K] tensor."""
    from .blend_pallas import pack_flat_cols
    flat = pack_flat_cols(pre.T, pre.xy, pre.normal_view, opacities,
                          pre.color, extras)
    packed = flat[tile_indices]                  # [T, K, D]
    return jnp.transpose(packed, (0, 2, 1))     # [T, D, K]


def pallas_tiles_to_map(x, width, height, tile):
    """[T, C, P2] tile-major kernel output → [H, W, C] image map."""
    grid_x = (width + tile - 1) // tile
    grid_y = (height + tile - 1) // tile
    c = x.shape[1]
    x = x.reshape(grid_y, grid_x, c, tile, tile)
    x = jnp.transpose(x, (0, 3, 1, 4, 2))
    return x.reshape(grid_y * tile, grid_x * tile, c)[:height, :width]


def maps_from_pallas(out, iout, width, height, tile, n_extra):
    """[T, C, P2] kernel outputs → BlendOut with [H, W, ·] maps."""

    def to_map(x):
        return pallas_tiles_to_map(x, width, height, tile)

    maps = to_map(out)
    imaps = to_map(iout)
    E = n_extra
    # rows 10+E, 11+E are m1tot/m2tot backward residuals — not exposed
    return dict(color_nobg=maps[..., 0:3], depth=maps[..., 3],
                normal=maps[..., 4:7], median_depth=maps[..., 7],
                distortion=maps[..., 8], final_T=maps[..., 9],
                extra=maps[..., 10:10 + E],
                n_contrib=imaps[..., 0], med_slot=imaps[..., 1])


@partial(jax.jit, static_argnames=("width", "height", "sh_degree", "tile",
                                   "pair_cap", "tile_cap", "n_extra",
                                   "interpret"))
def rasterize_pallas_fwd(means3d, scales, rotations, opacities, w2v,
                         full_proj, campos, bg, colors, shs, extras, alive,
                         width: int, height: int, sh_degree: int,
                         tile: int = 16, pair_cap: int = 0, tile_cap: int = 0,
                         n_extra: int = 0, interpret: bool = False):
    """Forward-only Pallas render. Returns (blend-maps dict, radii, visible,
    depth, n_dropped)."""
    n = means3d.shape[0]
    pair_cap = pair_cap or max(64 * 1024, 4 * n)
    tile_cap = tile_cap or 2048
    tile_cap = ((tile_cap + CHUNK - 1) // CHUNK) * CHUNK
    grid_x = (width + tile - 1) // tile

    pre = preprocess_gaussians(means3d, scales, rotations, w2v, full_proj,
                               campos, width, height, color=colors, shs=shs,
                               sh_degree=sh_degree, tile=tile, alive=alive)
    binning = bin_gaussians(pre, width, height, pair_cap, tile_cap, tile=tile)
    packed = pack_inputs(pre, opacities, extras, binning.tile_indices)
    fout = blend_fwd_pallas(packed, binning.tile_count.astype(jnp.int32),
                            tile, grid_x, n_extra, interpret=interpret)
    maps = maps_from_pallas(fout.out, fout.iout, width, height, tile, n_extra)
    maps["color"] = maps["color_nobg"] + maps["final_T"][..., None] * bg
    return (maps, pre.radius.astype(jnp.int32),
            pre.valid & (pre.radius > 0), pre.depth, binning.n_dropped)
