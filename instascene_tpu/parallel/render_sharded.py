"""Image-space (tile-slab) sharded rendering over a device mesh.

Gaussian-axis sharding cannot parallelize the blend (alpha compositing is
order-dependent per pixel), but IMAGE space is embarrassingly parallel: each
device renders a horizontal slab of the frame. The slab's pixel origin is
folded into the splat→pixel homography at preprocess time (see
ops/preprocess.ndc2pix_rows), so binning and blending run completely
unmodified on local coordinates — and both scale with the slab's pair count,
not the frame's. Per-gaussian preprocessing (elementwise, cheap) is
replicated; there are NO collectives in the hot path — the sharded output's
shards ARE the slabs.

The reference is single-GPU (SURVEY.md §2.3); this is TPU-native scaling the
CUDA stack lacks. Interactive use: ~Nx the single-chip 1080p fps on an
N-chip v5e host (each chip's sort/blend sees ~1/N of the pairs).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.rasterize import CameraMats, RasterizeConfig, rasterize


def build_sharded_render(mesh: Mesh, width: int, height: int,
                         pair_cap: int = 0, impl: str = "auto",
                         n_extra: int = 0, sh_degree: int = 3,
                         tile: int = 16):
    """Returns fn(xyz, scaling, rotation, opacity, shs, extras|None, w2v,
    full_proj, campos, bg) -> (color [H,W,3], alpha [H,W], extra [H,W,E],
    n_dropped []) — jitted over `mesh`, one horizontal slab per device on the
    'data' axis. n_dropped (max over slabs) must be checked by the caller:
    a nonzero value means a slab overflowed its pair cap and silently lost
    its deepest splats — re-build with a larger pair_cap.

    `height` must divide evenly into tile-aligned slabs across the mesh."""
    from jax.experimental.shard_map import shard_map

    n_dev = mesh.devices.size
    if height % (n_dev * tile):
        raise ValueError(f"height {height} must be a multiple of "
                         f"{n_dev * tile} (devices x tile)")
    h_local = height // n_dev
    # per-device caps sized for a slab (callers can override)
    cfg = RasterizeConfig(width=width, height=h_local, tile=tile,
                          pair_cap=pair_cap, impl=impl)

    with_extras = n_extra > 0

    def per_device(xyz, scaling, rotation, opacity, shs, extras,
                   w2v, full_proj, campos, bg):
        d = jax.lax.axis_index("data")
        y0 = (d * h_local).astype(jnp.float32)
        out = rasterize(xyz, scaling, rotation, opacity,
                        CameraMats(w2v, full_proj, campos), bg, cfg,
                        shs=shs, sh_degree=sh_degree,
                        extras=extras if with_extras else None,
                        y_offset=y0, full_height=height)
        b = out.blend
        extra = (b.extra if with_extras
                 else jnp.zeros(b.color.shape[:2] + (0,)))
        return (b.color, b.alpha, extra,
                jax.lax.pmax(out.n_dropped, "data"))

    rep = P()
    slab = P("data")
    fn = shard_map(
        per_device, mesh=mesh,
        in_specs=(rep,) * 10,
        out_specs=(slab, slab, slab, rep),
        check_rep=False)
    return jax.jit(fn)
