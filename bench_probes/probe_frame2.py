#!/usr/bin/env python
"""TPU probe: locate the gap between (pre+bin+gather+kernel = 47 ms) and the
full rasterize frame (58 ms) at 1080p/300k. Stages build up the real
rasterize path piece by piece."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WARMUP = 12
ITERS = 10


def chain(fn, label):
    import jax
    import jax.numpy as jnp
    s = jnp.zeros(())
    out = fn(s)
    jax.block_until_ready(out)
    for _ in range(WARMUP):
        out = fn(out)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(out)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{label:<56s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_bench_scene
    from instascene_tpu.ops.binning import bin_gaussians
    from instascene_tpu.ops.blend_pallas import pack_flat_cols
    from instascene_tpu.ops.blend_visits import blend_visits_diff
    from instascene_tpu.ops.preprocess import preprocess_gaussians
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              rasterize)
    from instascene_tpu.ops.rasterize_pallas import maps_from_pallas

    width, height = 1920, 1080
    tile = 16
    grid_x = (width + 15) // 16
    num_tiles = grid_x * ((height + 15) // 16)
    pair_cap = 1399296
    params, make_cam = make_bench_scene(n=300_000)
    n = params.capacity
    cam = make_cam(0, width, height)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    xyz, sc, rot = (params.xyz, params.scaling_activated(),
                    params.rotation_normalized())
    opa = params.opacity_activated()[:, 0]
    shs = params.features()

    def stage(upto):
        @jax.jit
        def f(s):
            pre = preprocess_gaussians(xyz + s * 1e-30, sc, rot, cm.w2v,
                                       cm.full_proj, cm.campos, width, height,
                                       shs=shs, sh_degree=3, tile=tile,
                                       alive=params.alive)
            b = bin_gaussians(pre, width, height, pair_cap, 0, tile=tile,
                              layout="visits")
            flat = pack_flat_cols(pre.T, pre.xy, pre.normal_view, opa,
                                  pre.color)
            v = b.visits
            bundle = (b.sorted_gid, v.visit_chunk, v.visit_tile, v.visit_s0,
                      v.visit_s1, v.visit_tstart)
            out, iout = blend_visits_diff(flat, bundle, num_tiles, tile,
                                          grid_x, 0, False)
            if upto == "kernel":
                return (out[0, 0, 0] + iout[0, 0, 0].astype(jnp.float32)
                        ) * 1e-20 + s
            maps = maps_from_pallas(out, iout, width, height, tile, 0)
            if upto == "color":
                return maps["color_nobg"][0, 0, 0] * 1e-20 + s
            r = sum(jnp.asarray(m).ravel()[0]
                    for k, m in maps.items() if m is not None)
            return r.astype(jnp.float32) * 1e-20 + s
        return f

    chain(stage("kernel"), "pre+bin+pack+kernel (diff fwd, no maps)")
    chain(stage("color"), "  + color map only")
    chain(stage("all"), "  + all maps")

    cfg = RasterizeConfig(width=width, height=height, pair_cap=pair_cap,
                          impl="pallas")

    @jax.jit
    def full_frame(s):
        out = rasterize(xyz + s * 1e-30, sc, rot, opa, cm, jnp.zeros(3),
                        cfg, shs=shs, sh_degree=3)
        return out.blend.color[0, 0, 0] * 1e-20 + s
    chain(full_frame, "full rasterize()")

    # t_offset tap: geometry training passes a zero t_offset for the densify
    # grad hack — does the extra add + cross recompute cost?
    @jax.jit
    def full_frame_t(s):
        t0 = jnp.zeros((n, 3, 3))
        out = rasterize(xyz + s * 1e-30, sc, rot, opa, cm, jnp.zeros(3),
                        cfg, shs=shs, sh_degree=3, t_offset=t0,
                        alive=params.alive)
        return out.blend.color[0, 0, 0] * 1e-20 + s
    chain(full_frame_t, "full rasterize(t_offset=0, alive)")


if __name__ == "__main__":
    main()
