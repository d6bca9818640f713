#!/usr/bin/env python
"""TPU probe: decompose the visit-layout 1080p frame into
preprocess+binning / +gather / full, to find where time went."""

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
    print(f"{label:<52s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_bench_scene
    from instascene_tpu.ops.binning import bin_gaussians
    from instascene_tpu.ops.preprocess import preprocess_gaussians
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache, rasterize)

    width, height = 1920, 1080
    tile = 16
    grid_x = (width + 15) // 16
    num_tiles = grid_x * ((height + 15) // 16)
    params, make_cam = make_bench_scene(n=300_000)
    n = params.capacity
    cam = make_cam(0, width, height)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    cap0 = RasterizeConfig(width=width, height=height).resolved(n).pair_cap
    for _ in range(4):
        _, tc, _ = compute_binning_cache(params, cm, width, height,
                                         pair_cap=cap0, tile_cap=128,
                                         impl="xla")
        total = int(jnp.sum(tc))
        if total < 0.95 * cap0:
            break
        cap0 *= 2
    pair_cap = (int(total * 1.1) + 127) // 128 * 128
    print(f"pairs={total} cap={pair_cap}", flush=True)

    xyz, sc, rot = (params.xyz, params.scaling_activated(),
                    params.rotation_normalized())
    opa = params.opacity_activated()[:, 0]
    shs = params.features()

    @jax.jit
    def pre_bin(s):
        pre = preprocess_gaussians(xyz + s * 1e-30, sc, rot, cm.w2v,
                                   cm.full_proj, cm.campos, width, height,
                                   shs=shs, sh_degree=3, tile=tile,
                                   alive=params.alive)
        b = bin_gaussians(pre, width, height, pair_cap, 0, tile=tile,
                          layout="visits")
        return (b.sorted_gid[0] + b.visits.visit_chunk[0]
                ).astype(jnp.float32) * 1e-20 + s
    chain(pre_bin, "preprocess + binning(visits)")

    @jax.jit
    def pre_bin_gather(s):
        pre = preprocess_gaussians(xyz + s * 1e-30, sc, rot, cm.w2v,
                                   cm.full_proj, cm.campos, width, height,
                                   shs=shs, sh_degree=3, tile=tile,
                                   alive=params.alive)
        b = bin_gaussians(pre, width, height, pair_cap, 0, tile=tile,
                          layout="visits")
        from instascene_tpu.ops.blend_pallas import pack_flat_cols
        flat = pack_flat_cols(pre.T, pre.xy, pre.normal_view, opa, pre.color)
        packed = flat[b.sorted_gid]
        return packed[0, 0] * 1e-20 + s
    chain(pre_bin_gather, "preprocess + binning(visits) + pack gather")

    cfg = RasterizeConfig(width=width, height=height, pair_cap=pair_cap,
                          impl="pallas")

    @jax.jit
    def full_frame(s):
        out = rasterize(xyz + s * 1e-30, sc, rot, opa, cm, jnp.zeros(3),
                        cfg, shs=shs, sh_degree=3)
        return out.blend.color[0, 0, 0] * 1e-20 + s
    chain(full_frame, "full frame (visits)")

    # kernel-only: frozen binning + packed input (upper bound on kernel time)
    cb, tc2, nd2 = compute_binning_cache(params, cm, width, height,
                                         impl="pallas", pair_cap=pair_cap)
    sorted_gid, vch, vt, vs0, vs1, vts = cb[:6]
    rng = np.random.default_rng(0)
    flat0 = jnp.asarray(rng.random((n + 1, 21)).astype(np.float32))
    packed0 = flat0[sorted_gid]
    from instascene_tpu.ops.blend_visits import blend_fwd_pallas_visits

    @jax.jit
    def kern(s):
        f = blend_fwd_pallas_visits(packed0 + s * 1e-30, vt, vch, vs0, vs1,
                                    vts, num_tiles, tile, grid_x, 0)
        return f.out[0, 0, 0] * 1e-20 + s
    chain(kern, "visit fwd kernel only (random packed)")


if __name__ == "__main__":
    main()
