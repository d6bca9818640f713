#!/usr/bin/env python
"""TPU probe (round 4): uniform-profile 1080p frame section split with the
trustworthy timing discipline from ops/gather_tune.py (sum-consumed outputs,
per-call-varying inputs, host-fetch fences, RTT-cancelling K-vs-2K window
differencing) — block_until_ready was observed not blocking on this tunnel.
Cumulative stages; section cost = difference of adjacent stages."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
WARMUP, K = 10, 5


def chain(fn, label):
    import jax.numpy as jnp
    out = fn(jnp.float32(0)); float(out)
    for _ in range(WARMUP): out = fn(out)
    float(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(K): out = fn(out)
        float(out)
        t1 = time.perf_counter()
        for _ in range(2 * K): out = fn(out)
        float(out)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / K * 1e3)
    print(f"{label:<58s} {best:8.2f} ms", flush=True)
    return best


def main():
    import jax, jax.numpy as jnp
    from bench import make_bench_scene
    from instascene_tpu.ops.binning import bin_gaussians
    from instascene_tpu.ops.blend_pallas import pack_flat_cols
    from instascene_tpu.ops.preprocess import preprocess_gaussians
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache,
                                              rasterize)

    width, height = 1920, 1080
    params, make_cam = make_bench_scene(n=300_000)
    cam = make_cam(0, width, height)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    cap0 = RasterizeConfig(width=width, height=height).resolved(
        params.capacity).pair_cap
    _, tc, _ = compute_binning_cache(params, cm, width, height,
                                     pair_cap=cap0 * 2, tile_cap=128,
                                     impl="xla")
    total = int(jnp.sum(tc))
    pair_cap = (int(total * 1.1) + 127) // 128 * 128
    cfg = RasterizeConfig(width=width, height=height, pair_cap=pair_cap)
    rcfg = cfg.resolved(params.capacity)
    print(f"pairs={total} cap={pair_cap} resolved={rcfg.pair_cap}",
          flush=True)

    xyz, sc, rot = (params.xyz, params.scaling_activated(),
                    params.rotation_normalized())
    opa = params.opacity_activated()[:, 0]
    shs = params.features()

    def jitter(s):
        # per-call-varying input: s advances +1.0 per call (exact), the
        # perturbation stays ~1e-24 (never changes any binning decision)
        return xyz * (1.0 + s * 1e-30)

    @jax.jit
    def s_pre(s):
        pre = preprocess_gaussians(jitter(s), sc, rot, cm.w2v, cm.full_proj,
                                   cm.campos, width, height, shs=shs,
                                   sh_degree=3, alive=params.alive,
                                   opacity=params.opacity_activated())
        tot = (jnp.sum(pre.T) + jnp.sum(pre.xy) + jnp.sum(pre.color)
               + jnp.sum(pre.tiles_touched))
        return tot * 1e-20 + s + 1.0
    chain(s_pre, "preprocess (elementwise + SH + opacity rects)")

    @jax.jit
    def s_bin(s):
        pre = preprocess_gaussians(jitter(s), sc, rot, cm.w2v, cm.full_proj,
                                   cm.campos, width, height, shs=shs,
                                   sh_degree=3, alive=params.alive,
                                   opacity=params.opacity_activated())
        b = bin_gaussians(pre, width, height, rcfg.pair_cap, rcfg.tile_cap,
                          layout="visits", align=128)
        tot = (jnp.sum(b.sorted_gid) + jnp.sum(b.visits.visit_tile)
               + jnp.sum(b.visits.visit_s0))
        return jnp.float32(tot) * 1e-20 + s + 1.0
    chain(s_bin, "+ binning (chains + sort + visits)")

    @jax.jit
    def s_gather(s):
        pre = preprocess_gaussians(jitter(s), sc, rot, cm.w2v, cm.full_proj,
                                   cm.campos, width, height, shs=shs,
                                   sh_degree=3, alive=params.alive,
                                   opacity=params.opacity_activated())
        b = bin_gaussians(pre, width, height, rcfg.pair_cap, rcfg.tile_cap,
                          layout="visits", align=128)
        flat = pack_flat_cols(pre.T, pre.xy, pre.normal_view, opa, pre.color)
        packed = flat[b.sorted_gid]
        return jnp.sum(packed) * 1e-20 + s + 1.0
    chain(s_gather, "+ pack gather (cap rows x 21 cols)")

    @jax.jit
    def s_kernel(s):
        from instascene_tpu.ops.blend_visits import blend_visits_diff
        pre = preprocess_gaussians(jitter(s), sc, rot, cm.w2v, cm.full_proj,
                                   cm.campos, width, height, shs=shs,
                                   sh_degree=3, alive=params.alive,
                                   opacity=params.opacity_activated())
        b = bin_gaussians(pre, width, height, rcfg.pair_cap, rcfg.tile_cap,
                          layout="visits", align=128)
        flat = pack_flat_cols(pre.T, pre.xy, pre.normal_view, opa, pre.color)
        packed = flat[b.sorted_gid]
        v = b.visits
        grid_x = (width + 15) // 16
        num_tiles = grid_x * ((height + 15) // 16)
        out, iout = blend_visits_diff(
            packed, (b.sorted_gid, v.visit_chunk, v.visit_tile, v.visit_s0,
                     v.visit_s1, v.visit_tstart), num_tiles, 16, grid_x,
            0, False)
        return (jnp.sum(out) + jnp.sum(iout)) * 1e-20 + s + 1.0
    chain(s_kernel, "+ blend kernel (raw tile-major out, no maps)")

    @jax.jit
    def s_full(s):
        out = rasterize(jitter(s), sc, rot, opa, cm, jnp.zeros(3), cfg,
                        shs=shs, sh_degree=3, alive=params.alive)
        b = out.blend
        tot = (jnp.sum(b.color) + jnp.sum(b.depth) + jnp.sum(b.alpha)
               + jnp.sum(b.normal) + jnp.sum(b.distortion))
        return tot * 1e-20 + s + 1.0
    chain(s_full, "full frame (+= blend kernel)")


if __name__ == "__main__":
    main()
