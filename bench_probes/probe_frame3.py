#!/usr/bin/env python
"""TPU probe: which interaction costs ~8 ms when binning + gather + kernel
fuse into one program? Compare dynamic vs constant bundle/packed feeds."""

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
    from instascene_tpu.ops.blend_visits import blend_fwd_pallas_visits
    from instascene_tpu.ops.preprocess import preprocess_gaussians
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache)

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

    cb, _, _ = compute_binning_cache(params, cm, width, height,
                                     impl="pallas", pair_cap=pair_cap)
    c_gid, c_vc, c_vt, c_vs0, c_vs1, c_vts = [jnp.asarray(a) for a in cb[:6]]
    rng = np.random.default_rng(0)
    const_packed = jnp.asarray(rng.random((pair_cap, 21)).astype(np.float32))

    def pre_of(s):
        return preprocess_gaussians(xyz + s * 1e-30, sc, rot, cm.w2v,
                                    cm.full_proj, cm.campos, width, height,
                                    shs=shs, sh_degree=3, tile=tile,
                                    alive=params.alive)

    def bin_of(pre):
        return bin_gaussians(pre, width, height, pair_cap, 0, tile=tile,
                             layout="visits")

    def kout(f):
        return (f.out[0, 0, 0]
                + f.iout[0, 0, 0].astype(jnp.float32)) * 1e-20

    @jax.jit
    def prebin(s):
        b = bin_of(pre_of(s))
        return (b.sorted_gid[0] + b.visits.visit_chunk[0]
                ).astype(jnp.float32) * 1e-20 + s
    chain(prebin, "a) pre+bin")

    @jax.jit
    def prebin_gather(s):
        pre = pre_of(s)
        b = bin_of(pre)
        flat = pack_flat_cols(pre.T, pre.xy, pre.normal_view, opa, pre.color)
        return flat[b.sorted_gid][0, 0] * 1e-20 + s
    chain(prebin_gather, "b) pre+bin+gather")

    @jax.jit
    def dyn_all(s):
        pre = pre_of(s)
        b = bin_of(pre)
        flat = pack_flat_cols(pre.T, pre.xy, pre.normal_view, opa, pre.color)
        packed = flat[b.sorted_gid]
        v = b.visits
        f = blend_fwd_pallas_visits(packed, v.visit_tile, v.visit_chunk,
                                    v.visit_s0, v.visit_s1, v.visit_tstart,
                                    num_tiles, tile, grid_x, 0)
        return kout(f) + s
    chain(dyn_all, "c) pre+bin+gather+kernel (all dynamic)")

    @jax.jit
    def dyn_packed_const_bundle(s):
        pre = pre_of(s)
        b = bin_of(pre)
        flat = pack_flat_cols(pre.T, pre.xy, pre.normal_view, opa, pre.color)
        packed = flat[b.sorted_gid]
        f = blend_fwd_pallas_visits(packed, c_vt, c_vc, c_vs0, c_vs1, c_vts,
                                    num_tiles, tile, grid_x, 0)
        return kout(f) + s
    chain(dyn_packed_const_bundle, "d) dynamic packed, CONST bundle (bin still run)")

    @jax.jit
    def const_packed_dyn_bundle(s):
        pre = pre_of(s)
        b = bin_of(pre)
        v = b.visits
        f = blend_fwd_pallas_visits(const_packed + s * 1e-30, v.visit_tile,
                                    v.visit_chunk, v.visit_s0, v.visit_s1,
                                    v.visit_tstart, num_tiles, tile, grid_x, 0)
        return kout(f) + (pre.depth[0] + b.sorted_gid[0]) * 1e-20 + s
    chain(const_packed_dyn_bundle, "e) CONST packed, dynamic bundle (pre+bin run)")

    @jax.jit
    def cached_path(s):
        pre = pre_of(s)
        flat = pack_flat_cols(pre.T, pre.xy, pre.normal_view, opa, pre.color)
        packed = flat[c_gid]
        f = blend_fwd_pallas_visits(packed, c_vt, c_vc, c_vs0, c_vs1, c_vts,
                                    num_tiles, tile, grid_x, 0)
        return kout(f) + s
    chain(cached_path, "f) pre+gather+kernel (cached binning, no bin)")


if __name__ == "__main__":
    main()
