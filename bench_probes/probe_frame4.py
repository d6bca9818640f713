#!/usr/bin/env python
"""TPU probe (round 3): where can the 1080p frame lose ~6 ms?

  1. grid/DMA overhead of the visit kernel (all-empty visits)
  2. chunk=256 with the slimmer affine-coeff kernel body
  3. gather variants: dtype/width of the pack gather
  4. the frame-coherent cached path (dilate 1/2) vs fresh binning
"""

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
    print(f"{label:<58s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_bench_scene
    from instascene_tpu.ops.binning import bin_gaussians, build_visits
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

    cb, _, nd = compute_binning_cache(params, cm, width, height,
                                      impl="pallas", pair_cap=pair_cap)
    assert int(nd) == 0
    c_gid, c_vc, c_vt, c_vs0, c_vs1, c_vts = [jnp.asarray(a) for a in cb[:6]]

    def pre_of(s):
        return preprocess_gaussians(xyz + s * 1e-30, sc, rot, cm.w2v,
                                    cm.full_proj, cm.campos, width, height,
                                    shs=shs, sh_degree=3, tile=tile,
                                    alive=params.alive)

    def kout(f):
        return (f.out[0, 0, 0]
                + f.iout[0, 0, 0].astype(jnp.float32)) * 1e-20

    # ---- 1) pure grid overhead: every visit empty (s0 == s1 == 0)
    zero_s = jnp.zeros_like(c_vs0)

    @jax.jit
    def empty_visits(s):
        pre = pre_of(s)
        flat = pack_flat_cols(pre.T, pre.xy, pre.normal_view, opa, pre.color)
        packed = flat[c_gid]
        f = blend_fwd_pallas_visits(packed, c_vt, c_vc, zero_s, zero_s,
                                    c_vts, num_tiles, tile, grid_x, 0)
        return kout(f) + s
    chain(empty_visits, "1) pre+gather+EMPTY-visit kernel (grid overhead)")

    @jax.jit
    def cached_path(s):
        pre = pre_of(s)
        flat = pack_flat_cols(pre.T, pre.xy, pre.normal_view, opa, pre.color)
        packed = flat[c_gid]
        f = blend_fwd_pallas_visits(packed, c_vt, c_vc, c_vs0, c_vs1, c_vts,
                                    num_tiles, tile, grid_x, 0)
        return kout(f) + s
    chain(cached_path, "1b) pre+gather+kernel (cached, baseline)")

    # ---- 2) chunk=256 end-to-end (fresh binning at align 256)
    cap256 = ((pair_cap + 255) // 256) * 256

    @jax.jit
    def fresh256(s):
        pre = pre_of(s)
        b = bin_gaussians(pre, width, height, cap256, 0, tile=tile,
                          layout="visits", align=256)
        flat = pack_flat_cols(pre.T, pre.xy, pre.normal_view, opa, pre.color)
        packed = flat[b.sorted_gid]
        v = b.visits
        f = blend_fwd_pallas_visits(packed, v.visit_tile, v.visit_chunk,
                                    v.visit_s0, v.visit_s1, v.visit_tstart,
                                    num_tiles, tile, grid_x, 0, chunk=256)
        return kout(f) + s
    chain(fresh256, "2) fresh frame, chunk=256")

    @jax.jit
    def fresh128(s):
        pre = pre_of(s)
        b = bin_gaussians(pre, width, height, pair_cap, 0, tile=tile,
                          layout="visits")
        flat = pack_flat_cols(pre.T, pre.xy, pre.normal_view, opa, pre.color)
        packed = flat[b.sorted_gid]
        v = b.visits
        f = blend_fwd_pallas_visits(packed, v.visit_tile, v.visit_chunk,
                                    v.visit_s0, v.visit_s1, v.visit_tstart,
                                    num_tiles, tile, grid_x, 0)
        return kout(f) + s
    chain(fresh128, "2b) fresh frame, chunk=128 (baseline)")

    # ---- 3) gather variants
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n, pair_cap).astype(np.int32))
    src34 = jnp.asarray(rng.random((n + 1, 34)).astype(np.float32))
    src34b = src34.astype(jnp.bfloat16)
    src17a, src17b = src34[:, :17], src34[:, 17:]

    @jax.jit
    def g34(s):
        return src34[idx + (s * 0).astype(jnp.int32)][0, 0] * 1e-20 + s
    chain(g34, "3) gather [1.4M] x 34 f32")

    @jax.jit
    def g34b(s):
        return (src34b[idx + (s * 0).astype(jnp.int32)][0, 0]
                ).astype(jnp.float32) * 1e-20 + s
    chain(g34b, "3b) gather [1.4M] x 34 bf16")

    @jax.jit
    def g17x2(s):
        i = idx + (s * 0).astype(jnp.int32)
        return (src17a[i][0, 0] + src17b[i][0, 0]) * 1e-20 + s
    chain(g17x2, "3c) two gathers [1.4M] x 17 f32")

    # ---- 4) frame-coherent cached path vs fresh (viewer kernel, E=16)
    seg = params.seg_feature_normed()
    for dil in (1, 2):
        dcb, _, dnd = compute_binning_cache(params, cm, width, height,
                                            impl="pallas", pair_cap=0,
                                            dilate_tiles=dil)
        dcap = dcb[0].shape[0]
        grow = dcap
        while int(dnd) > 0:
            grow *= 2
            dcb, _, dnd = compute_binning_cache(params, cm, width, height,
                                                impl="pallas", pair_cap=grow,
                                                dilate_tiles=dil)
        d_gid, d_vc, d_vt, d_vs0, d_vs1, d_vts = [jnp.asarray(a)
                                                  for a in dcb[:6]]
        print(f"   dilate={dil}: cached pair slots {d_gid.shape[0]} "
              f"(x{d_gid.shape[0] / pair_cap:.2f})", flush=True)

        @jax.jit
        def coherent_viewer(s, d_gid=d_gid, d_vc=d_vc, d_vt=d_vt,
                            d_vs0=d_vs0, d_vs1=d_vs1, d_vts=d_vts):
            pre = pre_of(s)
            has = pre.tiles_touched > 0
            rect = (pre.rect_min,
                    jnp.where(has[:, None], pre.rect_max, pre.rect_min))
            flat = pack_flat_cols(pre.T, pre.xy, pre.normal_view, opa,
                                  pre.color, seg, rect=rect)
            packed = flat[d_gid]
            f = blend_fwd_pallas_visits(packed, d_vt, d_vc, d_vs0, d_vs1,
                                        d_vts, num_tiles, tile, grid_x, 16,
                                        viewer=True, clip_rect=True)
            return kout(f) + s
        chain(coherent_viewer, f"4) coherent viewer frame, dilate={dil}")

    @jax.jit
    def fresh_viewer(s):
        pre = pre_of(s)
        b = bin_gaussians(pre, width, height, pair_cap, 0, tile=tile,
                          layout="visits")
        flat = pack_flat_cols(pre.T, pre.xy, pre.normal_view, opa, pre.color,
                              seg)
        packed = flat[b.sorted_gid]
        v = b.visits
        f = blend_fwd_pallas_visits(packed, v.visit_tile, v.visit_chunk,
                                    v.visit_s0, v.visit_s1, v.visit_tstart,
                                    num_tiles, tile, grid_x, 16, viewer=True)
        return kout(f) + s
    chain(fresh_viewer, "4b) fresh viewer frame (baseline)")


if __name__ == "__main__":
    main()
