#!/usr/bin/env python
"""TPU probe (round 3 cont.): current 1080p frame section split after the
round-3 kernel work — where do the remaining ~56 ms go?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
WARMUP, ITERS = 12, 10

def chain(fn, label):
    import jax, jax.numpy as jnp
    s = jnp.zeros(()); out = fn(s); jax.block_until_ready(out)
    for _ in range(WARMUP): out = fn(out)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS): out = fn(out)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{label:<58s} {ms:8.2f} ms", flush=True)
    return ms

def main():
    import jax, jax.numpy as jnp
    from bench import make_bench_scene
    from instascene_tpu.ops.binning import bin_gaussians
    from instascene_tpu.ops.blend_pallas import pack_flat_cols
    from instascene_tpu.ops.blend_visits import blend_fwd_pallas_visits
    from instascene_tpu.ops.preprocess import preprocess_gaussians
    from instascene_tpu.ops.rasterize import CameraMats, compute_binning_cache

    width, height = 1920, 1080
    tile = 16; grid_x = (width + 15) // 16
    num_tiles = grid_x * ((height + 15) // 16)
    pair_cap = 1399296
    params, make_cam = make_bench_scene(n=300_000)
    cam = make_cam(0, width, height)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    xyz, sc, rot = (params.xyz, params.scaling_activated(),
                    params.rotation_normalized())
    opa = params.opacity_activated()[:, 0]
    shs = params.features()

    cb, tc, nd = compute_binning_cache(params, cm, width, height,
                                       impl="pallas", pair_cap=pair_cap)
    assert int(nd) == 0
    c_gid, c_vc, c_vt, c_vs0, c_vs1, c_vts = [jnp.asarray(a) for a in cb[:6]]
    tc_np = np.asarray(tc)
    print(f"tiles={num_tiles} empty={(tc_np==0).sum()} visits={c_vt.shape[0]}"
          f" pairs={tc_np.sum()}", flush=True)

    def pre_of(s):
        return preprocess_gaussians(xyz + s * 1e-30, sc, rot, cm.w2v,
                                    cm.full_proj, cm.campos, width, height,
                                    shs=shs, sh_degree=3, tile=tile,
                                    alive=params.alive)
    def kout(f):
        return (f.out[0, 0, 0] + f.iout[0, 0, 0].astype(jnp.float32)) * 1e-20

    @jax.jit
    def pre_only(s):
        pre = pre_of(s)
        return (pre.T[0,0,0] + pre.xy[0,0] + pre.color[0,0]
                + pre.tiles_touched[0].astype(jnp.float32)) * 1e-20 + s
    chain(pre_only, "A) preprocess only")

    @jax.jit
    def pre_bin(s):
        pre = pre_of(s)
        b = bin_gaussians(pre, width, height, pair_cap, 0, tile=tile,
                          layout="visits")
        return (b.sorted_gid[0] + b.visits.visit_tile[0]).astype(jnp.float32) * 1e-20 + s
    chain(pre_bin, "B) preprocess + fresh binning (expand+sort+visits)")

    @jax.jit
    def pre_gather(s):
        pre = pre_of(s)
        flat = pack_flat_cols(pre.T, pre.xy, pre.normal_view, opa, pre.color)
        packed = flat[c_gid]
        return packed[0, 0] * 1e-20 + s
    chain(pre_gather, "C) preprocess + pack + gather (cached gid)")

    zero_s = jnp.zeros_like(c_vs0)
    @jax.jit
    def empty_kernel(s):
        pre = pre_of(s)
        flat = pack_flat_cols(pre.T, pre.xy, pre.normal_view, opa, pre.color)
        packed = flat[c_gid]
        f = blend_fwd_pallas_visits(packed, c_vt, c_vc, zero_s, zero_s,
                                    c_vts, num_tiles, tile, grid_x, 0)
        return kout(f) + s
    chain(empty_kernel, "D) C + EMPTY-visit kernel (pure grid overhead)")

    @jax.jit
    def cached_frame(s):
        pre = pre_of(s)
        flat = pack_flat_cols(pre.T, pre.xy, pre.normal_view, opa, pre.color)
        packed = flat[c_gid]
        f = blend_fwd_pallas_visits(packed, c_vt, c_vc, c_vs0, c_vs1, c_vts,
                                    num_tiles, tile, grid_x, 0)
        return kout(f) + s
    chain(cached_frame, "E) C + full kernel (cached binning frame)")

    @jax.jit
    def fresh_frame(s):
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
    chain(fresh_frame, "F) full fresh frame (baseline)")

if __name__ == "__main__":
    main()
