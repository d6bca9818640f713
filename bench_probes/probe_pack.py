#!/usr/bin/env python
"""TPU probe (round 3): the composed frame costs ~6-9 ms more than
pre+bin+gather (22) + kernel (26) at 1080p. Hypothesis: XLA inserts a
relayout/copy of the packed [P, D] gather output (physically lane-padded
D->128, ~6x bytes) before the pallas_call. Variants isolate it."""

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
    from instascene_tpu.ops.rasterize import CameraMats

    width, height = 1920, 1080
    tile = 16
    grid_x = (width + 15) // 16
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

    def frame(mode):
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
            packed = flat[b.sorted_gid]
            if mode == "barrier":
                packed = jax.lax.optimization_barrier(packed)
            elif mode == "pad128":
                packed = jnp.pad(packed, ((0, 0), (0, 128 - packed.shape[1])))
                packed = packed[:, :21]
            elif mode == "donate_copy":
                packed = packed.copy()
            v = b.visits
            fo = blend_fwd_pallas_visits(
                packed, v.visit_tile, v.visit_chunk, v.visit_s0, v.visit_s1,
                v.visit_tstart, num_tiles, tile, grid_x, 0)
            return (fo.out[0, 0, 0]
                    + fo.iout[0, 0, 0].astype(jnp.float32)) * 1e-20 + s
        return f

    # NOTE: rasterize()'s real path gathers inside bin_gaussians/pack; here
    # we reproduce the same ops explicitly so variants can intervene.
    chain(frame("plain"), "composed frame, no maps (baseline)")
    chain(frame("barrier"), "  + optimization_barrier(packed)")
    chain(frame("pad128"), "  + explicit pad-to-128-cols round trip")

    # how much is the gather itself in-context: same program, kernel on a
    # CONST packed array but gather result still consumed (cheap reduce)
    const_packed = jnp.zeros((pair_cap, 21), jnp.float32)

    @jax.jit
    def gather_only_plus_kernel(s):
        pre = preprocess_gaussians(xyz + s * 1e-30, sc, rot, cm.w2v,
                                   cm.full_proj, cm.campos, width, height,
                                   shs=shs, sh_degree=3, tile=tile,
                                   alive=params.alive)
        b = bin_gaussians(pre, width, height, pair_cap, 0, tile=tile,
                          layout="visits")
        flat = pack_flat_cols(pre.T, pre.xy, pre.normal_view, opa, pre.color)
        packed = flat[b.sorted_gid]
        v = b.visits
        fo = blend_fwd_pallas_visits(
            const_packed, v.visit_tile, v.visit_chunk, v.visit_s0, v.visit_s1,
            v.visit_tstart, num_tiles, tile, grid_x, 0)
        return (fo.out[0, 0, 0] + jnp.sum(packed[::4096, 0])) * 1e-20 + s
    chain(gather_only_plus_kernel, "gather runs, kernel on CONST packed")


if __name__ == "__main__":
    main()
