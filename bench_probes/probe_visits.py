#!/usr/bin/env python
"""TPU probe: visit-layout frame at 1080p (fresh binning per frame) vs the
stage decomposition — validates the round-3 redesign's win."""

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
    print(f"{label:<46s} {ms:8.2f} ms  ({1e3/ms:.1f}/s)", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_bench_scene
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache, rasterize)

    width, height = 1920, 1080
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
    for snug_f in (1.3, 1.1):
        pair_cap = (int(total * snug_f) + 127) // 128 * 128
        print(f"pairs={total} pair_cap={pair_cap} ({snug_f}x)", flush=True)

        xyz, sc, rot = (params.xyz, params.scaling_activated(),
                        params.rotation_normalized())
        opa = params.opacity_activated()[:, 0]
        shs = params.features()
        cfg = RasterizeConfig(width=width, height=height, pair_cap=pair_cap,
                              impl="pallas")
        cfgv = RasterizeConfig(width=width, height=height, pair_cap=pair_cap,
                               impl="pallas", fwd_viewer=True)

        @jax.jit
        def full_frame(s):
            out = rasterize(xyz + s * 1e-30, sc, rot, opa, cm, jnp.zeros(3),
                            cfg, shs=shs, sh_degree=3)
            return out.blend.color[0, 0, 0] * 1e-20 + s
        chain(full_frame, f"full 1080p frame, visits, cap {snug_f}x")

        extras = params.seg_feature_normed()

        @jax.jit
        def viewer_frame(s):
            out = rasterize(xyz + s * 1e-30, sc, rot, opa, cm, jnp.zeros(3),
                            cfgv, shs=shs, sh_degree=3, extras=extras)
            return (out.blend.color[0, 0, 0] + out.blend.extra[0, 0, 0]
                    ) * 1e-20 + s
        chain(viewer_frame, f"viewer 1080p +16ch, visits, cap {snug_f}x")


if __name__ == "__main__":
    main()
