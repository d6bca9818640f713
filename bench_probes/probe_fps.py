#!/usr/bin/env python
"""TPU probe: 1080p forward-render latency by pallas_chunk / binning split.

Usage: python scripts/probe_fps.py [chunk ...]   (default: 128 256)
Prints per-variant ms/frame for (a) full fresh render, (b) forward with
cached binning, (c) binning alone — fenced chained loops, warmed up.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WARMUP = int(os.environ.get("BENCH_WARMUP", 12))
ITERS = int(os.environ.get("BENCH_ITERS", 15))


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_bench_scene
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache,
                                              rasterize)

    width, height = 1920, 1080
    params, make_cam = make_bench_scene(n=int(os.environ.get("BENCH_N",
                                                             300_000)))
    cam = make_cam(0, width, height)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))

    pair_cap = RasterizeConfig(width=width, height=height).resolved(
        params.capacity).pair_cap
    for _ in range(4):
        _, tc, _ = compute_binning_cache(params, cm, width, height,
                                         pair_cap=pair_cap, tile_cap=128,
                                         impl="xla")
        total = int(jnp.sum(tc))
        if total < 0.95 * pair_cap:
            pair_cap = (int(total * 1.3) + 255) // 256 * 256
            break
        pair_cap *= 2
    print(f"true pairs={total} pair_cap={pair_cap}", flush=True)

    chunks = [int(a) for a in sys.argv[1:]] or [128, 256]

    def timed(step, x0):
        x = step(x0)
        float(x)
        for _ in range(WARMUP):
            x = step(x)
        float(x)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            x = step(x)
        float(x)
        return (time.perf_counter() - t0) / ITERS * 1e3

    for chunk in chunks:
        cfg = RasterizeConfig(width=width, height=height, pair_cap=pair_cap,
                              pallas_chunk=chunk)

        @jax.jit
        def fresh(z):
            img = rasterize(params.xyz, params.scaling_activated(),
                            params.rotation_normalized(),
                            params.opacity_activated()[:, 0],
                            cm, jnp.zeros(3), cfg, shs=params.features(),
                            sh_degree=3).blend.color
            return z + 1e-20 * img[0, 0, 0]

        ms_fresh = timed(fresh, jnp.zeros(()))
        print(f"chunk={chunk}: fresh render {ms_fresh:.1f} ms "
              f"({1e3 / ms_fresh:.2f} fps)", flush=True)

        cb, tc2, nd = compute_binning_cache(params, cm, width, height,
                                            pair_cap=pair_cap,
                                            impl="pallas",
                                            pallas_chunk=chunk)
        print(f"  cache n_dropped={int(nd)}", flush=True)

        @jax.jit
        def cached(z):
            img = rasterize(params.xyz, params.scaling_activated(),
                            params.rotation_normalized(),
                            params.opacity_activated()[:, 0],
                            cm, jnp.zeros(3), cfg, shs=params.features(),
                            sh_degree=3, cached_binning=cb).blend.color
            return z + 1e-20 * img[0, 0, 0]

        ms_cached = timed(cached, jnp.zeros(()))
        print(f"  cached-binning forward {ms_cached:.1f} ms "
              f"({1e3 / ms_cached:.2f} fps); binning ≈ "
              f"{ms_fresh - ms_cached:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
