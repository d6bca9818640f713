#!/usr/bin/env python
"""TPU probe: exact conic pair culling (RasterizeConfig.conic_cull) A/B.

Measures the 1080p full-quality fresh-binning frame with conic culling
on/off, on both bench profiles, with each variant's snug 1.1x pair cap
(the cap scales every pair-space section, so the honest comparison lets
each variant size itself the way the product render path does).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WARMUP = 12
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_bench_scene
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache,
                                              rasterize)

    width, height = 1920, 1080
    for profile in ("uniform", "trained"):
        params, make_cam = make_bench_scene(n=300_000, profile=profile)
        cam = make_cam(0, width, height)
        cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                        jnp.asarray(cam.camera_center))
        for conic in (False, True):
            pair_cap = RasterizeConfig(width=width, height=height).resolved(
                params.capacity).pair_cap
            for _ in range(4):
                _, tc, _ = compute_binning_cache(
                    params, cm, width, height, pair_cap=pair_cap,
                    tile_cap=128, impl="xla", conic_cull=conic)
                total = int(jnp.sum(tc))
                if total < 0.95 * pair_cap:
                    pair_cap = (int(total * 1.1) + 127) // 128 * 128
                    break
                pair_cap *= 2
            cfg = RasterizeConfig(width=width, height=height,
                                  pair_cap=pair_cap, conic_cull=conic)

            @jax.jit
            def step(p, cfg=cfg):
                b = rasterize(params.xyz, params.scaling_activated(),
                              params.rotation_normalized(),
                              params.opacity_activated()[:, 0],
                              cm, jnp.zeros(3), cfg, shs=params.features(),
                              sh_degree=3).blend
                return p + 1e-20 * b.color[0, 0, 0]

            x = step(jnp.zeros(()))
            float(x)
            for _ in range(WARMUP):
                x = step(x)
            float(x)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                x = step(x)
            float(x)
            dt = (time.perf_counter() - t0) / ITERS
            print(f"{profile:>8} conic={int(conic)}  pairs={total:>8} "
                  f"cap={pair_cap:>8}  {dt * 1e3:6.1f} ms  "
                  f"{1.0 / dt:5.2f} fps", flush=True)


if __name__ == "__main__":
    main()
