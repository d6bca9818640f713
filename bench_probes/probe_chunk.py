#!/usr/bin/env python
"""TPU probe (round 3): full-frame + viewer 1080p timing vs pallas_chunk.

The visit-layout kernel's work is pairs*P2 + num_tiles*chunk*P2 (each tile
boundary inside a chunk costs one extra full-chunk visit); smaller chunks cut
the second term but add grid steps. Measure where the trade lands on v5e.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARMUP = 12
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_bench_scene
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              rasterize)

    width, height = 1920, 1080
    params, make_cam = make_bench_scene(n=300_000)
    cam = make_cam(0, width, height)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    bg = jnp.zeros((3,), jnp.float32)
    xyz, sc, rot = (params.xyz, params.scaling_activated(),
                    params.rotation_normalized())
    op = params.opacity_activated()
    shs = params.features()
    ext = params.seg_feature

    for chunk in (128, 64, 32):
        for viewer, E in ((False, 0), (True, 16)):
            cfg = RasterizeConfig(width=width, height=height,
                                  pair_cap=1399296 // chunk * chunk,
                                  impl="pallas", fwd_viewer=viewer,
                                  pallas_chunk=chunk)

            # NOTE: must be a single top-level jit with the chained scalar
            # inside — an eager wrapper feeds bitwise-identical inputs to the
            # inner jit (s*1e-30 underflows) and the axon tunnel dedupes
            # identical (executable, input) executions, reporting ~0 ms
            @jax.jit
            def frame(s, _cfg=cfg, _E=E):
                out = rasterize(xyz + s * 1e-30, sc, rot, op, cm, bg, _cfg,
                                shs=shs, sh_degree=3,
                                extras=(ext if _E else None),
                                alive=params.alive)
                r = jnp.sum(out.blend.color[0, :8]) + out.blend.alpha[0, 0]
                if _E:
                    r = r + out.blend.extra[0, 0, 0]
                return r * 1e-20 + s

            s = jnp.zeros(())
            s = frame(s)
            jax.block_until_ready(s)
            for _ in range(WARMUP):
                s = frame(s)
            jax.block_until_ready(s)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                s = frame(s)
            jax.block_until_ready(s)
            ms = (time.perf_counter() - t0) / ITERS * 1e3
            lbl = "viewer+16ch" if viewer else "full"
            print(f"chunk={chunk:<4d} {lbl:<12s} {ms:8.2f} ms "
                  f"({1e3 / ms:.1f}/s)", flush=True)


if __name__ == "__main__":
    main()
