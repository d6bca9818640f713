#!/usr/bin/env python
"""TPU probe: 1080p render pipeline breakdown + pallas_chunk sweep.

Times, per frame at 1920x1080 (fresh camera work each frame, as the
interactive viewer pays): preprocess+binning alone, pack gather alone,
full rasterize, for chunk in {128, 256}.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WARMUP = 10
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_bench_scene
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache,
                                              rasterize, _binning_cache_impl)

    width, height = 1920, 1080
    params, make_cam = make_bench_scene(n=300_000)
    cam = make_cam(0, width, height)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    # probe true pair total
    cap0 = RasterizeConfig(width=width, height=height).resolved(
        params.capacity).pair_cap
    for _ in range(4):
        _, tc, _ = compute_binning_cache(params, cm, width, height,
                                         pair_cap=cap0, tile_cap=128,
                                         impl="xla")
        total = int(jnp.sum(tc))
        if total < 0.95 * cap0:
            break
        cap0 *= 2
    print(f"true pairs = {total}", flush=True)

    def chain(fn):
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
        return (time.perf_counter() - t0) / ITERS * 1e3

    xyz = params.xyz
    sc = params.scaling_activated()
    rot = params.rotation_normalized()
    op = params.opacity_activated()[:, 0]
    shs = params.features()

    for chunk in (128, 256):
        pair_cap = (int(total * 1.3) + chunk - 1) // chunk * chunk
        cfg = RasterizeConfig(width=width, height=height, pair_cap=pair_cap,
                              pallas_chunk=chunk)

        @jax.jit
        def bin_only(s, chunk=chunk, pair_cap=pair_cap):
            from instascene_tpu.ops.binning import bin_gaussians
            from instascene_tpu.ops.preprocess import preprocess_gaussians
            pre = preprocess_gaussians(xyz + s * 1e-20, sc, rot, cm.w2v,
                                       cm.full_proj, cm.campos, width, height,
                                       color=xyz * 0.0, tile=16,
                                       alive=params.alive)
            b = bin_gaussians(pre, width, height, pair_cap, pair_cap,
                              tile=16, layout="aligned", align=chunk)
            return s + b.aligned.aligned_gid[0].astype(jnp.float32) * 1e-20

        @jax.jit
        def full(s, cfg=cfg):
            img = rasterize(xyz + s * 1e-20, sc, rot, op, cm, jnp.zeros(3),
                            cfg, shs=shs, sh_degree=3).blend.color
            return s + img[0, 0, 0] * 1e-20

        print(f"chunk={chunk:>3}  bin(+chain_idx) {chain(bin_only):6.1f} ms"
              f"   full frame {chain(full):6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
