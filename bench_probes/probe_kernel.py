#!/usr/bin/env python
"""TPU probe: aligned forward kernel in isolation — body-bound or
grid-overhead-bound? Times the full kernel, an extras-only variant (smaller
body), and the raw pack gather feeding it."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WARMUP = 10
ITERS = 15


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_bench_scene
    from instascene_tpu.ops.binning import aligned_cap
    from instascene_tpu.ops.blend_pallas import blend_fwd_pallas_aligned
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache)
    from instascene_tpu.pipelines.train import camera_tensors

    width, height = 976, 728
    tile, grid_x = 16, (width + 15) // 16
    num_tiles = grid_x * ((height + 15) // 16)
    params, make_cam = make_bench_scene(n=300_000)
    ct = camera_tensors(make_cam(0, width, height))
    cam = CameraMats(ct.w2v, ct.full_proj, ct.campos)
    gran = 256 * 1024
    cb, tc, nd = compute_binning_cache(params, cam, width, height,
                                       impl="pallas", pair_cap=1024 * 1024)
    aligned_gid, chunk_tile, chunk_rank = cb[0], cb[1], cb[2]
    print(f"pairs={int(jnp.sum(tc))} acap={aligned_gid.shape[0]} "
          f"chunks={chunk_tile.shape[0]}", flush=True)

    n = params.capacity
    rng = np.random.default_rng(0)
    D = 18
    flat = jnp.asarray(rng.normal(0, 0.1, (n + 1, D)).astype(np.float32))

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

    @jax.jit
    def pack_only(s):
        packed = (flat + s * 1e-20)[aligned_gid]
        return s + packed[0, 0] * 1e-20

    print(f"pack gather+T      {chain(pack_only):.1f} ms", flush=True)

    @jax.jit
    def kernel_full(s):
        packed = (flat + s * 1e-20)[aligned_gid]
        f = blend_fwd_pallas_aligned(packed, chunk_tile, chunk_rank,
                                     num_tiles, tile, grid_x, 0)
        return s + f.out[0, 0, 0] * 1e-20

    print(f"pack+kernel full   {chain(kernel_full):.1f} ms", flush=True)

    @jax.jit
    def kernel_extras(s):
        packed = (flat + s * 1e-20)[aligned_gid]
        f = blend_fwd_pallas_aligned(packed, chunk_tile, chunk_rank,
                                     num_tiles, tile, grid_x, 0,
                                     extras_only=True)
        return s + f.out[0, 0, 0] * 1e-20

    print(f"pack+kernel xonly  {chain(kernel_extras):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
