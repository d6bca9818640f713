#!/usr/bin/env python
"""TPU probe: semantic (extras-only) fwd / fwd+bwd split, cached binning."""

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
                                              compute_binning_cache)
    from instascene_tpu.pipelines.train import camera_tensors
    from instascene_tpu.pipelines.train_semantic import render_features

    width, height = 976, 728
    params, make_cam = make_bench_scene(n=300_000)
    ct = camera_tensors(make_cam(0, width, height))
    cam = CameraMats(ct.w2v, ct.full_proj, ct.campos)
    cb, tc, nd = compute_binning_cache(params, cam, width, height)
    print(f"pairs={int(jnp.sum(tc))} dropped={int(nd)}", flush=True)
    cfg = RasterizeConfig(width=width, height=height, bwd_extras_only=True)

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
    def fwd(s):
        out = render_features(params, cam, jnp.zeros(3), cfg,
                              params.seg_feature + s * 1e-20, cb)
        return s + out.blend.extra[0, 0, 0] * 1e-20

    print(f"fwd extras cached    {chain(fwd):.1f} ms", flush=True)

    @jax.jit
    def fwdbwd(s):
        def loss_fn(feat):
            out = render_features(params, cam, jnp.zeros(3), cfg, feat, cb)
            return jnp.mean(out.blend.extra)
        loss, g = jax.value_and_grad(loss_fn)(params.seg_feature + s * 1e-20)
        return s + loss + g[0, 0] * 1e-20

    print(f"fwd+bwd extras cached {chain(fwdbwd):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
