#!/usr/bin/env python
"""Capture a jax.profiler trace of the geometry train step at bench scale."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_bench_scene
    from instascene_tpu.config import OptimizationParams
    from instascene_tpu.models.densify import init_stats
    from instascene_tpu.models.optimizer import geometry_lrs, init_adam_state
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache)
    from instascene_tpu.pipelines.train import camera_tensors, train_step

    width, height = 976, 728
    params, make_cam = make_bench_scene(n=300_000)
    rng = np.random.default_rng(2)
    params = params.replace(seg_feature=None)
    cams = [camera_tensors(make_cam(i, width, height)) for i in range(4)]
    gt = jnp.asarray(rng.random((height, width, 3)).astype(np.float32))
    opt = OptimizationParams()
    opt_state = init_adam_state(params)
    stats = init_stats(params.capacity)
    lrs = geometry_lrs(opt, 1.0, 1e-4)
    _, tc0, _ = compute_binning_cache(
        params, CameraMats(cams[0].w2v, cams[0].full_proj, cams[0].campos),
        width, height, impl="xla")
    gran = 256 * 1024
    snug = max(gran, (int(jnp.sum(tc0)) * 135 // 100 + gran - 1)
               // gran * gran)
    cfg = RasterizeConfig(width=width, height=height, pair_cap=snug)
    dummy = jnp.zeros(1)

    def one(i, p, o, s):
        ct = cams[i % len(cams)]
        return train_step(p, o, s, ct.w2v, ct.full_proj, ct.campos,
                          ct.c2w_rot, gt, dummy, dummy, jnp.zeros(3), lrs,
                          0.2, 0.0, 0.05, 0.0, cfg, ct.tanfovx, ct.tanfovy,
                          1.0, False)

    p, o, s, m = one(0, params, opt_state, stats)
    float(m["loss"])
    for i in range(12):
        p, o, s, m = one(i, p, o, s)
    float(m["loss"])
    with jax.profiler.trace("/tmp/trace_geo"):
        for i in range(5):
            p, o, s, m = one(i, p, o, s)
        float(m["loss"])
    print("trace done", flush=True)


if __name__ == "__main__":
    main()
