#!/usr/bin/env python
"""TPU probe: semantic step with vs without the 5-view multi-view loss."""

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
    from instascene_tpu.config import OptimizationParams
    from instascene_tpu.models.optimizer import init_adam_state, semantic_lrs
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache)
    from instascene_tpu.pipelines.train import camera_tensors
    from instascene_tpu.pipelines.train_semantic import semantic_train_step

    width, height = 976, 728
    params, make_cam = make_bench_scene(n=300_000)
    rng = np.random.default_rng(1)
    cams = [camera_tensors(make_cam(i, width, height)) for i in range(6)]
    segmap = jnp.asarray(rng.integers(0, 40, (height, width)).astype(np.int32))
    opt = OptimizationParams()
    opt_state = init_adam_state(params)
    lrs = semantic_lrs(opt)
    cfg = RasterizeConfig(width=width, height=height, bwd_extras_only=True)
    key = jax.random.PRNGKey(0)
    n_mv = 5
    lab3d = jnp.asarray(rng.integers(0, 40, params.capacity).astype(np.int32))
    cf = jnp.zeros((64, 16))
    cache = []
    for ct in cams:
        cb, tc, nd = compute_binning_cache(
            params, CameraMats(ct.w2v, ct.full_proj, ct.campos),
            width, height)
        cache.append(cb)
    mv_cb = tuple(jnp.stack([cache[v][f] for v in range(1, 1 + n_mv)])
                  for f in range(len(cache[0])))
    mv_w2v = jnp.stack([cams[v].w2v for v in range(1, 1 + n_mv)])
    mv_fp = jnp.stack([cams[v].full_proj for v in range(1, 1 + n_mv)])
    mv_cp = jnp.stack([cams[v].campos for v in range(1, 1 + n_mv)])
    mv_seg = jnp.stack([segmap] * n_mv)
    seg_cs = jnp.cumsum((segmap.reshape(-1) > 0).astype(jnp.int32))
    vis_cs = jnp.cumsum((lab3d > 0).astype(jnp.int32))

    def run(do_mv):
        p, s, k = params, opt_state, key

        def one(p, s, k):
            k, sub = jax.random.split(k)
            p, s, loss, _ = semantic_train_step(
                p, s, sub, cams[0].w2v, cams[0].full_proj, cams[0].campos,
                segmap, segmap, mv_w2v, mv_fp, mv_cp, mv_seg, lab3d, cf,
                jnp.zeros(3), lrs, 1e-6, 1e-6 if do_mv else 0.0, 2.5e-6,
                cfg, 32 * 1024, 64, False, True, do_mv, n_mv,
                cached_binning=cache[0], mv_cached_binning=mv_cb,
                has_csums=True, seg_csum=seg_cs, sorted_csum=seg_cs,
                vis3d_csum=vis_cs)
            return p, s, k, loss

        p, s, k, loss = one(p, s, k)
        float(loss)
        for _ in range(WARMUP):
            p, s, k, loss = one(p, s, k)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            p, s, k, loss = one(p, s, k)
        float(loss)
        return (time.perf_counter() - t0) / ITERS * 1e3

    base = run(False)
    print(f"normal step        {base:.1f} ms", flush=True)
    mv = run(True)
    print(f"multi-view step    {mv:.1f} ms ({mv / base:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
