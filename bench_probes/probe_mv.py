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
    from instascene_tpu.pipelines.train_semantic import (
        SemanticCamera, SemanticHypers, SemanticMVBlock, SemanticStepConfig,
        semantic_train_step)
    from instascene_tpu.semantic.contrastive import valid_ids_pack

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
    cache = []
    for ct in cams:
        cb, tc, nd = compute_binning_cache(
            params, CameraMats(ct.w2v, ct.full_proj, ct.campos),
            width, height)
        cache.append(cb)
    seg_cs = valid_ids_pack(segmap.reshape(-1) > 0)
    vis_cs = valid_ids_pack(lab3d > 0)
    scfg = SemanticStepConfig(raster=cfg, batch=32 * 1024, max_labels=64)
    hyp = SemanticHypers(bg=jnp.zeros(3), lrs=lrs, lam_sv=jnp.float32(1e-6),
                         lam_mv=jnp.float32(1e-6),
                         lam_3d=jnp.float32(2.5e-6), seg3d_labels=lab3d,
                         class_feat=jnp.zeros((64, 16)))
    cam0 = SemanticCamera(
        w2v=cams[0].w2v, full_proj=cams[0].full_proj, campos=cams[0].campos,
        segmap=segmap, sorted_segmap=segmap, binning=cache[0],
        seg_samp=seg_cs, sorted_samp=seg_cs, vis3d_samp=vis_cs)
    mv_block = SemanticMVBlock(
        w2v=jnp.stack([cams[v].w2v for v in range(1, 1 + n_mv)]),
        full_proj=jnp.stack([cams[v].full_proj for v in range(1, 1 + n_mv)]),
        campos=jnp.stack([cams[v].campos for v in range(1, 1 + n_mv)]),
        segmaps=jnp.stack([segmap] * n_mv),
        binning=jax.tree.map(lambda *xs: jnp.stack(xs),
                             *[cache[v] for v in range(1, 1 + n_mv)]))

    def run(do_mv):
        p, s, k = params, opt_state, key

        def one(p, s, k):
            k, sub = jax.random.split(k)
            p, s, loss, _ = semantic_train_step(
                p, s, sub, cam0, mv_block if do_mv else None, hyp, scfg)
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
