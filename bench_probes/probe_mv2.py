#!/usr/bin/env python
"""TPU probe (round 5): plain vs MV semantic step AFTER the merged
virtual-image MV path (_mv_full_loss_merged) landed. Compare against
probe_mv_merge part B (separate renders: 264.5 ms = 5.73x plain)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WARMUP = 10
K = 5


def timed(step, init, warmup=WARMUP, k=K):
    s = step(init)
    float(s)
    for _ in range(warmup):
        s = step(s)
    float(s)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(k):
            s = step(s)
        float(s)
        t1 = time.perf_counter()
        for _ in range(2 * k):
            s = step(s)
        float(s)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / k * 1e3)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_bench_scene
    from instascene_tpu.config import OptimizationParams
    from instascene_tpu.models.optimizer import init_adam_state, semantic_lrs
    from instascene_tpu.ops.blend_visits import VISIT_SMEM_BUDGET_BYTES
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
    key = jax.random.PRNGKey(0)
    n_mv = 5
    lab3d = jnp.asarray(rng.integers(0, 40, params.capacity).astype(np.int32))

    max_pairs = 0
    for ct in cams:
        _, tc, _ = compute_binning_cache(
            params, CameraMats(ct.w2v, ct.full_proj, ct.campos),
            width, height, tile_cap=128, impl="xla")
        max_pairs = max(max_pairs, int(jnp.sum(tc)))
    snug_cap = max(128 * 1024, (int(max_pairs * 1.1) + 1023) // 1024 * 1024)
    cfg = RasterizeConfig(width=width, height=height, bwd_extras_only=True,
                          extras_dim=16)
    cache = []
    for ct in cams:
        cb, tc, nd = compute_binning_cache(
            params, CameraMats(ct.w2v, ct.full_proj, ct.campos),
            width, height, pair_cap=snug_cap, extras_dim=16)
        assert int(nd) == 0
        cache.append(cb)
    vlen = int(cache[0].visit_chunk.shape[0])
    g_max = max(1, VISIT_SMEM_BUDGET_BYTES // (5 * 4 * vlen))
    print(f"cap={cache[0].sorted_gid.shape[0]} vlen={vlen} "
          f"-> views per merged launch: {g_max}", flush=True)

    seg_cs = valid_ids_pack(segmap.reshape(-1) > 0)
    vis_cs = valid_ids_pack(lab3d > 0)
    scfg = SemanticStepConfig(raster=cfg, batch=32 * 1024, max_labels=64)
    hyp = SemanticHypers(bg=jnp.zeros(3), lrs=lrs, lam_sv=jnp.float32(1e-6),
                         lam_mv=jnp.float32(1e-6),
                         lam_3d=jnp.float32(2.5e-6), seg3d_labels=lab3d)
    bundles = [SemanticCamera(
        w2v=ct.w2v, full_proj=ct.full_proj, campos=ct.campos, segmap=segmap,
        sorted_segmap=segmap, binning=cache[i], seg_samp=seg_cs,
        sorted_samp=seg_cs, vis3d_samp=vis_cs)
        for i, ct in enumerate(cams)]
    mv_block = SemanticMVBlock(
        w2v=jnp.stack([cams[v].w2v for v in range(1, 1 + n_mv)]),
        full_proj=jnp.stack([cams[v].full_proj for v in range(1, 1 + n_mv)]),
        campos=jnp.stack([cams[v].campos for v in range(1, 1 + n_mv)]),
        segmaps=jnp.stack([segmap] * n_mv),
        binning=jax.tree.map(lambda *xs: jnp.stack(xs),
                             *[cache[v] for v in range(1, 1 + n_mv)]))

    def wrap(do_mv):
        st = [params, opt_state, key, 0]

        def step(s):
            k, sub = jax.random.split(st[2])
            p, o, loss, _ = semantic_train_step(
                st[0], st[1], sub, bundles[st[3] % len(cams)],
                mv_block if do_mv else None, hyp, scfg)
            st[0], st[1], st[2], st[3] = p, o, k, st[3] + 1
            return loss
        return lambda _: step(None)

    t_plain = timed(wrap(False), None)
    print(f"plain step {t_plain:.1f} ms", flush=True)
    t_mv = timed(wrap(True), None)
    print(f"MV step (merged) {t_mv:.1f} ms ({t_mv / t_plain:.2f}x)  "
          f"sustained {1e3 / (0.9 * t_plain + 0.1 * t_mv):.2f} it/s",
          flush=True)


if __name__ == "__main__":
    main()
