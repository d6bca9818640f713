#!/usr/bin/env python
"""TPU probe: geometry train-step rate under {conic_cull on/off} x
{gather-tune on/off} x {uniform/trained profile} — the round-4 decision
matrix for the two new binning-path features. Mirrors bench.bench_geometry
exactly except for the two knobs."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
WARMUP, ITERS = 12, 10


def geo_rate(params, make_cam, conic, tune, width=976, height=728):
    import jax
    import jax.numpy as jnp
    from instascene_tpu.config import OptimizationParams
    from instascene_tpu.models.densify import init_stats
    from instascene_tpu.models.optimizer import geometry_lrs, init_adam_state
    from instascene_tpu.ops import gather_tune
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache)
    from instascene_tpu.pipelines.train import camera_tensors, train_step

    os.environ["INSTASCENE_GATHER_TUNE"] = "1" if tune else "0"
    gather_tune.reset_gather_tune_cache()
    rng = np.random.default_rng(2)
    params = params.replace(seg_feature=None)
    cams = [camera_tensors(make_cam(i, width, height)) for i in range(4)]
    gt = jnp.asarray(rng.random((height, width, 3)).astype(np.float32))
    opt = OptimizationParams()
    opt_state = init_adam_state(params)
    stats = init_stats(params.capacity)
    lrs = geometry_lrs(opt, 1.0, 1e-4)
    hiwater = 0
    for ct in cams:
        _, tc0, _ = compute_binning_cache(
            params, CameraMats(ct.w2v, ct.full_proj, ct.campos),
            width, height, impl="xla")
        hiwater = max(hiwater, int(jnp.sum(tc0)))
    gran = 128 * 1024
    snug = max(gran, (hiwater * 110 // 100 + gran - 1) // gran * gran)
    cfg = RasterizeConfig(width=width, height=height, pair_cap=snug,
                          no_depth_dist=True, conic_cull=conic)
    print(f"  conic={conic} tune={tune} snug={snug} "
          f"resolved={cfg.resolved(params.capacity).pair_cap}", flush=True)
    depth_ratio = 1.0
    dummy = jnp.zeros(1)
    bg = jnp.zeros(3)
    lam = tuple(jnp.float32(v) for v in (0.2, 0.0, 0.05, 0.0))

    def one(i, p, o, s):
        ct = cams[i % len(cams)]
        return train_step(p, o, s, ct.w2v, ct.full_proj, ct.campos,
                          ct.c2w_rot, gt, dummy, dummy, bg, lrs,
                          *lam, cfg, ct.tanfovx, ct.tanfovy,
                          depth_ratio, False)

    p, o, s, m = one(0, params, opt_state, stats)
    float(m["loss"])
    for i in range(WARMUP):
        p, o, s, m = one(i, p, o, s)
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(ITERS):
        p, o, s, m = one(i, p, o, s)
    float(m["loss"])
    return ITERS / (time.perf_counter() - t0)


def main():
    from bench import make_bench_scene
    for profile in ("uniform", "trained"):
        params, make_cam = make_bench_scene(n=300_000, profile=profile)
        for conic in (False, True):
            for tune in (False, True):
                r = geo_rate(params, make_cam, conic, tune)
                print(f"{profile:8s} conic={int(conic)} tune={int(tune)}  "
                      f"{r:6.2f} it/s", flush=True)


if __name__ == "__main__":
    main()
