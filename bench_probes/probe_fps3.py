#!/usr/bin/env python
"""TPU probe: 1080p full-quality fps under {conic_cull on/off} x
{gather-tune on/off} x {uniform/trained} — round-4 decision matrix on the
render path (re-bins every frame, like an orbiting camera)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
WARMUP, ITERS = 12, 20


def fps(params, make_cam, conic, tune, width=1920, height=1080, viewer=False):
    import jax
    import jax.numpy as jnp
    from instascene_tpu.ops import gather_tune
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache,
                                              rasterize)
    os.environ["INSTASCENE_GATHER_TUNE"] = "1" if tune else "0"
    gather_tune.reset_gather_tune_cache()
    cam = make_cam(0, width, height)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    pair_cap = RasterizeConfig(width=width, height=height).resolved(
        params.capacity).pair_cap
    for _ in range(4):
        _, tc, _ = compute_binning_cache(params, cm, width, height,
                                         pair_cap=pair_cap, tile_cap=128,
                                         impl="xla", conic_cull=conic)
        total = int(jnp.sum(tc))
        if total < 0.95 * pair_cap:
            pair_cap = (int(total * 1.1) + 127) // 128 * 128
            break
        pair_cap *= 2
    cfg = RasterizeConfig(width=width, height=height, pair_cap=pair_cap,
                          fwd_viewer=viewer, conic_cull=conic)
    print(f"  conic={conic} tune={tune} cap={pair_cap} "
          f"resolved={cfg.resolved(params.capacity).pair_cap}", flush=True)
    extras = params.seg_feature_normed() if viewer else None

    @jax.jit
    def step(p_feat):
        b = rasterize(params.xyz, params.scaling_activated(),
                      params.rotation_normalized(),
                      params.opacity_activated()[:, 0],
                      cm, jnp.zeros(3), cfg, shs=params.features(),
                      sh_degree=3, extras=extras).blend
        x = b.color[0, 0, 0]
        if viewer:
            x = x + b.extra[0, 0, 0]
        return p_feat + 1e-20 * x
    x = step(jnp.zeros(()))
    float(x)
    for _ in range(WARMUP):
        x = step(x)
    float(x)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        x = step(x)
    float(x)
    return ITERS / (time.perf_counter() - t0)


def main():
    from bench import make_bench_scene
    for profile in ("uniform", "trained"):
        params, make_cam = make_bench_scene(n=300_000, profile=profile)
        for conic in (False, True):
            for tune in (False, True):
                r = fps(params, make_cam, conic, tune)
                print(f"{profile:8s} conic={int(conic)} tune={int(tune)}  "
                      f"{r:6.2f} fps", flush=True)


if __name__ == "__main__":
    main()
