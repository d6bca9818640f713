#!/usr/bin/env python
"""TPU probe (round 4, verdict item 1): show opacity-aware tile culling on a
bench number. The uniform profile's 0.5 opacities are above the shrink
threshold (~0.353) so round-3 culling did nothing on the old bench; the
trained profile has the post-training long tail (incl. reset survivors), so
the shrink must show up as a pair-count cut and an fps delta. Also records
a geometry-init-like low-opacity variant (all 0.1, the reference init)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def pairs_and_fps(params, make_cam, opacity_cull, label,
                  width=1920, height=1080):
    import jax.numpy as jnp
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache)
    cam = make_cam(0, width, height)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    cap = RasterizeConfig(width=width, height=height).resolved(
        params.capacity).pair_cap
    _, tc, _ = compute_binning_cache(params, cm, width, height,
                                     pair_cap=cap * 2, tile_cap=128,
                                     impl="xla", opacity_cull=opacity_cull)
    total = int(jnp.sum(tc))
    print(f"{label} opacity_cull={int(opacity_cull)}: pairs={total}",
          flush=True)
    return total


def main():
    from bench import make_bench_scene
    import jax.numpy as jnp

    params, make_cam = make_bench_scene(n=300_000, profile="trained")
    t_on = pairs_and_fps(params, make_cam, True, "trained")
    t_off = pairs_and_fps(params, make_cam, False, "trained")
    print(f"trained pair ratio on/off: {t_on / t_off:.3f}", flush=True)

    # post-reset / init regime: same geometry, all opacities at 0.1
    from instascene_tpu.utils.general import inverse_sigmoid
    lo = params.replace(opacity=jnp.full_like(params.opacity,
                                              float(inverse_sigmoid(0.1))))
    l_on = pairs_and_fps(lo, make_cam, True, "init-0.1")
    l_off = pairs_and_fps(lo, make_cam, False, "init-0.1")
    print(f"init-0.1 pair ratio on/off: {l_on / l_off:.3f}", flush=True)

    for oc in (True, False):
        r = fps_oc(params, make_cam, oc)
        print(f"trained 1080p fps opacity_cull={int(oc)}: {r:.2f}",
              flush=True)
        r = fps_oc(lo, make_cam, oc)
        print(f"init-0.1 1080p fps opacity_cull={int(oc)}: {r:.2f}",
              flush=True)


def fps_oc(params, make_cam, oc, width=1920, height=1080):
    import time
    import jax, jax.numpy as jnp
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache,
                                              rasterize)
    cam = make_cam(0, width, height)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    pair_cap = RasterizeConfig(width=width, height=height).resolved(
        params.capacity).pair_cap
    for _ in range(4):
        _, tc, _ = compute_binning_cache(params, cm, width, height,
                                         pair_cap=pair_cap, tile_cap=128,
                                         impl="xla", opacity_cull=oc)
        total = int(jnp.sum(tc))
        if total < 0.95 * pair_cap:
            pair_cap = (int(total * 1.1) + 127) // 128 * 128
            break
        pair_cap *= 2
    cfg = RasterizeConfig(width=width, height=height, pair_cap=pair_cap,
                          opacity_cull=oc)

    @jax.jit
    def step(s):
        b = rasterize(params.xyz, params.scaling_activated(),
                      params.rotation_normalized(),
                      params.opacity_activated()[:, 0],
                      cm, jnp.zeros(3), cfg, shs=params.features(),
                      sh_degree=3).blend
        return s + 1e-20 * b.color[0, 0, 0]
    x = step(jnp.zeros(())); float(x)
    for _ in range(12):
        x = step(x)
    float(x)
    t0 = time.perf_counter()
    for _ in range(20):
        x = step(x)
    float(x)
    return 20 / (time.perf_counter() - t0)


if __name__ == "__main__":
    main()
