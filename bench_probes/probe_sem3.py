#!/usr/bin/env python
"""TPU probe (round 3): decompose the semantic plain step (73 ms at
13.7 it/s) and measure the auto-cap slack cost in the cached-binning path."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WARMUP = 12
ITERS = 10


def chain(fn, label, *extra):
    import jax
    import jax.numpy as jnp
    s = jnp.zeros(())
    args = extra
    out = fn(s, *args)
    jax.block_until_ready(out)
    for _ in range(WARMUP):
        out = fn(out, *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(out, *args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{label:<56s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_bench_scene
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache)
    from instascene_tpu.pipelines.train_semantic import (
        render_features, single_view_and_3d_losses)

    width, height = 976, 728
    params, make_cam = make_bench_scene(n=300_000)
    cam = make_cam(0, width, height)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    rng = np.random.default_rng(1)
    segmap = jnp.asarray(rng.integers(0, 40, (height, width)
                                      ).astype(np.int32))
    lab3d = jnp.asarray(rng.integers(0, 40, params.capacity
                                     ).astype(np.int32))
    cf = jnp.zeros((64, 16))
    bg = jnp.zeros(3)
    seg_cs = jnp.cumsum((segmap.reshape(-1) > 0).astype(jnp.int32))
    vis_cs = jnp.cumsum((lab3d > 0).astype(jnp.int32))

    auto_cap = RasterizeConfig(width=width, height=height).resolved(
        params.capacity).pair_cap
    cb_auto, tc, _ = compute_binning_cache(params, cm, width, height)
    total = int(jnp.sum(tc))
    snug = (int(total * 1.05) + 127) // 128 * 128
    cb_snug, _, nd = compute_binning_cache(params, cm, width, height,
                                           pair_cap=snug)
    print(f"pairs={total} auto_cap={auto_cap} snug_cap={snug} "
          f"dropped_at_snug={int(nd)}", flush=True)

    key = jax.random.PRNGKey(0)

    def run(cap, cb):
        cfg = RasterizeConfig(width=width, height=height, pair_cap=cap,
                              bwd_extras_only=True)

        @jax.jit
        def fwd(s):
            feat = params.seg_feature * (1.0 + s * 1e-30)
            out = render_features(params, cm, bg, cfg, feat, cb)
            return out.blend.extra[0, 0, 0] * 1e-20 + s
        chain(fwd, f"fwd features (cached, cap={cap})")

        @jax.jit
        def fwd_loss(s):
            feat = params.seg_feature * (1.0 + s * 1e-30)
            out = render_features(params, cm, bg, cfg, feat, cb)
            t = single_view_and_3d_losses(
                params, feat, out, key, segmap, segmap, lab3d, cf,
                jnp.float32(1e-6), jnp.float32(2.5e-6), 32 * 1024, 64,
                False, True, seg_cs, seg_cs, vis_cs)
            return t * 1e-20 + s
        chain(fwd_loss, f"fwd + losses value (cap={cap})")

        @jax.jit
        def grad(s):
            def loss_fn(feat):
                out = render_features(params, cm, bg, cfg, feat, cb)
                return single_view_and_3d_losses(
                    params, feat, out, key, segmap, segmap, lab3d, cf,
                    jnp.float32(1e-6), jnp.float32(2.5e-6), 32 * 1024, 64,
                    False, True, seg_cs, seg_cs, vis_cs)
            v, g = jax.value_and_grad(loss_fn)(
                params.seg_feature * (1.0 + s * 1e-30))
            return (v + g[0, 0]) * 1e-20 + s
        chain(grad, f"value_and_grad (cap={cap})")

    run(auto_cap, cb_auto)
    run(snug, cb_snug)


if __name__ == "__main__":
    main()
