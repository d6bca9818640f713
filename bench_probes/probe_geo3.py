#!/usr/bin/env python
"""TPU probe (round 3): decompose the geometry training step (96 ms at
10.4 it/s, 976x728, 300k gaussians) to find the next target. Stages: fwd
rasterize, fwd+loss, full grad step pieces."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WARMUP = 12
ITERS = 10


def chain(fn, label):
    import jax
    import jax.numpy as jnp
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
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{label:<52s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_bench_scene
    from instascene_tpu.losses import l1_loss, ssim
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache,
                                              rasterize)

    width, height = 976, 728
    params, make_cam = make_bench_scene(n=300_000)
    n = params.capacity
    cam = make_cam(0, width, height)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    cap = RasterizeConfig(width=width, height=height).resolved(n).pair_cap
    _, tc, _ = compute_binning_cache(params, cm, width, height,
                                     pair_cap=cap * 2, tile_cap=128,
                                     impl="xla")
    total = int(jnp.sum(tc))
    pair_cap = (int(total * 1.1) + 127) // 128 * 128
    print(f"pairs={total} cap={pair_cap}", flush=True)
    cfg = RasterizeConfig(width=width, height=height, pair_cap=pair_cap,
                          impl="pallas")

    gt = jnp.asarray(np.random.default_rng(1).random(
        (height, width, 3)).astype(np.float32))
    bg = jnp.zeros(3)

    xyz, sc, rot = (params.xyz, params.scaling_activated(),
                    params.rotation_normalized())
    opa = params.opacity_activated()[:, 0]
    shs = params.features()

    @jax.jit
    def fwd(s):
        b = rasterize(xyz + s * 1e-30, sc, rot, opa, cm, bg, cfg,
                      shs=shs, sh_degree=3, alive=params.alive).blend
        return b.color[0, 0, 0] * 1e-20 + s
    chain(fwd, "fwd rasterize (fresh binning)")

    @jax.jit
    def fwd_loss(s):
        b = rasterize(xyz + s * 1e-30, sc, rot, opa, cm, bg, cfg,
                      shs=shs, sh_degree=3, alive=params.alive).blend
        loss = (0.8 * l1_loss(b.color, gt)
                + 0.2 * (1.0 - ssim(b.color, gt)))
        return loss * 1e-20 + s
    chain(fwd_loss, "fwd + L1+SSIM loss")

    @jax.jit
    def photometric_only(s):
        img = gt * (1.0 + s * 1e-30)
        def f(x):
            return (0.8 * l1_loss(x, gt * 0.9)
                    + 0.2 * (1.0 - ssim(x, gt * 0.9)))
        v, gr = jax.value_and_grad(f)(img)
        return (v + gr[0, 0, 0]) * 1e-20 + s
    chain(photometric_only, "L1+SSIM value_and_grad alone")

    def make_grad(fresh):
        cb = None
        if not fresh:
            cb, _, _ = compute_binning_cache(params, cm, width, height,
                                             impl="pallas",
                                             pair_cap=pair_cap)

        @jax.jit
        def g(s):
            def loss_fn(xyz_, sc_, rot_, opa_, shs_):
                b = rasterize(xyz_, sc_, rot_, opa_, cm, bg, cfg,
                              shs=shs_, sh_degree=3, alive=params.alive,
                              cached_binning=cb).blend
                return (0.8 * l1_loss(b.color, gt)
                        + 0.2 * (1.0 - ssim(b.color, gt))
                        + 0.01 * jnp.mean(b.distortion)
                        + 0.01 * jnp.mean(b.normal ** 2))
            v, gr = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
                xyz + s * 1e-30, sc, rot, opa, shs)
            return (v + gr[0][0, 0]) * 1e-20 + s
        return g
    chain(make_grad(True), "value_and_grad full loss (fresh binning)")
    chain(make_grad(False), "value_and_grad full loss (cached binning)")


if __name__ == "__main__":
    main()
