#!/usr/bin/env python
"""TPU probe: fine-grained forward/backward split at bench scale."""

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
    from instascene_tpu.losses import photometric_loss, ssim
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache,
                                              rasterize)
    from instascene_tpu.pipelines.train import camera_tensors

    width, height = 976, 728
    params, make_cam = make_bench_scene(n=300_000)
    params = params.replace(seg_feature=None)
    rng = np.random.default_rng(2)
    ct = camera_tensors(make_cam(0, width, height))
    gt = jnp.asarray(rng.random((height, width, 3)).astype(np.float32))
    cam = CameraMats(ct.w2v, ct.full_proj, ct.campos)
    cfg = RasterizeConfig(width=width, height=height)

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

    cb, tc, nd = compute_binning_cache(params, cam, width, height)
    print(f"pairs={int(jnp.sum(tc))}", flush=True)

    @jax.jit
    def fwd_fresh(s):
        out = rasterize(params.xyz, params.scaling_activated(),
                        params.rotation_normalized(),
                        params.opacity_activated()[:, 0], cam, jnp.zeros(3),
                        cfg, shs=params.features(), sh_degree=3)
        return s + out.blend.color[0, 0, 0] * 1e-20

    print(f"raster fwd fresh     {chain(fwd_fresh):.1f} ms", flush=True)

    @jax.jit
    def fwd_cached(s):
        out = rasterize(params.xyz, params.scaling_activated(),
                        params.rotation_normalized(),
                        params.opacity_activated()[:, 0], cam, jnp.zeros(3),
                        cfg, shs=params.features(), sh_degree=3,
                        cached_binning=cb)
        return s + out.blend.color[0, 0, 0] * 1e-20

    print(f"raster fwd cached    {chain(fwd_cached):.1f} ms", flush=True)

    @jax.jit
    def grad_color_fresh(s):
        def loss_fn(p):
            out = rasterize(p.xyz, p.scaling_activated(),
                            p.rotation_normalized(),
                            p.opacity_activated()[:, 0], cam, jnp.zeros(3),
                            cfg, shs=p.features(), sh_degree=3)
            return jnp.mean(jnp.abs(out.blend.color - gt))
        loss, g = jax.value_and_grad(loss_fn, allow_int=True)(params)
        return s + loss + g.xyz[0, 0] * 1e-20

    print(f"grad L1-color fresh  {chain(grad_color_fresh):.1f} ms", flush=True)

    @jax.jit
    def grad_color_cached(s):
        def loss_fn(p):
            out = rasterize(p.xyz, p.scaling_activated(),
                            p.rotation_normalized(),
                            p.opacity_activated()[:, 0], cam, jnp.zeros(3),
                            cfg, shs=p.features(), sh_degree=3,
                            cached_binning=cb)
            return jnp.mean(jnp.abs(out.blend.color - gt))
        loss, g = jax.value_and_grad(loss_fn, allow_int=True)(params)
        return s + loss + g.xyz[0, 0] * 1e-20

    print(f"grad L1-color cached {chain(grad_color_cached):.1f} ms", flush=True)

    img0 = jnp.asarray(rng.random((height, width, 3)).astype(np.float32))

    @jax.jit
    def ssim_fwdbwd(s):
        def loss_fn(x):
            photo, _ = photometric_loss(x, gt, 0.2)
            return photo
        loss, g = jax.value_and_grad(loss_fn)(img0 + s * 0)
        return s + loss + g[0, 0, 0] * 1e-20

    print(f"photometric fwd+bwd  {chain(ssim_fwdbwd):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
