#!/usr/bin/env python
"""TPU probe: geometry train step ablation at bench scale (300k, 976x728)."""

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
    from instascene_tpu.losses import photometric_loss
    from instascene_tpu.models.densify import init_stats
    from instascene_tpu.models.optimizer import geometry_lrs, init_adam_state
    from instascene_tpu.config import OptimizationParams
    from instascene_tpu.ops.rasterize import CameraMats, RasterizeConfig
    from instascene_tpu.pipelines.train import (camera_tensors,
                                                render_for_training,
                                                train_step)

    width, height = 976, 728
    params, make_cam = make_bench_scene(n=300_000)
    params = params.replace(seg_feature=None)
    rng = np.random.default_rng(2)
    cams = [camera_tensors(make_cam(i, width, height)) for i in range(4)]
    gt = jnp.asarray(rng.random((height, width, 3)).astype(np.float32))
    cfg = RasterizeConfig(width=width, height=height)
    opt = OptimizationParams()
    opt_state = init_adam_state(params)
    stats = init_stats(params.capacity)
    lrs = geometry_lrs(opt, 1.0, 1e-4)
    ct = cams[0]

    def chain(fn, n_out=1):
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

    cam = CameraMats(ct.w2v, ct.full_proj, ct.campos)

    @jax.jit
    def fwd_loss(s):
        out, rn, sn, alpha, _ = render_for_training(
            params, cam, jnp.zeros(3), cfg, None, ct.c2w_rot,
            ct.tanfovx, ct.tanfovy, 1.0)
        photo, _ = photometric_loss(out.blend.color, gt, 0.2)
        ne = jnp.mean(1.0 - jnp.sum(rn * sn, axis=-1))
        return s + photo + 0.05 * ne

    print(f"fwd loss eval      {chain(fwd_loss):.1f} ms", flush=True)

    @jax.jit
    def fwd_photo_only(s):
        out, rn, sn, alpha, _ = render_for_training(
            params, cam, jnp.zeros(3), cfg, None, ct.c2w_rot,
            ct.tanfovx, ct.tanfovy, 1.0)
        photo, _ = photometric_loss(out.blend.color, gt, 0.2)
        return s + photo

    print(f"fwd photo only     {chain(fwd_photo_only):.1f} ms", flush=True)

    @jax.jit
    def grad_full(s):
        t0_ = jnp.zeros((params.capacity, 3, 3), jnp.float32)

        def loss_fn(p, t_offset):
            out, rn, sn, alpha, _ = render_for_training(
                p, cam, jnp.zeros(3), cfg, t_offset, ct.c2w_rot,
                ct.tanfovx, ct.tanfovy, 1.0)
            photo, _ = photometric_loss(out.blend.color, gt, 0.2)
            ne = jnp.mean(1.0 - jnp.sum(rn * sn, axis=-1))
            return photo + 0.05 * ne
        loss, (g, tg) = jax.value_and_grad(loss_fn, argnums=(0, 1),
                                           allow_int=True)(params, t0_)
        return s + loss + tg[0, 0, 0] + g.xyz[0, 0]

    print(f"fwd+bwd (no adam)  {chain(grad_full):.1f} ms", flush=True)

    @jax.jit
    def grad_photo_only(s):
        def loss_fn(p):
            out, rn, sn, alpha, _ = render_for_training(
                p, cam, jnp.zeros(3), cfg, None, ct.c2w_rot,
                ct.tanfovx, ct.tanfovy, 1.0)
            photo, _ = photometric_loss(out.blend.color, gt, 0.2)
            return photo
        loss, g = jax.value_and_grad(loss_fn, allow_int=True)(params)
        return s + loss + g.xyz[0, 0]

    print(f"fwd+bwd photo only {chain(grad_photo_only):.1f} ms", flush=True)

    # full step for reference
    def full(s):
        nonlocal params, opt_state, stats
        p, o, st, m = train_step(params, opt_state, stats,
                                 ct.w2v, ct.full_proj, ct.campos, ct.c2w_rot,
                                 gt, jnp.zeros(1), jnp.zeros(1), jnp.zeros(3),
                                 lrs, 0.2, 0.0, 0.05, 0.0, cfg,
                                 ct.tanfovx, ct.tanfovy, 1.0, False)
        return s + m["loss"]

    print(f"full train step    {chain(full):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
