#!/usr/bin/env python
"""TPU probe (round 4): decompose the 80 ms geometry step (976x728, 300k
gaussians, snug cap, no_depth_dist) into fwd / bwd / loss / optimizer
shares to find the 4 ms that closes the >=13 it/s bar."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
WARMUP, ITERS = 12, 10


def chain(fn, label):
    import jax, jax.numpy as jnp
    s = jnp.zeros(())
    out = fn(s); jax.block_until_ready(out)
    for _ in range(WARMUP): out = fn(out)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS): out = fn(out)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{label:<56s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    import jax, jax.numpy as jnp
    from bench import make_bench_scene
    from instascene_tpu.losses import photometric_loss
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache,
                                              rasterize)
    from instascene_tpu.pipelines.train import (camera_tensors,
                                                geometry_loss_fn,
                                                render_for_training)

    width, height = 976, 728
    params, make_cam = make_bench_scene(n=300_000)
    n = params.capacity
    cam = make_cam(0, width, height)
    ct = camera_tensors(cam)
    cm = CameraMats(ct.w2v, ct.full_proj, ct.campos)
    _, tc, _ = compute_binning_cache(params, cm, width, height, impl="xla")
    total = int(jnp.sum(tc))
    gran = 128 * 1024
    snug = max(gran, (total * 110 // 100 + gran - 1) // gran * gran)
    print(f"pairs={total} snug={snug}", flush=True)
    cfg = RasterizeConfig(width=width, height=height, pair_cap=snug,
                          no_depth_dist=True)
    gt = jnp.asarray(np.random.default_rng(1).random(
        (height, width, 3)).astype(np.float32))
    bg = jnp.zeros(3)
    t0z = jnp.zeros((n, 3, 3), jnp.float32)

    xyz, sc, rot = (params.xyz, params.scaling_activated(),
                    params.rotation_normalized())
    opa = params.opacity_activated()[:, 0]
    shs = params.features()

    @jax.jit
    def fwd_only(s):
        b = rasterize(xyz + s * 1e-30, sc, rot, opa, cm, bg, cfg,
                      shs=shs, sh_degree=3, alive=params.alive).blend
        return b.color[0, 0, 0] * 1e-20 + s
    chain(fwd_only, "fwd rasterize only (binning+gather+kernel)")

    @jax.jit
    def fwd_train(s):
        out, rn, sn, al, sd = render_for_training(
            params.replace(xyz=xyz + s * 1e-30), cm, bg, cfg, t0z,
            ct.c2w_rot, ct.tanfovx, ct.tanfovy, 1.0)
        return out.blend.color[0, 0, 0] * 1e-20 + s
    chain(fwd_train, "fwd render_for_training (maps + surf normal)")

    def full_loss(p, t):
        return geometry_loss_fn(p, t, cm, bg, cfg, ct.c2w_rot, ct.tanfovx,
                                ct.tanfovy, 1.0, gt, None, None,
                                jnp.float32(0.2), jnp.float32(0.0),
                                jnp.float32(0.05), jnp.float32(0.0), False)

    @jax.jit
    def fwd_full_loss(s):
        v, aux = full_loss(params.replace(xyz=xyz + s * 1e-30), t0z)
        return v * 1e-20 + s
    chain(fwd_full_loss, "fwd full loss (photo+normal)")

    @jax.jit
    def vg_photo_only(s):
        def f(p, t):
            out, rn, sn, al, sd = render_for_training(
                p, cm, bg, cfg, t, ct.c2w_rot, ct.tanfovx, ct.tanfovy, 1.0)
            photo, _ = photometric_loss(out.blend.color, gt,
                                        jnp.float32(0.2))
            return photo
        v, (g, tg) = jax.value_and_grad(f, argnums=(0, 1), allow_int=True)(
            params.replace(xyz=xyz + s * 1e-30), t0z)
        return (v + g.xyz[0, 0]) * 1e-20 + s
    chain(vg_photo_only, "v&g photo-only")

    @jax.jit
    def vg_full(s):
        def f(p, t):
            return full_loss(p, t)[0]
        v, (g, tg) = jax.value_and_grad(f, argnums=(0, 1), allow_int=True)(
            params.replace(xyz=xyz + s * 1e-30), t0z)
        return (v + g.xyz[0, 0]) * 1e-20 + s
    chain(vg_full, "v&g full loss")

    # does the bwd 18-col scatter-add have its own size cliff? time the
    # gather and its transpose at the tuned cap and neighbors
    from instascene_tpu.ops.rasterize import RasterizeConfig as _RC
    cap0 = _RC(width=width, height=height, pair_cap=snug).resolved(n).pair_cap
    rng = np.random.default_rng(0)
    flat18 = jnp.asarray(rng.standard_normal((n + 1, 18)).astype(np.float32))
    for cap in (cap0 - 128, cap0, cap0 + 128, cap0 + 256):
        gid = jnp.asarray(rng.integers(0, n + 1, cap).astype(np.int32))
        dval = jnp.asarray(rng.standard_normal((cap, 18)).astype(np.float32))

        @jax.jit
        def g_only(s, gid=gid):
            return (flat18 + s * 1e-30)[gid][0, 0] * 1e-20 + s

        @jax.jit
        def sc_only(s, gid=gid, dval=dval):
            d = jnp.zeros((n + 1, 18), jnp.float32
                          ).at[gid].add(dval + s * 1e-30)
            return d[0, 0] * 1e-20 + s
        mg = chain(g_only, f"  gather cap={cap}")
        msc = chain(sc_only, f"  scatter-add 18-col cap={cap}")

    # full train_step for reference
    from instascene_tpu.config import OptimizationParams
    from instascene_tpu.models.densify import init_stats
    from instascene_tpu.models.optimizer import geometry_lrs, init_adam_state
    from instascene_tpu.pipelines.train import train_step
    opt = OptimizationParams()
    opt_state = init_adam_state(params)
    stats = init_stats(n)
    lrs = geometry_lrs(opt, 1.0, 1e-4)
    dummy = jnp.zeros(1)
    lam = tuple(jnp.float32(v) for v in (0.2, 0.0, 0.05, 0.0))
    st = {"p": params, "o": opt_state, "s": stats}

    def step_fn(s):
        p2, o2, s2, m = train_step(st["p"], st["o"], st["s"], ct.w2v,
                                   ct.full_proj, ct.campos, ct.c2w_rot, gt,
                                   dummy, dummy, bg, lrs, *lam, cfg,
                                   ct.tanfovx, ct.tanfovy, 1.0, False)
        st["p"], st["o"], st["s"] = p2, o2, s2
        return m["loss"] * 1e-20 + s
    chain(step_fn, "full train_step (v&g + adam + densify stats)")


if __name__ == "__main__":
    main()
