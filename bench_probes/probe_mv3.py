#!/usr/bin/env python
"""TPU probe (round 5): where does the multi-view block's ~43.7 ms/view go,
and why did the sampled-done fast path (done0) barely move the bench?

Decomposes ONE extras-only view render (bench scale: 300k gaussians,
976x728, E=16, cached visit binning) into:
  (a) preprocess+pack only              (c) fwd + done0
  (b) fwd full                          (d) fwd+bwd (value_and_grad)
  (e) fwd+bwd + done0                   (f) chain reduce alone
on BOTH bench profiles (uniform opacity-0.5 and trained long-tail) — the
uniform profile saturates every pixel in ~14 splats, so the whole-visit
skip may already fire without done0; the trained profile is the one real
workloads resemble.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WARMUP = 6
K = 6


def timed_ms(run, warmup=WARMUP, k=K):
    out = run()
    np.asarray(out)
    for _ in range(warmup):
        out = run()
    np.asarray(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(k):
            out = run()
        np.asarray(out)
        t1 = time.perf_counter()
        for _ in range(2 * k):
            out = run()
        np.asarray(out)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / k * 1e3)
    return max(best, 1e-3)


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache)
    from instascene_tpu.pipelines.train import camera_tensors
    from instascene_tpu.pipelines.train_semantic import (_done0_from_idx,
                                                         render_features)

    W, H, E = 976, 728, 16
    for profile in ("uniform", "trained"):
        params, make_cam = bench.make_bench_scene(n=300_000, profile=profile)
        ct = camera_tensors(make_cam(1, W, H))
        cam = CameraMats(ct.w2v, ct.full_proj, ct.campos)
        _, tc, _ = compute_binning_cache(params, cam, W, H, tile_cap=128,
                                         impl="xla")
        total = int(jnp.sum(tc))
        cap = (int(total * 1.1) + 1023) // 1024 * 1024
        cb, _, nd = compute_binning_cache(params, cam, W, H, pair_cap=cap,
                                          extras_dim=E, tune_gather=False)
        assert int(nd) == 0
        cfg = RasterizeConfig(width=W, height=H, bwd_extras_only=True,
                              extras_dim=E, pair_cap=cap, tune_gather=False)
        feat0 = params.seg_feature
        rng = np.random.default_rng(3)
        idx = jnp.asarray(rng.integers(0, H * W, 6554).astype(np.int32))
        done0 = _done0_from_idx([idx], W, H, 16)
        t0 = jnp.asarray(rng.integers(0, ((W + 15) // 16) * ((H + 15) // 16),
                                      6554).astype(np.int32))
        p0 = jnp.asarray(rng.integers(0, 256, 6554).astype(np.int32))

        @jax.jit
        def fwd(s, feat, d0):
            out = render_features(params, cam, jnp.zeros(3), cfg,
                                  feat + s * 0.0, cb, done0=d0).blend
            f = out.extra_tiles[t0, :, p0]
            return jnp.sum(f) * 1e-20 + s + 1.0

        @jax.jit
        def fwdbwd(s, feat, d0):
            def loss(ft):
                out = render_features(params, cam, jnp.zeros(3), cfg, ft,
                                      cb, done0=d0).blend
                return jnp.sum(out.extra_tiles[t0, :, p0] ** 2)
            l, g = jax.value_and_grad(loss)(feat + s * 0.0)
            return jnp.sum(g) * 1e-20 + l * 1e-20 + s + 1.0

        # chain reduce alone (bwd reduction): gather+cumsum+segment-diff
        gid_order, goff, gcs = cb.gid_order, cb.gauss_offsets, cb.gauss_csum
        d_sorted = jnp.asarray(
            rng.standard_normal((cap, E)).astype(np.float32))

        @jax.jit
        def chain(s, d):
            dg = (d + s * 0.0)[gid_order]
            c = jnp.concatenate([jnp.zeros((1, E), d.dtype),
                                 jnp.cumsum(dg, axis=0)], axis=0)
            r = c[gcs] - c[goff]
            return jnp.sum(r) * 1e-20 + s + 1.0

        def chained(fn, *args):
            box = [jnp.float32(0)]

            def run():
                box[0] = fn(box[0], *args)
                return box[0]
            return run

        print(f"--- profile={profile} total={total} cap={cap}", flush=True)
        print(f"fwd            : {timed_ms(chained(fwd, feat0, None)):7.2f} ms",
              flush=True)
        print(f"fwd+done0      : {timed_ms(chained(fwd, feat0, done0)):7.2f} ms",
              flush=True)
        print(f"fwd+bwd        : {timed_ms(chained(fwdbwd, feat0, None)):7.2f} ms",
              flush=True)
        print(f"fwd+bwd+done0  : {timed_ms(chained(fwdbwd, feat0, done0)):7.2f} ms",
              flush=True)
        print(f"chain reduce   : {timed_ms(chained(chain, d_sorted)):7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
