#!/usr/bin/env python
"""TPU probe: at a known-SLOW pack-gather cap (probe_gather_scan found a
~2x bimodal ns/row with no obvious size rule), try alternative gather
formulations to find one that always lands in the fast mode. Also re-runs
the known-slow caps to confirm the mode is deterministic per (cap, form).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
WARMUP, ITERS = 8, 10

SLOW = [1198080, 1273856, 1395584, 1420288]
FAST = [1272192, 1398272]


def bench(fn, s):
    import jax
    out = fn(s); jax.block_until_ready(out)
    for _ in range(WARMUP): out = fn(out)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS): out = fn(out)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    import jax, jax.numpy as jnp
    from bench import make_bench_scene
    from instascene_tpu.ops.blend_pallas import pack_flat_cols
    from instascene_tpu.ops.preprocess import preprocess_gaussians
    from instascene_tpu.ops.rasterize import CameraMats

    width, height = 1920, 1080
    params, make_cam = make_bench_scene(n=300_000, profile="uniform")
    cam = make_cam(0, width, height)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    pre = preprocess_gaussians(
        params.xyz, params.scaling_activated(), params.rotation_normalized(),
        cm.w2v, cm.full_proj, cm.campos, width, height,
        color=params.xyz * 0.0, alive=params.alive)
    flat0 = pack_flat_cols(pre.T, pre.xy, pre.normal_view,
                           params.opacity_activated()[:, 0], pre.color)
    N1, D = flat0.shape
    print(f"flat0 {flat0.shape} {flat0.dtype}")
    rng = np.random.default_rng(0)
    base = rng.integers(0, N1, 1_600_000).astype(np.int32)

    for cap in SLOW + FAST:
        gid_j = jnp.asarray(base[:cap])

        @jax.jit
        def plain(s, gid_j=gid_j):
            packed = (flat0 + s * 1e-30)[gid_j]
            return packed[0, 0] * 1e-20 + s

        @jax.jit
        def two_half(s, gid_j=gid_j, cap=cap):
            f = flat0 + s * 1e-30
            h = cap // 2 // 128 * 128
            a = f[gid_j[:h]]
            b = f[gid_j[h:]]
            return a[0, 0] * 1e-20 + b[0, 0] * 1e-20 + s

        @jax.jit
        def take_(s, gid_j=gid_j):
            packed = jnp.take(flat0 + s * 1e-30, gid_j, axis=0,
                              indices_are_sorted=False, unique_indices=False)
            return packed[0, 0] * 1e-20 + s

        @jax.jit
        def gid2d(s, gid_j=gid_j, cap=cap):
            f = flat0 + s * 1e-30
            g2 = gid_j.reshape(cap // 128, 128)
            packed = f[g2]          # [cap//128, 128, D]
            return packed[0, 0, 0] * 1e-20 + s

        @jax.jit
        def pad1(s, gid_j=gid_j):
            f = flat0 + s * 1e-30
            g = jnp.concatenate([gid_j, jnp.zeros((128,), jnp.int32)])
            packed = f[g]
            return packed[0, 0] * 1e-20 + s

        row = [f"cap={cap:8d}"]
        for name, fn in [("plain", plain), ("2half", two_half),
                         ("take", take_), ("gid2d", gid2d), ("pad+128", pad1)]:
            ms = bench(fn, jnp.zeros(()))
            row.append(f"{name}={ms:6.2f}ms({ms * 1e6 / cap:5.2f}ns)")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
