#!/usr/bin/env python
"""TPU probe: scan the pack-gather's ns/row over row counts to map XLA's
2x fast/slow size cliff (probe_conic4: 1398272 fast, 1273856 slow with
IDENTICAL values). Goal: a snapping rule for pair_cap that always lands on
the fast mode."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
WARMUP, ITERS = 8, 10


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
    N1 = flat0.shape[0]
    rng = np.random.default_rng(0)
    base = rng.integers(0, N1, 1_600_000).astype(np.int32)

    # known-fast, known-slow, and a sweep across the relevant band
    caps = sorted(set(
        [1398272, 1273856, 1395584, 1243264]
        + [c // 128 * 128 for c in np.linspace(1_050_000, 1_550_000, 28
                                               ).astype(int).tolist()]))
    for cap in caps:
        gid_j = jnp.asarray(base[:cap])

        @jax.jit
        def gather_only(s, gid_j=gid_j):
            packed = (flat0 + s * 1e-30)[gid_j]
            return packed[0, 0] * 1e-20 + s
        s = jnp.zeros(()); out = gather_only(s); jax.block_until_ready(out)
        for _ in range(WARMUP): out = gather_only(out)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(ITERS): out = gather_only(out)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"cap={cap:8d} ({cap // 128:6d}*128)  {ms:7.2f} ms  "
              f"{ms * 1e6 / cap:6.2f} ns/row", flush=True)


if __name__ == "__main__":
    main()
