#!/usr/bin/env python
"""TPU probe: the pack gather runs at ~6.4 OR ~12.2 ns/row across binning
variants (probe_conic3) — a clean 2x bimodality. Separate the causes:
row COUNT (cap) vs gid VALUES (pattern/locality). All cases gather from the
same flat0 [N+1, D] array on the uniform profile."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
WARMUP, ITERS = 10, 15


def chain(fn, label, rows):
    import jax, jax.numpy as jnp
    s = jnp.zeros(()); out = fn(s); jax.block_until_ready(out)
    for _ in range(WARMUP): out = fn(out)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS): out = fn(out)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{label:<46s} {ms:8.2f} ms  {ms * 1e6 / rows:6.2f} ns/row",
          flush=True)
    return ms


def main():
    import jax, jax.numpy as jnp
    from bench import make_bench_scene
    from instascene_tpu.ops.blend_pallas import pack_flat_cols
    from instascene_tpu.ops.preprocess import preprocess_gaussians
    from instascene_tpu.ops.rasterize import CameraMats, compute_binning_cache

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
    print(f"flat0 {flat0.shape}", flush=True)

    caches = {}
    for conic in (False, True):
        cap = {False: 1398272, True: 1273856}[conic]
        cb, tc, _ = compute_binning_cache(params, cm, width, height,
                                          pair_cap=cap, tile_cap=128,
                                          impl="pallas", conic_cull=conic)
        caches[conic] = np.asarray(cb[0])
    gid0 = caches[False]
    gid1 = caches[True]

    rng = np.random.default_rng(0)
    cases = [
        ("gid0 full (1398272)", gid0),
        ("gid0 truncated to 1273856", gid0[:1273856]),
        ("gid1 full (1273856)", gid1),
        ("gid1 padded to 1398272", np.concatenate(
            [gid1, np.full(1398272 - len(gid1), N1 - 1, gid1.dtype)])),
        ("random gid (1398272)", rng.integers(
            0, N1, 1398272).astype(gid1.dtype)),
        ("ascending gid (1398272)", (np.arange(1398272) % N1
                                     ).astype(gid1.dtype)),
    ]
    for label, gid in cases:
        gid_j = jnp.asarray(gid)

        @jax.jit
        def gather_only(s, gid_j=gid_j):
            packed = (flat0 + s * 1e-30)[gid_j]
            return packed[0, 0] * 1e-20 + s
        chain(gather_only, label, len(gid))


if __name__ == "__main__":
    main()
