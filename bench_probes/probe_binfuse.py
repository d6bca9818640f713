#!/usr/bin/env python
"""TPU probe for the fused-binning design (round 3): decompose the 1080p
frame into preprocess / chains+expand / sort / aligned-scatter / pack-gather /
blend, and time pack-gather variants (row gather vs transposed lane gather vs
narrower rows) to pick the replacement structure.
"""

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
    print(f"{label:<44s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_bench_scene
    from instascene_tpu.ops.binning import aligned_cap, bin_gaussians
    from instascene_tpu.ops.preprocess import preprocess_gaussians
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache, rasterize)

    width, height = 1920, 1080
    tile = 16
    grid_x = (width + 15) // 16
    num_tiles = grid_x * ((height + 15) // 16)
    params, make_cam = make_bench_scene(n=300_000)
    n = params.capacity
    cam = make_cam(0, width, height)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))

    cap0 = RasterizeConfig(width=width, height=height).resolved(n).pair_cap
    for _ in range(4):
        _, tc, _ = compute_binning_cache(params, cm, width, height,
                                         pair_cap=cap0, tile_cap=128,
                                         impl="xla")
        total = int(jnp.sum(tc))
        if total < 0.95 * cap0:
            break
        cap0 *= 2
    pair_cap = (int(total * 1.3) + 127) // 128 * 128
    acap = aligned_cap(pair_cap, num_tiles)
    print(f"true pairs={total} pair_cap={pair_cap} acap={acap} "
          f"({acap/total:.2f}x real)", flush=True)

    xyz, sc, rot = (params.xyz, params.scaling_activated(),
                    params.rotation_normalized())
    opa = params.opacity_activated()[:, 0]
    shs = params.features()
    cfg = RasterizeConfig(width=width, height=height, pair_cap=pair_cap,
                          impl="pallas")

    # --- full frame (pallas impl, fresh binning)
    @jax.jit
    def full_frame(s):
        out = rasterize(xyz + s * 1e-30, sc, rot, opa, cm, jnp.zeros(3), cfg,
                        shs=shs, sh_degree=3)
        return out.blend.color[0, 0, 0] * 1e-20 + s
    chain(full_frame, "full rasterize frame (pallas)")

    # --- preprocess alone
    @jax.jit
    def pre_only(s):
        pre = preprocess_gaussians(xyz + s * 1e-30, sc, rot, cm.w2v,
                                   cm.full_proj, cm.campos, width, height,
                                   shs=shs, sh_degree=3, tile=tile,
                                   alive=params.alive)
        return pre.T[0, 0, 0] * 1e-20 + s
    chain(pre_only, "preprocess only")

    # --- preprocess + full aligned binning
    @jax.jit
    def pre_bin(s):
        pre = preprocess_gaussians(xyz + s * 1e-30, sc, rot, cm.w2v,
                                   cm.full_proj, cm.campos, width, height,
                                   shs=shs, sh_degree=3, tile=tile,
                                   alive=params.alive)
        b = bin_gaussians(pre, width, height, pair_cap, 0, tile=tile,
                          layout="aligned")
        return b.aligned.aligned_gid[0].astype(jnp.float32) * 1e-20 + s
    chain(pre_bin, "preprocess + aligned binning")

    # --- isolated sort at pair_cap
    rng = np.random.default_rng(0)
    key0 = jnp.asarray(rng.integers(0, 1 << 30, pair_cap).astype(np.int32))
    gid0 = jnp.asarray(rng.integers(0, n, pair_cap).astype(np.int32))

    @jax.jit
    def sort_only(s):
        k = key0 + (s * 1e-30).astype(jnp.int32)
        sk, sg = jax.lax.sort((k, gid0), num_keys=1, is_stable=False)
        return sk[0].astype(jnp.float32) * 1e-20 + s
    chain(sort_only, f"pair sort alone ({pair_cap})")

    # --- pack gather variants
    cb, tc2, nd2 = compute_binning_cache(params, cm, width, height,
                                         impl="pallas", pair_cap=pair_cap)
    aligned_gid = cb[0]
    D = 34
    flat = jnp.asarray(rng.random((n + 1, D)).astype(np.float32))
    flatT = jnp.asarray(np.ascontiguousarray(
        np.asarray(flat).T))                       # [D, N+1]

    @jax.jit
    def g_row(s):
        f = flat + s * 1e-30
        packed = f[aligned_gid]
        return packed[0, 0] * 1e-20 + s
    chain(g_row, f"pack row-gather [{acap},{D}]")

    @jax.jit
    def g_row18(s):
        f = flat[:, :18] + s * 1e-30
        packed = f[aligned_gid]
        return packed[0, 0] * 1e-20 + s
    chain(g_row18, f"pack row-gather [{acap},18]")

    @jax.jit
    def g_lane(s):
        f = flatT + s * 1e-30
        packed = jnp.take(f, aligned_gid, axis=1)   # [D, acap]
        return packed[0, 0] * 1e-20 + s
    chain(g_lane, f"pack lane-gather [{D},{acap}]")

    @jax.jit
    def g_lane_t(s):
        f = flatT + s * 1e-30
        packed = jnp.take(f, aligned_gid, axis=1).T  # [acap, D] relayout
        return packed[0, 0] * 1e-20 + s
    chain(g_lane_t, "pack lane-gather + transpose to slot-major")

    # --- aligned scatter isolation: scatter sorted gid -> acap slots
    a_of = jnp.asarray(rng.permutation(acap)[:pair_cap].astype(np.int32))
    sg = gid0

    @jax.jit
    def scat(s):
        g = sg + (s * 1e-30).astype(jnp.int32)
        out = jnp.full((acap,), n, jnp.int32).at[a_of].set(g, mode="drop")
        return out[0].astype(jnp.float32) * 1e-20 + s
    chain(scat, f"aligned-gid scatter ({pair_cap}->{acap})")

    # --- N-space ops used by the fused design
    @jax.jit
    def n_sortN(s):
        d = xyz[:, 2] + s * 1e-30
        k, v = jax.lax.sort((d, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
        return k[0] * 1e-20 + s
    chain(n_sortN, f"gaussian depth sort alone ({n})")

    @jax.jit
    def n_compact(s):
        f = flat[:n] + s * 1e-30
        perm = jnp.asarray(rng.permutation(n).astype(np.int32))
        return f[perm][0, 0] * 1e-20 + s
    chain(n_compact, f"N-row gather [{n},{D}]")


if __name__ == "__main__":
    main()
