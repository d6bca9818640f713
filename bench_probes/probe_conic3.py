#!/usr/bin/env python
"""TPU probe: why does conic culling change gather+kernel time far beyond
the pair-count ratio (probe_conic2: uniform +5.5 ms, trained -10.4 ms)?
Splits the cached-binning frame into gather-only and kernel-only sections
and prints the visit counts per variant."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
WARMUP, ITERS = 10, 15


def chain(fn, label):
    import jax, jax.numpy as jnp
    s = jnp.zeros(()); out = fn(s); jax.block_until_ready(out)
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
    from instascene_tpu.ops.blend_pallas import pack_flat_cols
    from instascene_tpu.ops.blend_visits import blend_fwd_pallas_visits
    from instascene_tpu.ops.preprocess import preprocess_gaussians
    from instascene_tpu.ops.rasterize import CameraMats, compute_binning_cache

    width, height = 1920, 1080
    tile = 16; grid_x = (width + 15) // 16
    num_tiles = grid_x * ((height + 15) // 16)

    for profile in ("uniform", "trained"):
        params, make_cam = make_bench_scene(n=300_000, profile=profile)
        cam = make_cam(0, width, height)
        cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                        jnp.asarray(cam.camera_center))
        xyz, sc, rot = (params.xyz, params.scaling_activated(),
                        params.rotation_normalized())
        opa = params.opacity_activated()[:, 0]

        for conic in (False, True):
            pair_cap = 1398272
            for _ in range(4):
                cb, tc, _ = compute_binning_cache(
                    params, cm, width, height, pair_cap=pair_cap,
                    tile_cap=128, impl="pallas", conic_cull=conic)
                total = int(jnp.sum(tc))
                if total < 0.95 * pair_cap:
                    pair_cap = (int(total * 1.1) + 127) // 128 * 128
                    cb, tc, _ = compute_binning_cache(
                        params, cm, width, height, pair_cap=pair_cap,
                        tile_cap=128, impl="pallas", conic_cull=conic)
                    break
                pair_cap *= 2
            gid, vc, vt, vs0, vs1, vts = [jnp.asarray(a) for a in cb[:6]]
            V = vt.shape[0]
            work = int(np.sum(np.asarray(vs1) > np.asarray(vs0)))
            tag = f"{profile} conic={int(conic)}"
            print(f"-- {tag}: pairs={total} cap={pair_cap} visits={V} "
                  f"working={work}", flush=True)

            pre = preprocess_gaussians(
                xyz, sc, rot, cm.w2v, cm.full_proj, cm.campos, width, height,
                color=xyz * 0.0, tile=tile, alive=params.alive)
            flat0 = pack_flat_cols(pre.T, pre.xy, pre.normal_view, opa,
                                   pre.color)

            @jax.jit
            def gather_only(s, flat0=flat0, gid=gid):
                packed = (flat0 + s * 1e-30)[gid]
                return packed[0, 0] * 1e-20 + s
            chain(gather_only, f"G) gather only [{tag}]")

            packed0 = flat0[gid]

            @jax.jit
            def kernel_only(s, packed0=packed0, vt=vt, vc=vc, vs0=vs0,
                            vs1=vs1, vts=vts):
                f = blend_fwd_pallas_visits(packed0 + s * 1e-30, vt, vc, vs0,
                                            vs1, vts, num_tiles, tile,
                                            grid_x, 0)
                return (f.out[0, 0, 0]
                        + f.iout[0, 0, 0].astype(jnp.float32)) * 1e-20 + s
            chain(kernel_only, f"K) kernel only [{tag}]")


if __name__ == "__main__":
    main()
