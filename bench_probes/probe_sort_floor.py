#!/usr/bin/env python
"""TPU probe (round 5, VERDICT r4 item 5): tie the 13.7 ms binning to
per-stage arithmetic the way the blend kernel is tied to FMA counts.

Stages of ops/binning.bin_gaussians at the 1080p uniform roofline shape
(300k gaussians, cap 1,398,272), each timed in isolation:
  1. the interval-expand marker scatter + gid cumsum
  2. the 2-3 seg_broadcast chains (scatter-diff + [cap] int32 cumsum each)
  3. rank→(dx,dy)→tile_id + key build (elementwise over [cap])
  4. jax.lax.sort((key, gid), int32, unstable)  ← the suspected floor
  5. searchsorted bounds + build_visits
Plus lax.sort at half/double the rows to expose the ns/key scaling, and a
16-bit-payload variant to test whether narrower payloads change the pass
cost.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WARMUP = 8
K = 4


def timed_ms(step, init, warmup=WARMUP, k=K):
    s = step(init)
    float(s)
    for _ in range(warmup):
        s = step(s)
    float(s)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(k):
            s = step(s)
        float(s)
        t1 = time.perf_counter()
        for _ in range(2 * k):
            s = step(s)
        float(s)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / k * 1e3)
    return max(best, 1e-3)


def main():
    import jax
    import jax.numpy as jnp

    cap = 1_398_272
    n = 300_000
    num_tiles = 120 * 68           # 1920x1080 / 16
    depth_bits = 17
    rng = np.random.default_rng(0)

    key0 = jnp.asarray(rng.integers(
        0, num_tiles << depth_bits, cap).astype(np.int32))
    gid0 = jnp.asarray(rng.integers(0, n, cap).astype(np.int32))

    # ---- 4. the fused sort alone, at three sizes ----
    for c in (cap // 2, cap, cap * 2):
        kk = key0[:c] if c <= cap else jnp.concatenate([key0, key0])
        gg = gid0[:c] if c <= cap else jnp.concatenate([gid0, gid0])

        @jax.jit
        def srt(s, kk=kk, gg=gg):
            k2 = kk + jnp.int32(s * 0.0)
            sk, sg = jax.lax.sort((k2, gg), num_keys=1, is_stable=False)
            return s + 1.0 + (sk[0] + sg[-1]).astype(jnp.float32) * 1e-20

        ms = timed_ms(srt, jnp.float32(0))
        print(f"lax.sort (key+payload) {c} rows: {ms:.2f} ms = "
              f"{ms * 1e6 / c:.2f} ns/key", flush=True)

    # key-only sort (how much does the payload cost?)
    @jax.jit
    def srt_k(s):
        k2 = key0 + jnp.int32(s * 0.0)
        sk = jax.lax.sort((k2,), num_keys=1, is_stable=False)[0]
        return s + 1.0 + sk[0].astype(jnp.float32) * 1e-20
    ms = timed_ms(srt_k, jnp.float32(0))
    print(f"lax.sort key-only {cap}: {ms:.2f} ms = "
          f"{ms * 1e6 / cap:.2f} ns/key", flush=True)

    # two payloads (what a segmented-sort split would add)
    @jax.jit
    def srt_2p(s):
        k2 = key0 + jnp.int32(s * 0.0)
        sk, sg, sh = jax.lax.sort((k2, gid0, gid0), num_keys=1,
                                  is_stable=False)
        return s + 1.0 + (sk[0] + sg[-1] + sh[0]).astype(jnp.float32) * 1e-20
    ms = timed_ms(srt_2p, jnp.float32(0))
    print(f"lax.sort key+2 payloads {cap}: {ms:.2f} ms = "
          f"{ms * 1e6 / cap:.2f} ns/key", flush=True)

    # ---- 1+2. the expand chains at this shape ----
    tiles_touched = jnp.asarray(
        rng.integers(1, 9, n).astype(np.int32))

    @jax.jit
    def chains(s):
        tt = tiles_touched + jnp.int32(s * 0.0)
        csum = jnp.cumsum(tt)
        offsets = csum - tt
        scatter_pos = jnp.minimum(offsets, cap)
        marker = jnp.zeros((cap + 1,), jnp.int32).at[scatter_pos].add(
            jnp.ones((n,), jnp.int32))
        gid = jnp.cumsum(marker[:cap]) - 1

        def seg_broadcast(col):
            d = col - jnp.concatenate([jnp.zeros((1,), jnp.int32), col[:-1]])
            buf = jnp.zeros((cap + 1,), jnp.int32).at[scatter_pos].add(d)
            return jnp.cumsum(buf[:cap])
        b1 = seg_broadcast((offsets << 10) | 3)
        b2 = seg_broadcast((tiles_touched << 17) | 12345)
        return s + 1.0 + (gid[-1] + b1[-1] + b2[-1]).astype(jnp.float32) * 1e-20
    ms = timed_ms(chains, jnp.float32(0))
    print(f"expand chains (marker+gid cumsum + 2 seg_broadcasts): {ms:.2f} ms",
          flush=True)

    # ---- 3. key build elementwise ----
    @jax.jit
    def keybuild(s):
        b1 = key0 + jnp.int32(s * 0.0)
        b_off = b1 >> 10
        rw = jnp.maximum(b1 & 1023, 1)
        rank = jnp.arange(cap, dtype=jnp.int32) - b_off
        dy = rank // rw
        dx = rank - dy * rw
        tile_id = (dy * 120 + dx) & (num_tiles - 1)
        kk = tile_id * (1 << depth_bits) + (b1 & ((1 << depth_bits) - 1))
        return s + 1.0 + kk[-1].astype(jnp.float32) * 1e-20
    ms = timed_ms(keybuild, jnp.float32(0))
    print(f"key build elementwise over [cap]: {ms:.2f} ms", flush=True)

    # ---- 5. bounds + visits ----
    from instascene_tpu.ops.binning import build_visits
    sorted_key = jnp.sort(key0)

    @jax.jit
    def bounds_visits(s):
        sk = sorted_key + jnp.int32(s * 0.0)
        st = sk >> depth_bits
        bounds = jnp.searchsorted(
            st, jnp.arange(num_tiles + 1, dtype=jnp.int32),
            side="left").astype(jnp.int32)
        v = build_visits(bounds[:num_tiles], bounds[1:], jnp.int32(cap),
                         cap, num_tiles)
        return s + 1.0 + (v.visit_chunk[-1] + v.visit_s0[0]
                          ).astype(jnp.float32) * 1e-20
    ms = timed_ms(bounds_visits, jnp.float32(0))
    print(f"tile bounds + build_visits: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
