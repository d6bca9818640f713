#!/usr/bin/env python
"""TPU probe: decompose the semantic loss pieces (19 ms fwd at 32k batch):
samplers, feature fetch, contrastive, 3D normalize."""

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
    print(f"{label:<56s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from instascene_tpu.semantic.contrastive import (contrastive_loss,
                                                     sample_from_csum)

    H, W, E, batch, n = 728, 976, 16, 32 * 1024, 300_000
    rng = np.random.default_rng(1)
    segmap = jnp.asarray(rng.integers(0, 40, (H, W)).astype(np.int32))
    seg_cs = jnp.cumsum((segmap.reshape(-1) > 0).astype(jnp.int32))
    ext_tiles = jnp.asarray(rng.random((2806, 28, 256)).astype(np.float32))
    featflat = jnp.asarray(rng.random((H * W, E)).astype(np.float32))
    feat3d = jnp.asarray(rng.random((n, E)).astype(np.float32))
    lab3d = jnp.asarray(rng.integers(0, 40, n).astype(np.int32))
    vis_cs = jnp.cumsum((lab3d > 0).astype(jnp.int32))
    cf = jnp.zeros((64, E))
    key = jax.random.PRNGKey(0)
    labels_flat = segmap.reshape(-1)
    tile, grid_x = 16, (W + 15) // 16

    @jax.jit
    def samplers(s):
        k = jax.random.fold_in(key, (s * 1e20).astype(jnp.int32))
        t = 0.0
        for i in range(2):
            k, sub = jax.random.split(k)
            idx, ok = sample_from_csum(sub, seg_cs, batch)
            t += idx[0] + ok
        k, sub = jax.random.split(k)
        idx, ok = sample_from_csum(sub, vis_cs, batch)
        t += idx[0]
        return t.astype(jnp.float32) * 1e-20 + s
    chain(samplers, "3x sample_from_csum")

    @jax.jit
    def fetch_tiles(s):
        k = jax.random.fold_in(key, (s * 1e20).astype(jnp.int32))
        t = 0.0
        for i in range(2):
            k, sub = jax.random.split(k)
            idx, ok = sample_from_csum(sub, seg_cs, batch)
            y, x = idx // W, idx % W
            tt = (y // tile) * grid_x + (x // tile)
            p2 = (y % tile) * tile + (x % tile)
            f = ext_tiles[tt, :, p2]
            t += jnp.sum(f[:, :E]) + labels_flat[idx][0]
        return t * 1e-20 + s
    chain(fetch_tiles, "2x sampler + tile-major fetch + label gather")

    @jax.jit
    def fetch_flat(s):
        k = jax.random.fold_in(key, (s * 1e20).astype(jnp.int32))
        t = 0.0
        for i in range(2):
            k, sub = jax.random.split(k)
            idx, ok = sample_from_csum(sub, seg_cs, batch)
            f = featflat[idx]
            t += jnp.sum(f) + labels_flat[idx][0]
        return t * 1e-20 + s
    chain(fetch_flat, "2x sampler + flat-row fetch + label gather")

    @jax.jit
    def contrast(s):
        k = jax.random.fold_in(key, (s * 1e20).astype(jnp.int32))
        t = 0.0
        for i in range(2):
            k, sub = jax.random.split(k)
            idx, ok = sample_from_csum(sub, seg_cs, batch)
            f = featflat[idx]
            l = labels_flat[idx]
            t += contrastive_loss(f, l, 64,
                                  predef_u=cf if i else None)
        return t * 1e-20 + s
    chain(contrast, "2x (sampler + fetch + contrastive_loss)")

    @jax.jit
    def loss3d(s):
        k = jax.random.fold_in(key, (s * 1e20).astype(jnp.int32))
        fn = feat3d / (jnp.linalg.norm(feat3d + s * 1e-30, axis=1,
                                       keepdims=True) + 1e-6)
        k, sub = jax.random.split(k)
        idx, ok = sample_from_csum(sub, vis_cs, batch)
        t = contrastive_loss(fn[idx], lab3d[idx], 64, predef_u=cf)
        return t * 1e-20 + s
    chain(loss3d, "3D: normalize 300k + sampler + contrastive")


if __name__ == "__main__":
    main()
