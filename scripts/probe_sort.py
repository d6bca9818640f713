#!/usr/bin/env python
"""TPU probe: variadic sort cost at 1080p pair scale + binning breakdown."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WARMUP = 10
ITERS = 15


def timed(fn, *args):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(WARMUP):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    import jax
    import jax.numpy as jnp

    n = 2_249_472
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 2**30, n).astype(np.int32))
    gid = jnp.asarray(rng.integers(0, 300_000, n).astype(np.int32))
    perm = jnp.arange(n, dtype=jnp.int32)

    s3 = jax.jit(lambda k, g, p: jax.lax.sort((k, g, p), num_keys=1))
    s2 = jax.jit(lambda k, g: jax.lax.sort((k, g), num_keys=1))
    s3u = jax.jit(lambda k, g, p: jax.lax.sort((k, g, p), num_keys=1,
                                               is_stable=False))
    s2u = jax.jit(lambda k, g: jax.lax.sort((k, g), num_keys=1,
                                            is_stable=False))
    print(f"sort3 stable   {timed(s3, key, gid, perm):.1f} ms", flush=True)
    print(f"sort2 stable   {timed(s2, key, gid):.1f} ms", flush=True)
    print(f"sort3 unstable {timed(s3u, key, gid, perm):.1f} ms", flush=True)
    print(f"sort2 unstable {timed(s2u, key, gid):.1f} ms", flush=True)

    # argsort-style: sort key+perm then gather payloads
    def s_gather(k, g, p):
        ks, ps = jax.lax.sort((k, p), num_keys=1, is_stable=False)
        return ks, g[ps], ps
    print(f"sort2+gather   {timed(jax.jit(s_gather), key, gid, perm):.1f} ms",
          flush=True)

    # scatter probe: the aligned_of_orig inverse-permutation scatter
    a = jnp.zeros(n, jnp.int32)
    sc = jax.jit(lambda p, v: a.at[p].set(v, mode="drop"))
    print(f"perm scatter   {timed(sc, gid % n, perm):.1f} ms", flush=True)

    # gather probe: the [pair_cap, 5] row gather
    tab = jnp.asarray(rng.random((300_001, 5)).astype(np.float32))
    ga = jax.jit(lambda t, i: t[i])
    print(f"row gather 5f  {timed(ga, tab, gid):.1f} ms", flush=True)

    # segment boundaries
    st = jax.jit(lambda k: jnp.searchsorted(k, jnp.arange(8160, dtype=jnp.int32) * (1 << 18), side="left"))
    ks = jnp.sort(key)
    print(f"searchsorted   {timed(st, ks):.1f} ms", flush=True)

    # cumsum at pair scale
    cs = jax.jit(lambda x: jnp.cumsum(x))
    print(f"cumsum 2.25M   {timed(cs, gid):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
