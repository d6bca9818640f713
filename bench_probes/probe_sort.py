#!/usr/bin/env python
"""TPU probe: variadic sort cost at 1080p pair scale (chained, dedup-proof)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WARMUP = 10
ITERS = 15


def main():
    import jax
    import jax.numpy as jnp

    n = 2_249_472
    rng = np.random.default_rng(0)
    key0 = jnp.asarray(rng.integers(0, 2**30, n).astype(np.int32))
    gid0 = jnp.asarray(rng.integers(0, 300_000, n).astype(np.int32))

    def chain_time(step, state):
        state = step(state)
        jax.block_until_ready(state)
        for _ in range(WARMUP):
            state = step(state)
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state = step(state)
        jax.block_until_ready(state)
        return (time.perf_counter() - t0) / ITERS * 1e3

    perm = jnp.arange(n, dtype=jnp.int32)

    # each step re-scrambles the key from the previous outputs → no dedup
    @jax.jit
    def s3(state):
        k, g = state
        ks, gs, ps = jax.lax.sort((k, g, perm), num_keys=1)
        return (ks ^ pltshift(ps), gs)

    def pltshift(x):
        return jnp.roll(x, 1) & ((1 << 30) - 1)

    @jax.jit
    def s3_stable(state):
        k, g = state
        ks, gs, ps = jax.lax.sort((k, g, perm), num_keys=1)
        return ((ks + jnp.roll(ps, 1)) & ((1 << 30) - 1), gs)

    @jax.jit
    def s3_unstable(state):
        k, g = state
        ks, gs, ps = jax.lax.sort((k, g, perm), num_keys=1, is_stable=False)
        return ((ks + jnp.roll(ps, 1)) & ((1 << 30) - 1), gs)

    @jax.jit
    def s2_stable(state):
        k, g = state
        ks, gs = jax.lax.sort((k, g), num_keys=1)
        return ((ks + jnp.roll(gs, 1)) & ((1 << 30) - 1), gs)

    @jax.jit
    def s2_unstable(state):
        k, g = state
        ks, gs = jax.lax.sort((k, g), num_keys=1, is_stable=False)
        return ((ks + jnp.roll(gs, 1)) & ((1 << 30) - 1), gs)

    @jax.jit
    def scatter_chain(state):
        k, g = state
        out = jnp.zeros(n, jnp.int32).at[k % n].set(g, mode="drop")
        return ((k + jnp.roll(out, 1)) & ((1 << 30) - 1), g)

    @jax.jit
    def gather_chain(state):
        k, g = state
        out = g[k % n]
        return ((k + jnp.roll(out, 1)) & ((1 << 30) - 1), g)

    st0 = (key0, gid0)
    print(f"sort3 stable   {chain_time(s3_stable, st0):.1f} ms", flush=True)
    print(f"sort3 unstable {chain_time(s3_unstable, st0):.1f} ms", flush=True)
    print(f"sort2 stable   {chain_time(s2_stable, st0):.1f} ms", flush=True)
    print(f"sort2 unstable {chain_time(s2_unstable, st0):.1f} ms", flush=True)
    print(f"scatter 2.25M  {chain_time(scatter_chain, st0):.1f} ms", flush=True)
    print(f"gather 2.25M   {chain_time(gather_chain, st0):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
