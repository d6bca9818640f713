#!/usr/bin/env python
"""TPU probe: per-gaussian grad reduction strategies at semantic scale.

d_aligned [ACAP, E] per-slot grads -> d_gauss [N+1, E].
  A) scatter-add keyed by aligned_gid (padded to various widths)
  B) inverse-permutation gather -> cumsum -> segment-boundary diffs
     (index arrays precomputable at binning-cache time)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WARMUP = 10
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    ACAP = 1_572_864          # 1.5M aligned slots
    N = 300_000
    E = int(os.environ.get("E", 16))
    rng = np.random.default_rng(0)
    # realistic: slots grouped by tile, each gaussian touching ~5 tiles
    gid = rng.integers(0, N, ACAP).astype(np.int32)
    d_aligned = jnp.asarray(rng.normal(0, 1, (ACAP, E)).astype(np.float32))
    aligned_gid = jnp.asarray(gid)
    # expansion order: pairs grouped by gaussian
    order = np.argsort(gid, kind="stable")
    aligned_of_orig = jnp.asarray(np.argsort(order).astype(np.int32))
    counts = np.bincount(gid, minlength=N)
    csum = np.cumsum(counts)
    offsets = csum - counts
    gauss_offsets = jnp.asarray(offsets.astype(np.int32))
    gauss_csum = jnp.asarray(csum.astype(np.int32))
    orig_of_aligned = jnp.asarray(order.astype(np.int32))

    def chain(fn):
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
        return (time.perf_counter() - t0) / ITERS * 1e3

    for pad_to in (E, 18, 24, 32):
        if pad_to < E:
            continue

        @jax.jit
        def scat(s, pad_to=pad_to):
            d = d_aligned + s * 1e-20
            if pad_to > E:
                d = jnp.concatenate(
                    [d, jnp.zeros((ACAP, pad_to - E), d.dtype)], axis=1)
            r = jnp.zeros((N + 1, pad_to), d.dtype).at[aligned_gid].add(d)
            return s + r[0, 0] * 1e-20

        print(f"A scatter pad{pad_to:>2}     {chain(scat):7.1f} ms",
              flush=True)

    @jax.jit
    def chain_b(s):
        d = d_aligned + s * 1e-20
        d_orig = d[aligned_of_orig]
        c = jnp.concatenate([jnp.zeros((1, E), d.dtype),
                             jnp.cumsum(d_orig, axis=0)], axis=0)
        r = c[gauss_csum] - c[gauss_offsets]
        return s + r[0, 0] * 1e-20

    print(f"B gather+cumsum+diff {chain_b(jnp.zeros(())) * 0 + 0}"
          if False else f"B gather+cumsum+diff {chain(chain_b):7.1f} ms",
          flush=True)

    # B': gather aligned->orig done as take along sorted order
    @jax.jit
    def chain_b2(s):
        d = d_aligned + s * 1e-20
        d_orig = d[orig_of_aligned]   # gather by sorted-order index
        c = jnp.concatenate([jnp.zeros((1, E), d.dtype),
                             jnp.cumsum(d_orig, axis=0)], axis=0)
        r = c[gauss_csum] - c[gauss_offsets]
        return s + r[0, 0] * 1e-20

    print(f"B' sortorder gather  {chain(chain_b2):7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
