"""Mean squared distance to the 3 nearest neighbors, for initial surfel scales.

TPU-native replacement of simple-knn (submodules/simple-knn/simple_knn.cu:46-222
distCUDA2): the reference prunes candidates with Morton-ordered boxes; here the
MXU makes brute force the faster design — blocked |q|²+|p|²−2qᵀp distance tiles
with a running top-3 merge. Exact (self index excluded), deterministic.

Sole consumer: initial scale = log(sqrt(mean 3-NN dist²))
(scene/gaussian_model.py:191-192).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


@partial(jax.jit, static_argnames=("block", "chunk"))
def mean_dist2_knn3(points: jnp.ndarray, block: int = 1024,
                    chunk: int = 16384) -> jnp.ndarray:
    """points [N,3] → [N] mean squared distance to 3 nearest other points.

    Padded internally to block/chunk multiples; padding uses +inf distances."""
    n = points.shape[0]
    pts = points.astype(jnp.float32)
    n_pad = ((n + block - 1) // block) * block
    n_key = ((n + chunk - 1) // chunk) * chunk
    big = jnp.float32(jnp.finfo(jnp.float32).max / 4)
    q = jnp.concatenate(
        [pts, jnp.zeros((n_pad - n, 3), jnp.float32)], axis=0)
    k = jnp.concatenate(
        [pts, jnp.full((n_key - n, 3), 1e18, jnp.float32)], axis=0)
    kk = jnp.sum(k * k, axis=-1)

    n_qblocks = n_pad // block
    n_kchunks = n_key // chunk

    def query_block(qb):
        qpts = jax.lax.dynamic_slice(q, (qb * block, 0), (block, 3))
        qidx = qb * block + jnp.arange(block)
        qq = jnp.sum(qpts * qpts, axis=-1)

        def key_chunk(kc, best):
            kpts = jax.lax.dynamic_slice(k, (kc * chunk, 0), (chunk, 3))
            kidx = kc * chunk + jnp.arange(chunk)
            kkc = jax.lax.dynamic_slice(kk, (kc * chunk,), (chunk,))
            d2 = (qq[:, None] + kkc[None, :]
                  - 2.0 * jnp.dot(qpts, kpts.T, precision=_HI))
            d2 = jnp.maximum(d2, 0.0)
            d2 = jnp.where(qidx[:, None] == kidx[None, :], big, d2)
            d2 = jnp.where(kidx[None, :] < n, d2, big)
            top3 = -jax.lax.top_k(-d2, 3)[0]              # [block,3] ascending
            merged = jnp.concatenate([best, top3], axis=1)
            return -jax.lax.top_k(-merged, 3)[0]

        best0 = jnp.full((block, 3), big, jnp.float32)
        best = jax.lax.fori_loop(
            0, n_kchunks, lambda i, b: key_chunk(i, b), best0)
        return jnp.mean(best, axis=1)

    out = jax.lax.map(query_block, jnp.arange(n_qblocks))
    return out.reshape(-1)[:n]
