"""Gaussian-axis sharding for the embarrassingly-parallel per-point stages.

The N-gaussian axis (10^5-10^6) is the natural model axis: KNN init and
per-gaussian preprocessing have no cross-point dependencies, so they shard
trivially over a mesh axis (queries sharded, keys replicated for KNN —
collectives ride ICI)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_HI = jax.lax.Precision.HIGHEST


def sharded_mean_dist2_knn3(points: jnp.ndarray, mesh: Mesh,
                            axis: str = "data") -> jnp.ndarray:
    """Exact 3-NN mean squared distance with the query axis sharded over
    `axis` (keys replicated). Self-index excluded; padded rows ignored."""
    from jax.experimental.shard_map import shard_map

    n = points.shape[0]
    nd = mesh.shape[axis]
    n_pad = ((n + nd - 1) // nd) * nd
    pts = jnp.concatenate(
        [points.astype(jnp.float32),
         jnp.full((n_pad - n, 3), 1e18, jnp.float32)], axis=0)
    big = jnp.float32(jnp.finfo(jnp.float32).max / 4)

    def local(q_shard, keys):
        shard_size = q_shard.shape[0]
        start = jax.lax.axis_index(axis) * shard_size
        qidx = start + jnp.arange(shard_size)
        kidx = jnp.arange(keys.shape[0])
        qq = jnp.sum(q_shard * q_shard, axis=-1)
        kk = jnp.sum(keys * keys, axis=-1)
        d2 = qq[:, None] + kk[None, :] - 2.0 * jnp.dot(q_shard, keys.T,
                                                       precision=_HI)
        d2 = jnp.maximum(d2, 0.0)
        d2 = jnp.where(qidx[:, None] == kidx[None, :], big, d2)
        d2 = jnp.where(kidx[None, :] < n, d2, big)
        top3 = -jax.lax.top_k(-d2, 3)[0]
        return jnp.mean(top3, axis=1)

    fn = shard_map(local, mesh=mesh, in_specs=(P(axis), P()),
                   out_specs=P(axis))
    return fn(pts, pts)[:n]
