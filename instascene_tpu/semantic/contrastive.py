"""ProtoNCE contrastive loss over sampled pixels/points, jit-compiled.

Parity: reference utils/contrastive_utils.py:18-73. Differences forced by XLA
static shapes: instead of torch.unique + relabeling, clusters live in a fixed
[0, max_labels) id space with presence masks; absent clusters are excluded from
the softmax denominator exactly as the reference's compaction does.

Semantics kept:
  * features L2-normalized with a DETACHED norm (:41)
  * prototypes u_k = per-cluster mean of normalized features, or the predefined
    class anchors when given (:44-58)
  * per-cluster temperature φ_k = clip(10 · mean||f−u_k|| / log(n_k+1000),
    0.5, 1.0), detached (:60-66)
  * loss = −Σ_i log( exp(f_i·u_{m_i}/φ_{m_i}) / Σ_k exp(f_i·u_k/φ_k) )  (:68-72)
  * label 0 dropped unless consider_negative (:28-39); labels are shifted by −1
    when dropping so cluster ids stay aligned with predef anchors
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


@partial(jax.jit, static_argnames=("max_labels", "consider_negative"))
def contrastive_loss(features: jnp.ndarray,       # [B,D]
                     labels: jnp.ndarray,         # [B] int32 raw mask ids
                     max_labels: int,
                     predef_u: Optional[jnp.ndarray] = None,  # [K,D], K>=max_labels
                     valid: Optional[jnp.ndarray] = None,     # [B] bool extra mask
                     consider_negative: bool = False,
                     temp_lambda: float = 1000.0) -> jnp.ndarray:
    b, d = features.shape
    labels = labels.astype(jnp.int32)
    ok = labels >= 0
    if not consider_negative:
        ok = ok & (labels > 0)
        labels = labels - 1
    if valid is not None:
        ok = ok & valid
    labels = jnp.clip(labels, 0, max_labels - 1)
    seg = jnp.where(ok, labels, max_labels)  # dump invalid into an extra bin

    feats = features / jax.lax.stop_gradient(
        jnp.linalg.norm(features, axis=-1, keepdims=True) + 1e-9)
    featm = jnp.where(ok[:, None], feats, 0.0)

    # per-cluster sums as ONE-HOT MATMULS on the MXU — a [K,B]x[B,*] dot is
    # far cheaper than B-row scatter-adds (TPU segment_sum lowers to scatter)
    onehot = (seg[None, :] == jnp.arange(max_labels)[:, None]
              ).astype(jnp.float32)                       # [K, B]
    cnt = onehot @ ok.astype(jnp.float32)                 # [K]
    present = cnt > 0
    cnt_safe = jnp.maximum(cnt, 1.0)

    if predef_u is not None:
        u = predef_u[:max_labels]
    else:
        fsum = jnp.einsum("kb,bd->kd", onehot, featm, precision=_HI)
        u = fsum / cnt_safe[:, None]

    diff_norm = jnp.linalg.norm(feats - u[jnp.clip(labels, 0, max_labels - 1)],
                                axis=-1)
    phi_sum = onehot @ jnp.where(ok, diff_norm, 0.0)
    phi = phi_sum / (cnt_safe * jnp.log(cnt_safe + temp_lambda))
    phi = jnp.clip(phi * 10.0, 0.5, 1.0)
    phi = jax.lax.stop_gradient(phi)

    logits = jnp.einsum("bd,kd->bk", feats, u, precision=_HI) / phi[None, :]
    expd = jnp.where(present[None, :], jnp.exp(logits), 0.0)
    denom = jnp.sum(expd, axis=1)
    own = jnp.take_along_axis(expd, labels[:, None], axis=1)[:, 0]
    log_p = jnp.log(jnp.maximum(own, 1e-30) / (denom + 1e-9))
    return -jnp.sum(jnp.where(ok, log_p, 0.0))


def sample_valid_pixels(key, valid_flat: jnp.ndarray, batch: int):
    """Uniform sample (with replacement) of `batch` indices among True entries
    of valid_flat, jit-friendly (reference samples torch.randint over the valid
    subset, train_semantic.py:126). Scatter-free: the r-th valid element is
    located by binary search on the validity prefix sum (TPU scatters are slow;
    searchsorted is a cheap gather loop). Returns (idx [batch], any_valid)."""
    return sample_from_csum(key, jnp.cumsum(valid_flat.astype(jnp.int32)),
                            batch)


def valid_ids_pack(valid_flat: jnp.ndarray) -> jnp.ndarray:
    """[M] bool -> [M+1] int32 sampler pack: the valid indices compacted to
    the front in ascending order (stable argsort), last element = n_valid.
    Setup-time companion of sample_from_ids."""
    order = jnp.argsort(~valid_flat, stable=True).astype(jnp.int32)
    nv = jnp.sum(valid_flat.astype(jnp.int32))
    return jnp.concatenate([order, nv[None]])


def sample_from_ids(key, pack: jnp.ndarray, batch: int):
    """Uniform sample of `batch` valid indices from a valid_ids_pack.

    Same distribution as the csum/searchsorted sampler (the pack IS the
    inverse CDF, tabulated), but one random gather instead of a 32k-wide
    binary search — measured ~7 ms -> ~0.3 ms per call at 710k candidates
    on v5e (searchsorted lowers to ~20 random gathers per sample)."""
    nv = pack[-1]
    r = jax.random.randint(key, (batch,), 0, jnp.maximum(nv, 1))
    return pack[r], nv > 0


def sample_from_csum(key, csum: jnp.ndarray, batch: int):
    """sample_valid_pixels given a precomputed validity prefix sum. In
    semantic training the validity masks (segmap labels, frozen-geometry
    visibility) are per-camera constants, so trainers precompute the cumsum
    once per camera and the hot loop pays only randint + searchsorted."""
    n_valid = csum[-1]
    r = jax.random.randint(key, (batch,), 0, jnp.maximum(n_valid, 1))
    idx = jnp.searchsorted(csum, r, side="right").astype(jnp.int32)
    return jnp.minimum(idx, csum.shape[0] - 1), n_valid > 0
