"""Pair-cap autotune around XLA's bimodal TPU row-gather.

The per-frame pack gather `flat[sorted_gid]` ([cap] int32 rows out of an
[N+1, D] f32 table) is the second-largest section of a 1080p frame. On the
v5e its cost is *bimodal in the row count*: most caps run ~6 ns/row, but a
sparse, deterministic set of caps (e.g. 9360/9952/10903/11096 x128) runs
~12 ns/row — 2x — with IDENTICAL index values, and the mode is insensitive
to the index pattern (random == ascending == real; bench_probes/
probe_gather_scan.py, probe_gather_form.py). No closed-form size rule
survived measurement (divisibility by 1024/2048 both have counterexamples),
but the modes are stable per (row-count, table-shape) and padding a slow cap
by +128 rows empirically lands fast.

So instead of a rule, measure: when a concrete pair cap is first chosen
(`RasterizeConfig.resolved`), time a dummy gather at {cap, cap+128, cap+256}
once (~0.5 s + 3 small compiles, cached per (cap, dim, table-rows)) and snap
to the smallest candidate within 12% of the fastest. Growing a cap is always
safe — caps are capacities; surplus slots carry the sentinel tile and are
masked everywhere.

The CUDA reference has no analogue (its gathers are warp-coalesced loads,
rasterizer_impl.cu:196-351); this is a TPU/XLA-runtime artifact handled at
the framework layer. Disable with INSTASCENE_GATHER_TUNE=0.
"""

from __future__ import annotations

import os
import time

import numpy as np

# Candidate steps above the requested cap, in pallas-chunk multiples.
_STEPS = (0, 1, 2)
_WARMUP = 8   # the runtime runs the first ~5 calls of a fresh program in a
_ITERS = 6    # slow tier (docs/PERFORMANCE.md) — warm past it before timing
_TOL = 1.12   # prefer the smallest cap within 12% of the best time

_PICK_CACHE: dict = {}   # (cap, dim, src_rows) -> chosen cap
_MS_CACHE: dict = {}     # (cap, dim, src_rows) -> measured ms (diagnostics)


def _enabled() -> bool:
    if os.environ.get("INSTASCENE_GATHER_TUNE", "1") == "0":
        return False
    import jax
    return jax.default_backend() not in ("cpu",)


def _time_gather(cap: int, dim: int, src_rows: int) -> float:
    import jax
    import jax.numpy as jnp

    key = (cap, dim, src_rows)
    if key in _MS_CACHE:
        return _MS_CACHE[key]
    rng = np.random.default_rng(cap)  # values don't matter; mode is
    src = jnp.zeros((src_rows, dim), jnp.float32)  # pattern-insensitive
    gid = jnp.asarray(rng.integers(0, src_rows, cap).astype(np.int32))

    @jax.jit
    def step(s):
        packed = (src + s * 1e-30)[gid]
        return packed[0, 0] * 1e-20 + s

    out = step(jnp.zeros(()))
    jax.block_until_ready(out)
    for _ in range(_WARMUP):
        out = step(out)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(_ITERS):
        out = step(out)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / _ITERS * 1e3
    _MS_CACHE[key] = ms
    return ms


def fast_gather_cap(cap: int, dim: int = 21, src_rows: int = 0,
                    chunk: int = 128) -> int:
    """Snap `cap` (already a chunk-multiple) to a nearby fast-gather size.

    `dim` is the packed-table column count (21 base channels; + E for
    semantic features), `src_rows` the table row count (N+1). Returns `cap`
    unchanged on CPU backends, when tuning is disabled, or if measurement
    fails for any reason — the autotune must never be able to break a
    render.
    """
    if cap <= 0 or not _enabled():
        return cap
    src_rows = src_rows or 1
    key = (cap, dim, src_rows)
    hit = _PICK_CACHE.get(key)
    if hit is not None:
        return hit
    try:
        times = [(_time_gather(cap + s * chunk, dim, src_rows),
                  cap + s * chunk) for s in _STEPS]
        best_ms = min(ms for ms, _ in times)
        pick = next(c for ms, c in times if ms <= best_ms * _TOL)
    except Exception:   # OOM at cap+2 chunks, odd backends, ... — never fatal
        pick = cap
    _PICK_CACHE[key] = pick
    return pick


def reset_gather_tune_cache() -> None:
    _PICK_CACHE.clear()
    _MS_CACHE.clear()
