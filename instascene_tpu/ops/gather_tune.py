"""Pair-cap autotune around XLA's bimodal TPU row-gather.

The per-frame pack gather `flat[sorted_gid]` ([cap] int32 rows out of an
[N+1, D] f32 table) is the second-largest section of a 1080p frame. On the
v5e its cost is *bimodal-to-trimodal in the row count*: most caps run
~6 ns/row, but a sparse, deterministic set of caps (e.g. 9360/9952/10903/
11096 x128) runs ~12 ns/row, and a few (1200128 = the 4N auto cap at
N=300001!, 1200512) run 51-79 ns/row — with IDENTICAL index values, and
the mode is insensitive to the index pattern (random == ascending == real;
bench_probes/probe_gather_scan.py, probe_gather_form.py). No closed-form
size rule survived measurement (divisibility by 1024/2048 both have
counterexamples), but the modes are stable per (row-count, table-shape) and
padding a slow cap by +128 rows empirically lands fast.

So instead of a rule, measure: when a concrete pair cap is first chosen
(`RasterizeConfig.resolved`), time a dummy gather at {cap, cap+128, cap+256}
once and snap to the smallest candidate within 12% of the fastest. Growing
a cap is always safe — caps are capacities; surplus slots carry the
sentinel tile and are masked everywhere. Picks persist to a small JSON
cache under ~/.cache so each (cap, dim, rows) is measured once per machine;
the probe programs themselves hit jax's persistent compilation cache.

Measurement discipline (hard-won, in order discovered):
  * consume EVERY gathered element (`sum`) — consuming one element lets the
    compiler shrink the gather to a single row;
  * make the gather INDICES depend on the chained scalar (`gid + int32(s*0)`,
    0 at runtime but not foldable since s may be non-finite) — otherwise
    `gather(src + bcast(s))` commutes to `gather(src) + s` and the heavy
    subgraph becomes call-invariant, which this runtime memoizes;
  * advance the chained scalar by +1.0 (exact in f32) — accumulating tiny
    increments rounds away and bitwise-identical dispatches get deduped;
  * fence with HOST VALUE FETCHES and difference a K-iteration window
    against a 2K window ((t_2K - t_K)/K) — `jax.block_until_ready` has been
    observed to return without blocking on the axon tunnel, and a fetch
    costs a ~30 ms round trip that the differencing cancels exactly.

The CUDA reference has no analogue (its gathers are warp-coalesced loads,
rasterizer_impl.cu:196-351); this is a TPU/XLA-runtime artifact handled at
the framework layer. Disable with INSTASCENE_GATHER_TUNE=0.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Candidate steps above the requested cap, in pallas-chunk multiples.
_STEPS = (0, 1, 2)
_WARMUP = 6   # burn the runtime's slow first-calls tier before timing
_K = 4        # window size for the RTT-cancelling (2K - K)/K differencing
_LOOPS = 2    # take the MIN over repeats: robust to host/queue jitter
_TOL = 1.12   # prefer the smallest cap within 12% of the fastest

_PICK_CACHE: dict = {}   # (cap, dim, src_rows) -> chosen cap
_MS_CACHE: dict = {}     # (cap, dim, src_rows) -> measured ms (diagnostics)
_DISK_LOADED = False


def _enabled() -> bool:
    if os.environ.get("INSTASCENE_GATHER_TUNE", "1") == "0":
        return False
    import jax
    return jax.default_backend() not in ("cpu",)


def _disk_path() -> str:
    import jax
    kind = jax.devices()[0].device_kind.replace(" ", "_")
    cache = os.environ.get("XDG_CACHE_HOME",
                           os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(cache, f"instascene_gather_tune_{kind}.json")


def _load_disk() -> None:
    global _DISK_LOADED
    if _DISK_LOADED:
        return
    _DISK_LOADED = True
    try:
        with open(_disk_path()) as f:
            for k, v in json.load(f).items():
                _PICK_CACHE[tuple(int(x) for x in k.split(","))] = int(v)
    except Exception:
        pass


def _save_disk() -> None:
    try:
        path = _disk_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        merged = {}
        try:    # merge, don't clobber: probes reset + re-measure subsets
            with open(path) as f:
                merged = json.load(f)
        except Exception:
            pass
        merged.update({",".join(str(x) for x in k): v
                       for k, v in _PICK_CACHE.items()})
        with open(path, "w") as f:
            json.dump(merged, f)
    except Exception:
        pass


def _time_gather(cap: int, dim: int, src_rows: int) -> float:
    import jax
    import jax.numpy as jnp

    key = (cap, dim, src_rows)
    if key in _MS_CACHE:
        return _MS_CACHE[key]
    rng = np.random.default_rng(cap)
    src = jnp.asarray(rng.standard_normal((src_rows, dim)).astype(np.float32))
    gid = jnp.asarray(rng.integers(0, src_rows, cap).astype(np.int32))

    @jax.jit
    def step(s, src, gid):
        idx = gid + jnp.int32(s * 0.0)
        return jnp.sum(src[idx]) * 1e-20 + s + 1.0

    out = step(jnp.float32(0), src, gid)
    float(out)
    for _ in range(_WARMUP):
        out = step(out, src, gid)
    float(out)
    ms = float("inf")
    for _ in range(_LOOPS):
        t0 = time.perf_counter()
        for _ in range(_K):
            out = step(out, src, gid)
        float(out)
        t1 = time.perf_counter()
        for _ in range(2 * _K):
            out = step(out, src, gid)
        float(out)
        t2 = time.perf_counter()
        ms = min(ms, ((t2 - t1) - (t1 - t0)) / _K * 1e3)
    ms = max(ms, 1e-3)  # a negative difference is jitter, not speed
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
    _load_disk()
    key = (cap, dim, src_rows)
    hit = _PICK_CACHE.get(key)
    if hit is not None:
        return hit
    try:
        times = [(_time_gather(cap + s * chunk, dim, src_rows),
                  cap + s * chunk) for s in _STEPS]
        best_ms = min(ms for ms, _ in times)
        pick = next(c for ms, c in times if ms <= best_ms * _TOL)
        if os.environ.get("INSTASCENE_GATHER_TUNE_LOG"):
            print(f"[gather_tune] cap={cap} -> {pick}  "
                  + "  ".join(f"{c}:{ms:.2f}ms" for ms, c in times),
                  flush=True)
    except Exception:   # OOM at cap+2 chunks, odd backends, ... — never fatal
        pick = cap
    _PICK_CACHE[key] = pick
    _save_disk()
    return pick


def reset_gather_tune_cache() -> None:
    global _DISK_LOADED
    _PICK_CACHE.clear()
    _MS_CACHE.clear()
    _DISK_LOADED = True   # a reset means "measure fresh", not "reload disk"
