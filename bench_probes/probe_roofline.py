#!/usr/bin/env python
"""TPU probe (round 4): measured device ceilings for the roofline table in
docs/PERFORMANCE.md — a pure fused-FMA chain (VPU f32 ceiling), an
exp-heavy chain (transcendental mix like the blend kernel), pure HBM
stream/copy (bandwidth ceiling), and an MXU matmul for scale. Timing
discipline per ops/gather_tune.py (host-fetch fences, K-vs-2K
RTT-cancelling windows, per-call-varying inputs); device arrays are passed
as jit ARGUMENTS — a closure-captured array is serialized to the remote
compile service as a literal (HTTP 413 past ~100 MB) and can constant-fold.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
WARMUP, K = 8, 4


def timed(step, arrs, label, work, unit):
    import jax.numpy as jnp
    out = step(jnp.float32(0), *arrs); float(out)
    for _ in range(WARMUP): out = step(out, *arrs)
    float(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(K): out = step(out, *arrs)
        float(out)
        t1 = time.perf_counter()
        for _ in range(2 * K): out = step(out, *arrs)
        float(out)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / K)
    best = max(best, 1e-6)
    print(f"{label:<46s} {best * 1e3:8.2f} ms   "
          f"{work / best / 1e9:8.1f} G{unit}/s", flush=True)
    return best


def main():
    import jax, jax.numpy as jnp

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2048, 2048)).astype(np.float32))

    # --- VPU f32 ceiling: a long fused multiply-add chain ---------------
    CH = 256

    @jax.jit
    def fma_chain(s, x):
        # a pure affine chain collapses algebraically (y·c1^CH + ...); the
        # max() breaks the algebra without leaving the VPU's cheap ops
        c1 = 1.0 + s * 1e-30
        c2 = s * 1e-30
        y = x
        for _ in range(CH):
            y = jnp.maximum(y * c1 + c2, y * 0.99999)
        return jnp.sum(jnp.abs(y)) * 1e-20 + s + 1.0
    timed(fma_chain, (x0,), f"VPU chain ({CH} x fma+mul+max/elt)",
          x0.size * CH * 3, "op f32")

    # --- exp throughput: the blend body is exp-heavy --------------------
    EX = 128

    @jax.jit
    def exp_chain(s, x):
        c1 = 1.0 + s * 1e-30
        y = x * 1e-3
        for _ in range(EX):
            y = jnp.exp(-jnp.abs(y) * c1 * 0.1) + y * 0.25
        return jnp.sum(y) * 1e-20 + s + 1.0
    timed(exp_chain, (x0,), f"exp chain ({EX} exp/elt)",
          x0.size * EX, "exp")

    # --- HBM stream / copy ceilings --------------------------------------
    big = jnp.asarray(rng.standard_normal((8192, 8192)).astype(np.float32))

    @jax.jit
    def stream(s, b):
        # sum(b·c) distributes to c·sum(b) (loop-invariant, memoized);
        # abs(b + c) does not
        return jnp.sum(jnp.abs(b + s * 1e-30)) * 1e-20 + s + 1.0
    timed(stream, (big,), "HBM stream (read 256 MB, reduce)",
          big.size * 4, "B read")

    @jax.jit
    def copy(s, b):
        y = b * (1.0 + s * 1e-30)
        return y[0, 0] * 1e-20 + jnp.sum(y[::64, ::64]) * 1e-20 + s + 1.0
    timed(copy, (big,), "HBM copy (read+write 256 MB)",
          big.size * 8, "B moved")

    # --- MXU for scale (the SSIM/contrastive path) -----------------------
    a = jnp.asarray(rng.standard_normal((4096, 4096)).astype(np.float32))

    @jax.jit
    def mm(s, x):
        # consume every output element nonlinearly: a [0,0] slice lets XLA
        # compute one dot; sum() distributes over the contraction
        y = x + s * 1e-30
        return jnp.sum(jnp.abs(y @ x)) * 1e-20 + s + 1.0
    timed(mm, (a,), "MXU f32 4096^3 matmul", 2 * 4096**3, "flop f32")


if __name__ == "__main__":
    main()
