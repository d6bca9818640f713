#!/usr/bin/env python
"""TPU probe (round 5, VERDICT r4 item 1): can an in-kernel Pallas per-row
DMA gather beat XLA's 6.2 ns/row pack gather?

The round-4 roofline called the 5.4 ms pack gather (1.4M rows x 21 f32 cols
out of an [N+1, 21] table) a "formulation-universal floor" at ~6.2 ns/row —
but every probed formulation was an XLA-level gather. This probe measures
the only remaining in-kernel formulation: Pallas row DMAs issued from the
scalar core (the rows of a chunk are known at binning time — scalar-prefetch
or SMEM-blocked sorted_gid, one HBM→VMEM copy per row), the mechanism the
round-3/4 verdicts suggested for folding the gather into the visit kernels.

Arithmetic to beat: the XLA gather moves rows at 6.2 ns/row = 84 B / 6.2 ns
≈ 13.5 GB/s effective (row-latency-bound; measured width-independent).
A DMA descriptor costs the scalar core a fixed issue overhead T_issue plus
the copy engine's per-descriptor setup; with 1.4M rows the in-kernel path
wins only if T_issue < 6.2 ns — i.e. the scalar core would have to issue
~160M descriptors/s, ~2 orders beyond a ~1 GHz scalar unit that needs
dozens of instructions per descriptor. This probe measures the actual rate
so the roofline's gather floor is CHECKABLE, not asserted.

Output: ns/row for (a) XLA gather, (b) Pallas per-row DMA gather (all-start-
then-wait within each 128-row chunk), at the round-4 roofline shapes.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WARMUP = 8
K = 4


def timed_ms(run, warmup=WARMUP, k=K):
    out = run()
    float(out)
    for _ in range(warmup):
        out = run()
    float(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(k):
            out = run()
        float(out)
        t1 = time.perf_counter()
        for _ in range(2 * k):
            out = run()
        float(out)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / k * 1e3)
    return max(best, 1e-3)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CHUNK = 128
    rows = 1_398_272          # the round-4 roofline cap (1080p uniform)
    D = 21
    N = 300_001
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.standard_normal((N + 1, D)).astype(np.float32))
    gid = jnp.asarray(rng.integers(0, N + 1, rows).astype(np.int32))

    # ---------------- XLA gather baseline ---------------------------------
    @jax.jit
    def xla_gather(s, flat, gid):
        idx = gid + jnp.int32(s * 0.0)
        return jnp.sum(flat[idx]) * 1e-20 + s + 1.0

    box = [jnp.float32(0)]

    def run_xla():
        box[0] = xla_gather(box[0], flat, gid)
        return box[0]

    ms = timed_ms(run_xla)
    print(f"XLA gather {rows} x {D}: {ms:.2f} ms = "
          f"{ms * 1e6 / rows:.2f} ns/row", flush=True)

    # ---------------- Pallas per-row DMA gather ---------------------------
    # Mosaic requires DMA slices lane-aligned: pad the table to 128 columns
    # (the probe stays honest — the measured quantity is the per-descriptor
    # ISSUE rate, which is width-independent at these sizes)
    DP = 128
    flat_p = jnp.pad(flat, ((0, 0), (0, DP - D)))
    rows_dma = (rows // 1024) * 1024
    gid = gid[:rows_dma]
    n_chunks = rows_dma // CHUNK

    BLK = 1024      # XLA lays the id vector out in 1024-element tiles

    def dma_kernel(sgid_ref, flat_ref, out_ref, scratch, sems):
        def outer(b, _):
            def start(j, _):
                g = sgid_ref[b * CHUNK + j]
                pltpu.make_async_copy(
                    flat_ref.at[pl.ds(g, 8), :],
                    scratch.at[j],
                    sems.at[j],
                ).start()
                return 0
            jax.lax.fori_loop(0, CHUNK, start, 0)

            def wait(j, _):
                g = sgid_ref[b * CHUNK + j]
                pltpu.make_async_copy(
                    flat_ref.at[pl.ds(g, 8), :],
                    scratch.at[j],
                    sems.at[j],
                ).wait()
                out_ref[pl.ds(b * CHUNK + j, 1), :] = scratch[j, 0:1, :]
                return 0
            jax.lax.fori_loop(0, CHUNK, wait, 0)
            return 0
        jax.lax.fori_loop(0, BLK // CHUNK, outer, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(rows_dma // 1024,),
        in_specs=[
            pl.BlockSpec((1024,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1024, DP), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((CHUNK, 8, DP), jnp.float32),
                        pltpu.SemaphoreType.DMA((CHUNK,))],
    )

    @jax.jit
    def pallas_gather(s, flat, gid):
        g = gid + jnp.int32(s * 0.0)
        packed = pl.pallas_call(
            dma_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rows_dma, DP), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(g, flat)
        return jnp.sum(packed) * 1e-20 + s + 1.0

    box2 = [jnp.float32(0)]

    def run_pallas():
        box2[0] = pallas_gather(box2[0], flat_p, gid)
        return box2[0]

    # correctness first (clamp ids so the 8-row aligned read stays in range)
    gid = jnp.minimum(gid, N - 8)
    ref = np.asarray(flat_p[gid])
    got = np.asarray(pl.pallas_call(
        dma_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_dma, DP), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(gid, flat_p))
    assert np.array_equal(ref, got), "DMA gather wrong"
    print("DMA gather output exact", flush=True)

    ms2 = timed_ms(lambda: run_pallas())
    print(f"Pallas per-row DMA gather {rows_dma} x {DP}: {ms2:.2f} ms = "
          f"{ms2 * 1e6 / rows_dma:.2f} ns/row "
          f"({ms2 / ms:.2f}x the XLA gather)", flush=True)

    # the sum(packed) consumer adds a full [rows, D] read; measure it alone
    packed = flat[gid]

    @jax.jit
    def consume(s, p):
        return jnp.sum(p + s * 0.0) * 1e-20 + s + 1.0

    box3 = [jnp.float32(0)]

    def run_c():
        box3[0] = consume(box3[0], packed)
        return box3[0]
    ms3 = timed_ms(run_c)
    print(f"sum-consumer alone: {ms3:.2f} ms (subtract from both)",
          flush=True)


if __name__ == "__main__":
    main()
