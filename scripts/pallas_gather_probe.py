"""Feasibility probe: can Mosaic express a vectorized VMEM-resident table
gather?  (VERDICT r4 task 3 — the hash-encoder speed question.)

Tries several formulations of `out[i] = table[idx[i]]` with the table in
VMEM, smallest first; prints which ones lower and their measured time per
2^18 indices.  Kill criterion: every formulation fails to lower -> record
the exact Mosaic errors in PERF.md and stop.
"""
import functools
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[len(times) // 2], out


N = 1 << 18
T = 1 << 14  # table rows (a small NGP level: 2^14 x 2 bf16 = 64 KB)
F = 2


def try_case(name, build):
    try:
        fn, args, check = build()
        t, out = timed(fn, *args)
        ok = check(out)
        print(f"[{name}] OK {t*1e3:.3f} ms/call  correct={ok}")
        return t
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"[{name}] FAILED: {type(e).__name__}: {msg}")
        return None


def main():
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (T, 128), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T, jnp.int32)
    want_rows = np.asarray(table)[np.asarray(idx)]

    # baseline: XLA gather
    def xla_gather():
        fn = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        return fn, (table, idx), lambda o: np.allclose(o, want_rows)

    try_case("xla take (N,128) rows", xla_gather)

    # XLA gather, narrow rows (the NGP shape: (T, 2))
    table2 = table[:, :F]
    def xla_gather2():
        fn = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        return fn, (table2, idx), lambda o: np.allclose(
            o, np.asarray(table2)[np.asarray(idx)]
        )

    try_case("xla take (N,2) rows", xla_gather2)

    # 1: jnp.take inside a pallas kernel, whole problem in VMEM
    def pallas_take():
        def kernel(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

        fn = jax.jit(
            pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
        )
        return fn, (table, idx), lambda o: np.allclose(o, want_rows)

    try_case("pallas take whole-N", pallas_take)

    # 2: gridded — idx in blocks of 2048, table fully resident per block
    BLK = 2048

    def pallas_take_grid():
        def kernel(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

        fn = jax.jit(
            pl.pallas_call(
                kernel,
                grid=(N // BLK,),
                in_specs=[
                    pl.BlockSpec((T, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((BLK,), lambda i: (i,),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            )
        )
        return fn, (table, idx), lambda o: np.allclose(o, want_rows)

    try_case("pallas take grid-2048", pallas_take_grid)

    # 3: one-feature variant — table (T, 128) used as (T*128,) flat lookup
    # via per-lane gather: out[s, l] = table[idx2[s, l], l]  (dynamic_gather
    # same-shape form, idx broadcast to (BLK, 128))
    def pallas_lane_gather():
        idx2 = jnp.broadcast_to(idx[:, None], (N, 128))

        def kernel(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(
                tab_ref[:], idx_ref[:], axis=0
            )

        fn = jax.jit(
            pl.pallas_call(
                kernel,
                grid=(N // BLK,),
                in_specs=[
                    pl.BlockSpec((T, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            )
        )
        return fn, (table, idx2), lambda o: np.allclose(o, want_rows)

    try_case("pallas take_along_axis per-lane", pallas_lane_gather)

    # 4: scalar-loop gather (fori over elements within a small block) —
    # lower bound on the "scalar core" path
    SBLK = 512

    def pallas_scalar_loop():
        def kernel(tab_ref, idx_ref, out_ref):
            def body(i, _):
                out_ref[i, :] = tab_ref[idx_ref[i], :]
                return 0

            jax.lax.fori_loop(0, SBLK, body, 0)

        fn = jax.jit(
            pl.pallas_call(
                kernel,
                grid=(N // SBLK,),
                in_specs=[
                    pl.BlockSpec((T, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((SBLK,), lambda i: (i,),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((SBLK, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            )
        )
        return fn, (table, idx), lambda o: np.allclose(o, want_rows)

    try_case("pallas scalar fori-loop", pallas_scalar_loop)


if __name__ == "__main__":
    main()
