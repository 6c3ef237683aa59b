"""Probe v2: the same-shape dynamic_gather form (VERDICT r4 task 3).

Mosaic lowers `tpu.dynamic_gather` only for same-shape 2-D operands:
out[i, l] = src[idx[i, l], l] — a PER-LANE gather where each of the 128
lanes has its own (T,) table column and its own index stream.  That IS
enough to express a VMEM-resident multi-level NGP table lookup:

  - replicate a level's (T, F) feature columns across lanes (F=2 -> 64
    copies), or pack SEVERAL levels' columns side by side (16 levels x 2
    features x 4 replicas = 128 lanes), one (T_max, 128) f32 src;
  - per-lane int32 indices (N, 128): lane l carries the index stream of
    the level whose columns live in lane l;
  - ONE same-shape gather evaluates every resident level for every
    sample.

This probe measures ns/lookup for the primitive at several table heights
(the 128-lane src must fit VMEM: T=2^16 x 128 x f32 = 32 MB is near the
budget; bigger hash levels stay on the XLA gather path) and runs a
16-level NGP-shaped emulation (levels <= 2^16 resident, idx per lane).

Kill criterion: lowering failure at every shape -> record the exact
Mosaic error in PERF.md and stop.
"""
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


def gather_kernel(src_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=0)


def run_same_shape(T, n_blocks, blk_rows=None):
    """src (T, 128) resident; idx (n_blocks*BLK, 128); out same shape.

    Mosaic's gather lowering (jax/_src/pallas/mosaic/lowering.py,
    `_gather_lowering_rule`) requires src.shape == idx.shape ==
    out.shape, so the per-call block height MUST equal the table height:
    BLK = T.
    """
    BLK = blk_rows or T
    N = n_blocks * BLK
    src = jax.random.normal(jax.random.PRNGKey(0), (T, 128), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N, 128), 0, T, jnp.int32)
    try:
        fn = jax.jit(
            pl.pallas_call(
                gather_kernel,
                grid=(n_blocks,),
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
        t, out = timed(fn, src, idx)
        n_idx = N * 128
        # correctness on a slice
        o = np.asarray(out[:BLK])
        w = np.asarray(src)[np.asarray(idx[:BLK]), np.arange(128)[None, :]]
        ok = np.array_equal(o, w)
        print(
            f"[same-shape T={T} N={N}] OK {t*1e3:.3f} ms "
            f"-> {t/n_idx*1e9:.4f} ns/lookup  correct={ok}",
            flush=True,
        )
        return t / n_idx
    except Exception:
        print(f"[same-shape T={T}] FAILED:", flush=True)
        traceback.print_exc(limit=3)
        return None


def run_ngp_emulation():
    """16-level NGP-shaped lookup, levels <= 2^16 VMEM-resident.

    One (2^16, 128) src packs 16 levels x 2 features x 4 replicas; idx
    (N, 128) carries per-level index streams (levels smaller than 2^16
    just use a sub-range).  N = 2^18 samples in 4096-row blocks.  The
    XLA floor for the same work is ~16 chained (N,)-gathers x 2.9-5.1 ms.
    """
    T = 1 << 16
    N = 1 << 18
    BLK = 4096
    src = jax.random.normal(jax.random.PRNGKey(0), (T, 128), jnp.float32)
    # per-lane level sizes: lane l belongs to level l % 16 of size
    # min(2^(10 + l%16), 2^16) — index streams stay in range per lane
    sizes = np.minimum(2 ** (10 + np.arange(128) % 16), T).astype(np.int32)
    idx = (
        jax.random.randint(jax.random.PRNGKey(1), (N, 128), 0, 1 << 30)
        % jnp.asarray(sizes)[None, :]
    ).astype(jnp.int32)
    try:
        fn = jax.jit(
            pl.pallas_call(
                gather_kernel,
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
        t, out = timed(fn, src, idx)
        print(
            f"[ngp-emulation 16 levels x 2^18 samples] OK {t*1e3:.3f} ms "
            f"per fused multi-level lookup pass "
            f"(XLA chained-gather floor for the resident levels: "
            f"~{11*2.9:.0f}-{11*5.1:.0f} ms)",
            flush=True,
        )
        o = np.asarray(out[:1024])
        w = np.asarray(src)[np.asarray(idx[:1024]), np.arange(128)[None, :]]
        print("correct:", np.array_equal(o, w), flush=True)
    except Exception:
        print("[ngp-emulation] FAILED:", flush=True)
        traceback.print_exc(limit=3)


def main():
    # XLA baseline for scale: one (N,) gather of (T, 2) rows
    T, N = 1 << 14, 1 << 18
    tab2 = jax.random.normal(jax.random.PRNGKey(0), (T, 2), jnp.float32)
    gidx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T, jnp.int32)
    fn = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    t, _ = timed(fn, tab2, gidx)
    print(f"[xla take (2^18,) rows of (2^14, 2)] {t*1e3:.3f} ms", flush=True)

    for T in (512, 1 << 14, 1 << 16):
        run_same_shape(T, n_blocks=64)
    run_ngp_emulation()


if __name__ == "__main__":
    main()
