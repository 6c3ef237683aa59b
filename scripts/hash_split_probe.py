"""Probe: per-level split vs single flat gather for the hash encoder.

Round-5 follow-up to the Pallas VMEM-gather dead end (VERDICT r4 task 3).
Fresh measurement shows XLA gather cost is strongly TABLE-SIZE dependent
(2^18 indices: (2^14,2) table -> ~0.02 ms; (2^19,)-row tables -> ~5 ms),
so the encoder's single (L*T, F) combined-table gather (67 MB for the
NGP config) forces EVERY level onto the big-table path.  Per-level
gathers keep the small dense levels on the fast path and are mutually
independent (can overlap).  Also measures the tcnn-style dense-small
optimization: levels whose dense grid fits under the hash size use a
dense (res^3) table (smaller AND collision-free).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.models.encoders import HashGridEncoder, _PRIMES


def timed(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / iters)
    return sorted(ts)[2], out


def main():
    enc = HashGridEncoder()
    L, T, F = enc.n_levels, enc.table_size, enc.n_features_per_level
    n = 1 << 16
    key = jax.random.PRNGKey(0)
    table = enc.init(key)
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), jnp.float32)

    # A) current combined-table encoder, fwd and fwd+bwd
    fwd = jax.jit(lambda t, x: enc(t, x))
    t, _ = timed(fwd, table, x)
    print(f"[A combined fwd] {t*1e3:.2f} ms", flush=True)
    vg = jax.jit(jax.grad(lambda t, x: jnp.sum(enc(t, x) ** 2)))
    t, _ = timed(vg, table, x)
    print(f"[A combined bwd] {t*1e3:.2f} ms", flush=True)

    # B) per-level split gathers (same hashing, same table content)
    res = enc.resolutions

    def split_fwd(table, x):
        pos = x[:, None, :] * jnp.asarray(res, x.dtype)[None, :, None]
        i0 = jnp.floor(pos).astype(jnp.int32)
        frac = pos - i0
        offsets = jnp.asarray(
            [[dx, dy, dz] for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
            jnp.int32,
        )
        corners = i0[:, :, None, :] + offsets[None, None, :, :]  # (n,L,8,3)
        cx = corners[..., 0].astype(jnp.uint32)
        cy = corners[..., 1].astype(jnp.uint32)
        cz = corners[..., 2].astype(jnp.uint32)
        hashed = (
            cx * jnp.uint32(_PRIMES[0])
            ^ cy * jnp.uint32(_PRIMES[1])
            ^ cz * jnp.uint32(_PRIMES[2])
        ) & jnp.uint32(T - 1)
        wx = jnp.stack([1 - frac[..., 0], frac[..., 0]], -1)
        wy = jnp.stack([1 - frac[..., 1], frac[..., 1]], -1)
        wz = jnp.stack([1 - frac[..., 2], frac[..., 2]], -1)
        w = (
            wx[:, :, :, None, None]
            * wy[:, :, None, :, None]
            * wz[:, :, None, None, :]
        ).reshape(x.shape[0], len(res), 8)
        outs = []
        for l in range(len(res)):
            f = jnp.take(table[l], hashed[:, l].reshape(-1), axis=0)
            f = f.reshape(x.shape[0], 8, F)
            outs.append(jnp.sum(f * w[:, l, :, None], axis=1))
        return jnp.concatenate(outs, axis=-1)

    fwd_b = jax.jit(split_fwd)
    o_a = fwd(table, x)
    o_b = fwd_b(table, x)
    print("split == combined:", bool(jnp.allclose(o_a, o_b, atol=1e-6)), flush=True)
    t, _ = timed(fwd_b, table, x)
    print(f"[B split fwd] {t*1e3:.2f} ms", flush=True)
    vg_b = jax.jit(jax.grad(lambda t, x: jnp.sum(split_fwd(t, x) ** 2)))
    t, _ = timed(vg_b, table, x)
    print(f"[B split bwd] {t*1e3:.2f} ms", flush=True)

    # C) dense-small split: level l dense when (res+1)^3 <= T (collision-free,
    # much smaller tables for the coarse levels)
    dense_sizes = [min((r + 1) ** 3, T) for r in res]
    print("dense sizes:", dense_sizes, flush=True)
    tables_c = [
        jax.random.uniform(jax.random.PRNGKey(l), (s, F), jnp.float32, -1e-4, 1e-4)
        for l, s in enumerate(dense_sizes)
    ]

    def dense_fwd(tables, x):
        pos = x[:, None, :] * jnp.asarray(res, x.dtype)[None, :, None]
        i0 = jnp.floor(pos).astype(jnp.int32)
        frac = pos - i0
        offsets = jnp.asarray(
            [[dx, dy, dz] for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
            jnp.int32,
        )
        corners = i0[:, :, None, :] + offsets[None, None, :, :]
        wx = jnp.stack([1 - frac[..., 0], frac[..., 0]], -1)
        wy = jnp.stack([1 - frac[..., 1], frac[..., 1]], -1)
        wz = jnp.stack([1 - frac[..., 2], frac[..., 2]], -1)
        w = (
            wx[:, :, :, None, None]
            * wy[:, :, None, :, None]
            * wz[:, :, None, None, :]
        ).reshape(x.shape[0], len(res), 8)
        outs = []
        for l, r in enumerate(res):
            c = corners[:, l]  # (n,8,3)
            if (r + 1) ** 3 <= T:
                stride = r + 1
                idx = (
                    c[..., 0] * stride * stride + c[..., 1] * stride + c[..., 2]
                )
                idx = jnp.clip(idx, 0, dense_sizes[l] - 1)
            else:
                cx = c[..., 0].astype(jnp.uint32)
                cy = c[..., 1].astype(jnp.uint32)
                cz = c[..., 2].astype(jnp.uint32)
                idx = (
                    cx * jnp.uint32(_PRIMES[0])
                    ^ cy * jnp.uint32(_PRIMES[1])
                    ^ cz * jnp.uint32(_PRIMES[2])
                ) & jnp.uint32(T - 1)
                idx = idx.astype(jnp.int32)
            f = jnp.take(tables[l], idx.reshape(-1), axis=0)
            f = f.reshape(x.shape[0], 8, F)
            outs.append(jnp.sum(f * w[:, l, :, None], axis=1))
        return jnp.concatenate(outs, axis=-1)

    fwd_c = jax.jit(dense_fwd)
    t, _ = timed(fwd_c, tables_c, x)
    print(f"[C dense-small fwd] {t*1e3:.2f} ms", flush=True)
    vg_c = jax.jit(jax.grad(lambda ts, x: jnp.sum(dense_fwd(ts, x) ** 2)))
    t, _ = timed(vg_c, tables_c, x)
    print(f"[C dense-small bwd] {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
