"""Probe: backward-scatter alternatives for the hash encoder (task 3).

Honest timing on this backend requires a dependency chain ending in a
real D2H fetch — `block_until_ready` does NOT block on the tunnel (an
8192^3 matmul "measures" 0.03 ms without it).  Every number here comes
from `timed_chain`.

Decomposition at n=2^16 (the hash protocol's budget), 16 levels x 8
corners = 8.4M indices, (L*T, F) = 8.4M x 2 f32 table:
  fwd gather        ~62 ms   (7.3 ns/index — matches the round-3 cost model)
  fwd+bwd           ~583 ms  (scatter-add of 8.4M rows = ~520 ms)
Candidates measured:
  O2  sort indices once, scatter-add with indices_are_sorted=True
  O3  per-level one-hot matmul accumulation (MXU, but 2-wide output)
  O4  bf16 table (halves gather/scatter bytes; tcnn uses fp16 tables)
  O5  segment_sum on sorted keys + sorted scatter
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.models.encoders import HashGridEncoder


def timed_chain(make_step, x0, iters=15):
    st = jax.jit(make_step)
    x = st(x0)
    _ = float(jnp.sum(x))
    t0 = time.perf_counter()
    x = x0
    for _ in range(iters):
        x = st(x)
    _ = float(jnp.sum(x))
    return (time.perf_counter() - t0) / iters


def main():
    enc = HashGridEncoder()
    L, T, F = enc.n_levels, enc.table_size, enc.n_features_per_level
    n = 1 << 16
    nidx = n * L * 8
    key = jax.random.PRNGKey(0)
    table = enc.init(key).reshape(L * T, F)
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (nidx,), 0, L * T, jnp.int32)
    cot0 = jax.random.normal(jax.random.PRNGKey(2), (nidx, F), jnp.float32)

    def perturb(x):
        # cheap chain: rotate indices by a data-dependent amount
        shift = (jnp.sum(x[:16]).astype(jnp.int32) & 1023) + 1
        return jnp.roll(x, shift)

    # O1 baseline: plain scatter-add
    def o1(idx):
        g = jnp.zeros((L * T, F), jnp.float32).at[idx].add(cot0)
        return perturb(idx) + (jnp.sum(g) * 0).astype(jnp.int32)

    print(f"[O1 scatter-add 8.4M rows] {timed_chain(o1, idx0)*1e3:.1f} ms", flush=True)

    # O2: sort + indices_are_sorted scatter
    import jax.lax as lax

    def o2(idx):
        sk, sc0, sc1 = lax.sort([idx, cot0[:, 0], cot0[:, 1]], num_keys=1)
        sc = jnp.stack([sc0, sc1], -1)
        d = lax.scatter_add(
            jnp.zeros((L * T, F), jnp.float32),
            sk[:, None],
            sc,
            lax.ScatterDimensionNumbers(
                update_window_dims=(1,),
                inserted_window_dims=(0,),
                scatter_dims_to_operand_dims=(0,),
            ),
            indices_are_sorted=True,
            unique_indices=False,
        )
        return perturb(idx) + (jnp.sum(d) * 0).astype(jnp.int32)

    print(f"[O2 sort + sorted scatter] {timed_chain(o2, idx0)*1e3:.1f} ms", flush=True)

    # O2b: sort cost alone
    def o2b(idx):
        sk, sc0, sc1 = lax.sort([idx, cot0[:, 0], cot0[:, 1]], num_keys=1)
        return perturb(idx) + (jnp.sum(sc0[:8]) * 0).astype(jnp.int32) + sk[0] * 0

    print(f"[O2b sort alone] {timed_chain(o2b, idx0)*1e3:.1f} ms", flush=True)

    # O3: one-hot matmul accumulation, one level's worth (T rows), scaled x16.
    nl = n * 8  # per-level index count

    def o3(idx):
        il = idx[:nl] % T
        oh = (il[:, None] == jnp.arange(T, dtype=jnp.int32)[None, :]).astype(
            jnp.bfloat16
        )
        g = lax.dot_general(
            oh,
            cot0[:nl].astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return perturb(idx) + (jnp.sum(g) * 0).astype(jnp.int32)

    t3 = None  # skipped: XLA materializes the (524288, T) one-hot
    print("[O3 one-hot dot] SKIPPED: (nl, T) one-hot materializes at T=2^19", flush=True)

    # O4: bf16 table scatter
    def o4(idx):
        g = jnp.zeros((L * T, F), jnp.bfloat16).at[idx].add(
            cot0.astype(jnp.bfloat16)
        )
        return perturb(idx) + (jnp.sum(g.astype(jnp.float32)) * 0).astype(jnp.int32)

    print(f"[O4 bf16 scatter-add] {timed_chain(o4, idx0)*1e3:.1f} ms", flush=True)

    # O4b: bf16 fwd gather
    tb = table.astype(jnp.bfloat16)

    def o4b(idx):
        f = jnp.take(tb, idx, axis=0)
        return perturb(idx) + (jnp.sum(f.astype(jnp.float32)) * 0).astype(jnp.int32)

    print(f"[O4b bf16 gather fwd] {timed_chain(o4b, idx0)*1e3:.1f} ms", flush=True)

    def o4c(idx):
        f = jnp.take(table, idx, axis=0)
        return perturb(idx) + (jnp.sum(f) * 0).astype(jnp.int32)

    print(f"[O4c f32 gather fwd] {timed_chain(o4c, idx0)*1e3:.1f} ms", flush=True)

    # O5: sorted segment-sum then scatter of run totals at boundaries
    def o5(idx):
        sk, sc0, sc1 = lax.sort([idx, cot0[:, 0], cot0[:, 1]], num_keys=1)
        c0 = jnp.cumsum(sc0)
        c1 = jnp.cumsum(sc1)
        is_end = jnp.concatenate([sk[1:] != sk[:-1], jnp.ones((1,), bool)])
        # run totals at end positions: cumsum - cumsum at previous run end
        tot0 = jnp.where(is_end, c0, 0.0)
        tot1 = jnp.where(is_end, c1, 0.0)
        d = jnp.zeros((L * T, F), jnp.float32).at[jnp.where(is_end, sk, L * T)].add(
            jnp.stack([tot0, tot1], -1), mode="drop"
        )
        return perturb(idx) + (jnp.sum(d) * 0).astype(jnp.int32)

    print(f"[O5 sort+boundary scatter (NOT exact; cost probe)] {timed_chain(o5, idx0)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
