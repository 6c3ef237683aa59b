"""Microbenchmark: sort-compaction strategies for the sample pool.

Compares the shipping scheme (int32 key sort of candidate order + one
(budget, C) payload row gather) against a variadic sort that carries the
payload lanes through the sort network directly (no gather).  Run on the
chip; dependency-chained so dispatch overhead amortizes.

Usage: python scripts/microbench_compact.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=30, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / iters)
    return sorted(ts)[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    Wb, f, budget, C = 1 << 16, 8, 1 << 18, 9
    n = Wb * f
    rng = np.random.default_rng(0)
    valid = jnp.asarray(rng.random((n,)) < 0.6)
    payload = jnp.asarray(rng.random((n, C), np.float32))

    @jax.jit
    def sort_gather(valid, payload):
        iota = jnp.arange(n, dtype=jnp.int32)
        keys = jnp.where(valid, iota, iota + n)
        _, order = jax.lax.sort_key_val(keys, iota)
        sel = order[:budget]
        return jnp.take(payload, sel, axis=0)

    @jax.jit
    def variadic_sort(valid, payload):
        iota = jnp.arange(n, dtype=jnp.int32)
        keys = jnp.where(valid, iota, iota + n)
        ops = (keys,) + tuple(payload[:, i] for i in range(C))
        out = jax.lax.sort(ops, num_keys=1)
        return jnp.stack([o[:budget] for o in out[1:]], axis=-1)

    a = sort_gather(valid, payload)
    b = variadic_sort(valid, payload)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    t_a = timed(sort_gather, valid, payload)
    t_b = timed(variadic_sort, valid, payload)
    print(f"sort_key_val + row gather : {t_a * 1e3:.3f} ms")
    print(f"variadic sort (payload in network): {t_b * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
