"""Microbenchmarks for segmented-scan strategies on the sorted flat layout.

Decides the implementation of the training-path compositing ops
(exclusive_sum + per-ray accumulation) on real hardware.
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

    from nerfacc_tpu.scan import _flags_from_indices, _segmented_scan

    N = 1 << 18
    n_rays = 2048
    rng = np.random.default_rng(0)
    # sorted ray ids with ragged segment sizes
    counts = rng.multinomial(N, np.ones(n_rays) / n_rays)
    ids = np.repeat(np.arange(n_rays, dtype=np.int32), counts)
    ids = jnp.asarray(ids)
    vals = jnp.asarray(rng.random(N, dtype=np.float32))

    # 1. tuple associative_scan (current)
    def assoc(vals, ids):
        flags = _flags_from_indices(ids)
        return _segmented_scan(vals, flags, "sum")

    f1 = jax.jit(assoc)
    print(f"assoc_scan inclusive:        {timed(f1, vals, ids)*1e3:.3f} ms")

    # 2. global cumsum minus per-segment offset (gather from small table)
    def cumsum_offset(vals, ids):
        csum = jnp.cumsum(vals)
        excl = csum - vals
        starts = jnp.searchsorted(ids, jnp.arange(n_rays, dtype=ids.dtype))
        seg_off = jnp.take(excl, jnp.clip(starts, 0, N - 1))
        return excl - jnp.take(seg_off, ids)

    f2 = jax.jit(cumsum_offset)
    print(f"cumsum-minus-offset excl:    {timed(f2, vals, ids)*1e3:.3f} ms")

    # 2b. same but offset propagated with a segmented max-scan (no gather)
    def cumsum_seg(vals, ids):
        csum = jnp.cumsum(vals)
        excl = csum - vals
        flags = _flags_from_indices(ids)
        start_vals = jnp.where(flags, excl, -jnp.inf)
        off = jax.lax.associative_scan(jnp.maximum, start_vals)
        return excl - off

    f2b = jax.jit(cumsum_seg)
    print(f"cumsum-minus-maxscan excl:   {timed(f2b, vals, ids)*1e3:.3f} ms")

    # plain global cumsum cost for reference
    f3 = jax.jit(lambda v: jnp.cumsum(v))
    print(f"plain cumsum:                {timed(f3, vals)*1e3:.3f} ms")

    # gather from small table at N sorted indices
    table = jnp.asarray(rng.random(n_rays, dtype=np.float32))
    f4 = jax.jit(lambda t, i: jnp.take(t, i))
    print(f"gather small table (sorted): {timed(f4, table, ids)*1e3:.3f} ms")

    # gather random indices same size
    rids = jnp.asarray(rng.integers(0, n_rays, N).astype(np.int32))
    print(f"gather small table (random): {timed(f4, table, rids)*1e3:.3f} ms")

    # searchsorted cost alone
    f5 = jax.jit(lambda i: jnp.searchsorted(i, jnp.arange(n_rays, dtype=i.dtype)))
    print(f"searchsorted (2048 over N):  {timed(f5, ids)*1e3:.3f} ms")

    # segment_sum scatter baseline
    f6 = jax.jit(lambda v, i: jax.ops.segment_sum(v, i, num_segments=n_rays))
    print(f"segment_sum scatter:         {timed(f6, vals, ids)*1e3:.3f} ms")

    # sorted_segment_sum via incl scan + ends gather (current)
    from nerfacc_tpu.volrend import _sorted_segment_sum
    f7 = jax.jit(lambda v, i: _sorted_segment_sum(v[:, None], i, n_rays))
    print(f"_sorted_segment_sum current: {timed(f7, vals, ids)*1e3:.3f} ms")

    # sorted segment sum via cumsum + boundary diff
    def seg_sum_cumsum(vals, ids):
        csum = jnp.cumsum(vals)
        ends = jnp.searchsorted(ids, jnp.arange(n_rays, dtype=ids.dtype),
                                side="right") - 1
        cum_at_end = jnp.take(csum, jnp.clip(ends, 0, N - 1))
        prev = jnp.concatenate([jnp.zeros((1,), csum.dtype), cum_at_end[:-1]])
        # per-ray sum = cum at my end - cum at previous ray's end; empty rays
        # have ends == previous ends so the diff is 0 automatically
        return cum_at_end - prev

    f8 = jax.jit(seg_sum_cumsum)
    print(f"seg_sum cumsum+boundary:     {timed(f8, vals, ids)*1e3:.3f} ms")

    # multi-channel versions (5 channels like the render path)
    vals5 = jnp.asarray(rng.random((N, 5), dtype=np.float32))

    def seg_sum5(vals, ids):
        csum = jnp.cumsum(vals, axis=0)
        ends = jnp.searchsorted(ids, jnp.arange(n_rays, dtype=ids.dtype),
                                side="right") - 1
        cum_at_end = jnp.take(csum, jnp.clip(ends, 0, N - 1), axis=0)
        prev = jnp.concatenate(
            [jnp.zeros((1, vals.shape[1]), csum.dtype), cum_at_end[:-1]], axis=0)
        return cum_at_end - prev

    f9 = jax.jit(seg_sum5)
    print(f"seg_sum 5ch cumsum+boundary: {timed(f9, vals5, ids)*1e3:.3f} ms")

    f10 = jax.jit(lambda v, i: jax.ops.segment_sum(v, i, num_segments=n_rays))
    print(f"seg_sum 5ch scatter:         {timed(f10, vals5, ids)*1e3:.3f} ms")

    # full composite fwd+bwd comparison: current vs cumsum-based
    t0v = jnp.asarray(rng.random(N, dtype=np.float32) * 0.01)
    dt = jnp.full((N,), 5e-3, jnp.float32)

    def composite_current(sig, rgb):
        from nerfacc_tpu.volrend import (
            accumulate_along_rays,
            render_weight_from_density,
        )
        w, tr, al = render_weight_from_density(
            t0v, t0v + dt, sig, ray_indices=ids, n_rays=n_rays)
        acc = accumulate_along_rays(w, rgb, ids, n_rays, indices_sorted=True)
        return jnp.sum(acc ** 2)

    def composite_cumsum(sig, rgb):
        sdt = sig * dt
        csum = jnp.cumsum(sdt)
        excl = csum - sdt
        starts = jnp.searchsorted(ids, jnp.arange(n_rays, dtype=ids.dtype))
        seg_off = jnp.take(excl, jnp.clip(starts, 0, N - 1))
        excl_seg = excl - jnp.take(seg_off, ids)
        trans = jnp.exp(-excl_seg)
        alpha = 1 - jnp.exp(-sdt)
        w = trans * alpha
        src = w[:, None] * rgb
        csum2 = jnp.cumsum(src, axis=0)
        ends = jnp.searchsorted(ids, jnp.arange(n_rays, dtype=ids.dtype),
                                side="right") - 1
        cum_at_end = jnp.take(csum2, jnp.clip(ends, 0, N - 1), axis=0)
        prev = jnp.concatenate(
            [jnp.zeros((1, rgb.shape[1]), csum2.dtype), cum_at_end[:-1]], axis=0)
        return jnp.sum((cum_at_end - prev) ** 2)

    sig = jnp.asarray(rng.random(N, dtype=np.float32) * 10)
    rgb5 = vals5
    g1 = jax.jit(jax.grad(composite_current, argnums=(0, 1)))
    g2 = jax.jit(jax.grad(composite_cumsum, argnums=(0, 1)))
    print(f"composite fwd+bwd current:   {timed(g1, sig, rgb5)*1e3:.3f} ms")
    print(f"composite fwd+bwd cumsum:    {timed(g2, sig, rgb5)*1e3:.3f} ms")
    # correctness cross-check
    a = g1(sig, rgb5)
    b = g2(sig, rgb5)
    import numpy as np2
    for x, y in zip(a, b):
        print("  max grad diff:", float(jnp.max(jnp.abs(x - y))))


if __name__ == "__main__":
    main()


def custom_vjp_variant():
    """Scatter-free custom-VJP composite: both fwd and bwd use only cumsum,
    small-table gathers, and boundary gathers."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    N = 1 << 18
    n_rays = 2048
    rng = np.random.default_rng(0)
    counts = rng.multinomial(N, np.ones(n_rays) / n_rays)
    ids = jnp.asarray(np.repeat(np.arange(n_rays, dtype=np.int32), counts))
    t0v = jnp.asarray(rng.random(N, dtype=np.float32) * 0.01)
    dt = jnp.full((N,), 5e-3, jnp.float32)
    sig = jnp.asarray(rng.random(N, dtype=np.float32) * 10)
    rgb5 = jnp.asarray(rng.random((N, 5), dtype=np.float32))

    def _starts(ids):
        return jnp.searchsorted(ids, jnp.arange(n_rays, dtype=ids.dtype))

    def _ends(ids):
        return jnp.searchsorted(
            ids, jnp.arange(n_rays, dtype=ids.dtype), side="right") - 1

    @jax.custom_vjp
    def excl_sum_sorted(vals, ids):
        csum = jnp.cumsum(vals)
        excl = csum - vals
        off = jnp.take(excl, jnp.clip(_starts(ids), 0, vals.shape[0] - 1))
        return excl - jnp.take(off, ids)

    def _excl_fwd(vals, ids):
        return excl_sum_sorted(vals, ids), ids

    def _excl_bwd(ids, g):
        # grad_vals[j] = sum_{i > j, same segment} g[i]
        rcsum = jnp.cumsum(g[::-1])[::-1]   # suffix inclusive sum
        suffix_excl = rcsum - g             # suffix sum strictly after j
        # subtract the suffix that belongs to later segments: value at my
        # segment's end boundary
        ends = jnp.clip(_ends(ids), 0, g.shape[0] - 1)
        tail_at_end = jnp.take(suffix_excl, ends)  # suffix after segment end
        return (suffix_excl - jnp.take(tail_at_end, ids), None)

    excl_sum_sorted.defvjp(_excl_fwd, _excl_bwd)

    @jax.custom_vjp
    def seg_sum_sorted(src, ids):
        csum = jnp.cumsum(src, axis=0)
        ends = jnp.clip(_ends(ids), 0, src.shape[0] - 1)
        cae = jnp.take(csum, ends, axis=0)
        prev = jnp.concatenate(
            [jnp.zeros((1, src.shape[1]), src.dtype), cae[:-1]], axis=0)
        return cae - prev

    def _seg_fwd(src, ids):
        return seg_sum_sorted(src, ids), ids

    def _seg_bwd(ids, g):
        return (jnp.take(g, ids, axis=0), None)

    seg_sum_sorted.defvjp(_seg_fwd, _seg_bwd)

    def composite_cvjp(sig, rgb):
        sdt = sig * dt
        excl_seg = excl_sum_sorted(sdt, ids)
        trans = jnp.exp(-excl_seg)
        alpha = 1 - jnp.exp(-sdt)
        w = trans * alpha
        acc = seg_sum_sorted(w[:, None] * rgb, ids)
        return jnp.sum(acc ** 2)

    g3 = jax.jit(jax.grad(composite_cvjp, argnums=(0, 1)))
    print(f"composite fwd+bwd customvjp: {timed(g3, sig, rgb5)*1e3:.3f} ms")

    # cross-check against the scatter reference
    def composite_ref(sig, rgb):
        sdt = sig * dt
        from nerfacc_tpu.scan import exclusive_sum
        trans = jnp.exp(-exclusive_sum(sdt, indices=ids))
        alpha = 1 - jnp.exp(-sdt)
        w = trans * alpha
        acc = jax.ops.segment_sum(w[:, None] * rgb, ids, num_segments=n_rays)
        return jnp.sum(acc ** 2)

    gr = jax.jit(jax.grad(composite_ref, argnums=(0, 1)))
    a = g3(sig, rgb5)
    b = gr(sig, rgb5)
    for x, y in zip(a, b):
        print("  max grad diff vs ref:", float(jnp.max(jnp.abs(x - y))))


if __name__ == "__main__":
    pass
