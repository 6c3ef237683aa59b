"""On-TPU timing: fused VMEM hash lookup vs the XLA gather forward.

Honest timing on the tunneled backend needs a dependency chain ending in
a real D2H fetch (block_until_ready does not block here — an 8192^3
matmul "measures" 0.03 ms without it; see PERF.md).

Shapes: the TPU-native NGP geometry L=16 x F=2 x T=2^15 (folded Q=4,
Tr=8192, src 4 MB f32 — VMEM-resident) at n = 2^16 and 2^18 samples,
vs (a) the XLA HashGridEncoder forward at the SAME geometry and (b) the
XLA forward at the reference-parity 2^19 geometry.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.models.encoders import HashGridEncoder
from nerfacc_tpu.ops.hash_vmem import fold_table, hash_vmem_lookup, plan_lanes


def timed_chain(st, x0, iters=10):
    x = st(x0)
    _ = float(jnp.sum(x))
    t0 = time.perf_counter()
    x = x0
    for _ in range(iters):
        x = st(x)
    _ = float(jnp.sum(x))
    return (time.perf_counter() - t0) / iters


def perturb(x):
    return jnp.roll(x, 1, axis=0) * 0.9999 + 1e-5


def main():
    print("devices:", jax.devices(), flush=True)
    for log2_t, n in ((15, 1 << 16), (15, 1 << 18), (14, 1 << 18)):
        enc = HashGridEncoder(log2_hashmap_size=log2_t)
        table = enc.init(jax.random.PRNGKey(0))
        src = fold_table(table)
        tr = src.shape[0]
        q = plan_lanes(enc.n_levels, enc.n_features_per_level)
        x0 = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
        res = enc.resolutions

        def vmem_step(x, _src=src, _res=res):
            out = hash_vmem_lookup(_src, x, resolutions=_res)
            return perturb(x) + jnp.sum(out) * 0

        def xla_step(x, _t=table, _e=enc):
            out = _e(_t, x)
            return perturb(x) + jnp.sum(out) * 0

        sv = jax.jit(vmem_step)
        sx = jax.jit(xla_step)
        try:
            tv = timed_chain(sv, x0)
            # correctness spot check vs the XLA path
            out_v = hash_vmem_lookup(src, x0[:tr], resolutions=res)
            lf = enc.n_levels * enc.n_features_per_level
            got = np.asarray(
                out_v[:, : lf * q].reshape(tr, -1, q).sum(-1)
            )
            want = np.asarray(enc(table, x0[:tr]))
            ok = np.allclose(got, want.reshape(tr, -1), atol=1e-4)
            print(
                f"[vmem T=2^{log2_t} n=2^{n.bit_length()-1}] "
                f"{tv*1e3:.2f} ms  correct={ok}",
                flush=True,
            )
        except Exception as e:
            print(
                f"[vmem T=2^{log2_t}] FAILED: "
                f"{type(e).__name__}: {str(e).splitlines()[0][:300]}",
                flush=True,
            )
        tx = timed_chain(sx, x0)
        print(
            f"[xla  T=2^{log2_t} n=2^{n.bit_length()-1}] {tx*1e3:.2f} ms",
            flush=True,
        )

    # parity-geometry XLA reference point
    enc19 = HashGridEncoder(log2_hashmap_size=19)
    t19 = enc19.init(jax.random.PRNGKey(0))
    x0 = jax.random.uniform(jax.random.PRNGKey(1), (1 << 16, 3))

    def xla19(x):
        return perturb(x) + jnp.sum(enc19(t19, x)) * 0

    print(
        f"[xla  T=2^19 n=2^16] {timed_chain(jax.jit(xla19), x0)*1e3:.2f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
