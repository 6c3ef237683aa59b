"""Fused VMEM hash lookup vs the XLA HashGridEncoder (interpret mode).

The kernel must reproduce the XLA encoder bit-for-bit-compatible math:
same tcnn primes with uint32 wraparound, same trilinear corner order,
same fold selection.  On-TPU timing lives in scripts/hash_vmem_probe.py.
"""
import jax
import jax.numpy as jnp
import numpy as np

from nerfacc_tpu.models.encoders import HashGridEncoder
from nerfacc_tpu.ops.hash_vmem import (
    fold_table,
    hash_vmem_lookup,
    plan_lanes,
)


def _vmem_encode(enc, table, x, interpret=True):
    L, T, F = table.shape
    q = plan_lanes(L, F)
    src = fold_table(table)
    tr = src.shape[0]
    n = x.shape[0]
    n_pad = (n + tr - 1) // tr * tr
    xp = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    out = hash_vmem_lookup(
        src, xp, resolutions=enc.resolutions, interpret=interpret
    )
    return (
        out[:n, : L * F * q].reshape(n, L, F, q).sum(-1).reshape(n, L * F)
    )


def test_vmem_lookup_matches_xla_encoder():
    enc = HashGridEncoder(
        n_levels=16, n_features_per_level=2, log2_hashmap_size=12,
        base_resolution=4, max_resolution=128,
    )
    table = enc.init(jax.random.PRNGKey(0)) * 1e4  # O(1) values
    x = jax.random.uniform(jax.random.PRNGKey(1), (300, 3))
    want = enc(table, x)
    got = _vmem_encode(enc, table, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_vmem_lookup_small_level_count():
    # L=5 (NGPDensityField geometry): Q=8 folds, 80 lanes used.
    enc = HashGridEncoder(
        n_levels=5, n_features_per_level=2, log2_hashmap_size=11,
        base_resolution=4, max_resolution=64,
    )
    table = enc.init(jax.random.PRNGKey(2)) * 1e4
    x = jax.random.uniform(jax.random.PRNGKey(3), (123, 3))
    want = enc(table, x)
    got = _vmem_encode(enc, table, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_encoder_vmem_lookup_fwd_and_table_grad():
    kw = dict(
        n_levels=8, n_features_per_level=2, log2_hashmap_size=11,
        base_resolution=4, max_resolution=64,
    )
    enc_x = HashGridEncoder(**kw)
    enc_v = HashGridEncoder(**kw, lookup="vmem")
    table = enc_x.init(jax.random.PRNGKey(0)) * 1e4
    x = jax.random.uniform(jax.random.PRNGKey(1), (200, 3))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (200, enc_x.output_dim))

    np.testing.assert_allclose(
        np.asarray(enc_v(table, x)), np.asarray(enc_x(table, x)),
        atol=1e-5, rtol=1e-5,
    )

    def loss(enc):
        return lambda tab: jnp.sum((enc(tab, x) - tgt) ** 2)

    gx = jax.grad(loss(enc_x))(table)
    gv = jax.grad(loss(enc_v))(table)
    np.testing.assert_allclose(
        np.asarray(gv), np.asarray(gx), atol=1e-3, rtol=1e-4
    )


def test_fold_table_roundtrip_lane_layout():
    L, T, F = 4, 64, 2
    q = plan_lanes(L, F)
    table = jnp.arange(L * T * F, dtype=jnp.float32).reshape(L, T, F)
    src = fold_table(table)
    tr = T // q
    for lane in range(L * F * q):
        l, f, qq = lane // (F * q), (lane // q) % F, lane % q
        np.testing.assert_array_equal(
            np.asarray(src[:, lane]),
            np.asarray(table[l, qq * tr:(qq + 1) * tr, f]),
        )
