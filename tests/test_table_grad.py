"""accumulate_table_rows vs scatter-add, and the hash-encoder grad mode.

The scatter-free sorted-block accumulator (ops/table_grad.py) must be an
exact drop-in for ``zeros.at[idx].add(updates)`` for ANY index
distribution — uniform (never hits the repair branch), clustered
(overflowing block windows exercise the lax.cond repair), and empty.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfacc_tpu.models.encoders import HashGridEncoder
from nerfacc_tpu.ops.table_grad import accumulate_table_rows


def _scatter_ref(idx, upd, rows):
    return jnp.zeros((rows, upd.shape[1]), jnp.float32).at[idx].add(upd)


@pytest.mark.parametrize(
    "rows,n,block,win,wpb",
    [
        (1 << 14, 1 << 15, 2048, 1024, 4),
        (1 << 14, 1 << 15, 2048, 512, 2),
        (1000, 777, 256, 128, 4),  # non-pow2 rows/n -> padding paths
    ],
)
def test_uniform_matches_scatter(rows, n, block, win, wpb):
    idx = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, rows, jnp.int32)
    upd = jax.random.normal(jax.random.PRNGKey(1), (n, 2), jnp.float32)
    want = _scatter_ref(idx, upd, rows)
    got = accumulate_table_rows(
        idx, upd, rows, block_updates=block, win=win, win_per_block=wpb
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_clustered_indices_exercise_repair():
    # Every update lands in one tiny slot range: block spans are 0 but a
    # window-aligned start plus a hot tail forces offsets >= ws for some
    # blocks when the hot slot sits past the window.  Construct directly:
    # half the stream at slot 1, half far beyond any 4*win window.
    rows, n = 1 << 14, 1 << 13
    idx = jnp.where(
        jnp.arange(n) % 2 == 0, 1, rows - 2
    ).astype(jnp.int32)
    upd = jax.random.normal(jax.random.PRNGKey(2), (n, 3), jnp.float32)
    want = _scatter_ref(idx, upd, rows)
    got = accumulate_table_rows(
        idx, upd, rows, block_updates=1024, win=128, win_per_block=2
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-3, rtol=1e-5
    )


def test_all_one_slot():
    rows, n = 4096, 4096
    idx = jnp.full((n,), 17, jnp.int32)
    upd = jnp.ones((n, 2), jnp.float32)
    got = accumulate_table_rows(
        idx, upd, rows, block_updates=512, win=256, win_per_block=2
    )
    want = _scatter_ref(idx, upd, rows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_hash_encoder_sorted_blocks_grad_matches_scatter():
    enc_a = HashGridEncoder(
        n_levels=4, log2_hashmap_size=10, base_resolution=4,
        max_resolution=32,
    )
    enc_b = HashGridEncoder(
        n_levels=4, log2_hashmap_size=10, base_resolution=4,
        max_resolution=32, table_grad="sorted_blocks",
    )
    table = enc_a.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (257, enc_a.output_dim))

    def loss(enc):
        def f(tab, xx):
            return jnp.sum((enc(tab, xx) - tgt) ** 2)

        return f

    va, (gta, gxa) = jax.value_and_grad(loss(enc_a), argnums=(0, 1))(
        table, x
    )
    vb, (gtb, gxb) = jax.value_and_grad(loss(enc_b), argnums=(0, 1))(
        table, x
    )
    assert np.allclose(float(va), float(vb), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gta), np.asarray(gtb), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gxa), np.asarray(gxb), atol=1e-4, rtol=1e-4
    )
