"""Sort-free stable compaction via hierarchical cumsum inversion.

The pooled train path compacts twice per step: surviving windows out of
the (n_rays, max_coarse) candidate grid, and surviving samples out of the
(window_budget, window_size) pool.  Both were order-preserving key sorts
(``sort_key_val`` of iota keys) — and after the round-5 analytic payload
removed the gather costs around them, the two sorts were the TOP ops of
the step trace (13.6% + 9.7% of device time).

WHERE THIS WINS (measured, v5e): only the WINDOW stage.  The inversion's
intermediates scale as B x sqrt(n) — at the window stage (B ~= 52k
outputs over n = 2k rays) everything fits in a few MB and it replaces the
0.4 ms sort with ~0.05 ms of fused compares; at the SAMPLE stage (B =
2^18 outputs over n ~= 52k windows) every (B, ~256) f32 intermediate is a
>=134 MB HBM pass and the sort wins (full inversion benched 18.6M vs
23.1M samples/s end-to-end).  The shipping config
(``compaction="onehot"``) therefore uses the inversion for windows and a
SINGLE-OPERAND key sort for samples (the sorted key IS the payload:
``sel = sort(keys)[:B] % n``), which together took the bench from 23.08M
to 24.76M samples/s (1.375x baseline).

A stable compaction does not need a sort.  The p-th kept element's row is

    row(p) = #{ r : C_incl[r] <= p },   C_incl = cumsum(per-row counts)

because ``C_incl`` is nondecreasing: rows whose inclusive cumsum is <= p
lie entirely before the p-th element.  Inverting this monotone map for all
p in [0, B) takes two levels of cheap vectorized compares:

  1. block step:  compare p against the S1 block-end cumsums (B x S1
     elementwise ops) -> block index b(p), plus the largest block-end <= p
     via a masked max (no gather);
  2. row step:    fetch block b(p)'s S2 row cumsums with ONE one-hot
     (B, S1) x (S1, 3*S2) matmul and compare again -> row offset within
     the block + the largest row cumsum <= p.  The fetch is EXACT at
     single-pass bf16 MXU rate: the integer table is split into three
     bytes (values < 2^24), each byte <= 256 is bf16-exact, one-hot rows
     select exactly one entry per output (f32 accumulation), and the
     bytes recombine with two exact f32 FMAs.  (A plain f32 fetch needs
     Precision.HIGHEST = 6 MXU passes — measured slower end-to-end.)

The local rank is ``p - C_excl[row(p)]``.  ``stable_partition_rows``
computes it via masked maxes, but the shipping consumer instead appends
the per-row EXCLUSIVE cumsum as one extra payload lane and subtracts
after the payload gather it already pays for — leaving the rank output
unused so XLA dead-code-eliminates the two (B, S) where+max fusions.

Exactness: every quantity is a small integer carried in f32 (values <=
total <= 2^24), each one-hot row selects exactly one table entry (no
accumulation), so ``stable_partition_rows`` reproduces the sort-based
compaction BIT-FOR-BIT (asserted against the sort path in
tests/test_compaction.py).

The rank -> lane resolution (which of a row's fixed-width lanes is its
q-th kept one) deliberately does NOT build a per-row (m x m) lookup
table: consumers append the row's inclusive-cumsum lanes to a payload
row gather they already pay for and call :func:`lane_from_cumsum` —
``lane = #{l : cs[l] <= q}`` — one (B, m) compare+sum.  (The table
variant materializes an (n, m, m) intermediate — 210 MB at the window
stage's (2048, 160) shape — and measured slower.)

(reference analog: nerfacc's CUDA traversal compacts with per-thread
atomics + a device prefix scan, grid.cu:190-247; TPUs have no fast
scatter, so the repo used sorts — this removes even those.)
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def _block_split(n: int) -> Tuple[int, int]:
    """Pick (S1, S2) with S1 * S2 >= n, both near sqrt(n) (S2 rounded to a
    lane-friendly multiple of 8)."""
    s2 = max(8, min(512, 1 << math.ceil(math.log2(max(1.0, math.sqrt(n))))))
    s1 = (n + s2 - 1) // s2
    return s1, s2


def stable_partition_rows(
    counts: jnp.ndarray, budget: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Row / local-rank lookup for a stable compaction, without a sort.

    Args:
        counts: (n,) int32 — number of kept items in each row of a
            row-major flat layout (rows keep their items in order).
        budget: number of output slots B.

    Returns:
        ``(row, rank, total)``:
        row:  (B,) int32 — row of the p-th kept item; ``n`` for p >= total.
        rank: (B,) int32 — 0-based rank of the item within its row
            (garbage-but-bounded for p >= total).
        total: () int32 — total kept items.
    """
    n = counts.shape[0]
    s1, s2 = _block_split(n)
    c_incl = jnp.cumsum(counts.astype(jnp.int32))
    total = c_incl[-1]
    # pad to s1*s2 with a sentinel above any p (f32-exact power of two)
    sentinel = jnp.float32(2.0**24)
    cp = jnp.full((s1 * s2,), sentinel, jnp.float32)
    cp = jax.lax.dynamic_update_slice(cp, c_incl.astype(jnp.float32), (0,))
    tbl = cp.reshape(s1, s2)
    ends1 = tbl[:, -1]  # (s1,) block-end cumsums

    p = jnp.arange(budget, dtype=jnp.float32)[:, None]  # (B, 1)
    le1 = ends1[None, :] <= p  # (B, s1)
    b1 = jnp.sum(le1, axis=-1, dtype=jnp.int32)  # blocks fully consumed
    base1 = jnp.max(jnp.where(le1, ends1[None, :], 0.0), axis=-1)  # (B,)
    b1c = jnp.minimum(b1, s1 - 1)

    # One-hot row fetch of block b1's row cumsums.  Byte-split: the table
    # holds integers < 2^24 + 1; each byte (<= 256) is bf16-exact, so three
    # single-pass bf16 dots (packed into ONE (B, s1) x (s1, 3*s2) matmul,
    # f32 accumulation) fetch the row exactly — one-hot rows touch exactly
    # one table entry per output, so no rounding accumulates.
    hi = jnp.floor(tbl / 65536.0)
    mid = jnp.floor((tbl - hi * 65536.0) / 256.0)
    lo = tbl - hi * 65536.0 - mid * 256.0
    tbl3 = jnp.concatenate([hi, mid, lo], axis=-1).astype(jnp.bfloat16)
    oh = (
        b1c[:, None] == jnp.arange(s1, dtype=jnp.int32)[None, :]
    ).astype(jnp.bfloat16)
    f3 = jax.lax.dot(
        oh, tbl3, preferred_element_type=jnp.float32
    )  # (B, 3*s2)
    vals = (
        f3[:, :s2] * 65536.0 + f3[:, s2 : 2 * s2] * 256.0 + f3[:, 2 * s2 :]
    )
    le2 = vals <= p
    partial = jnp.sum(le2, axis=-1, dtype=jnp.int32)
    base2 = jnp.max(jnp.where(le2, vals, 0.0), axis=-1)

    row = jnp.minimum(b1 * s2 + partial, n)
    base = jnp.maximum(base1, base2)  # C_excl[row(p)] (0 when row == 0)
    rank = jnp.arange(budget, dtype=jnp.int32) - base.astype(jnp.int32)
    return row, rank, total


def valid_cumsum_lanes(valid: jnp.ndarray) -> jnp.ndarray:
    """Inclusive per-row cumsum of a (n, m) bool lane-validity mask, f32.

    Consumers append these m lanes to a payload row gather they already
    pay for; :func:`lane_from_cumsum` then resolves rank -> lane with one
    (B, m) compare+sum on the gathered rows.  The last column is the
    per-row count (callers reuse it instead of a separate sum).
    """
    return jnp.cumsum(valid.astype(jnp.float32), axis=-1)


def lane_from_cumsum(cs_rows: jnp.ndarray, rank: jnp.ndarray) -> jnp.ndarray:
    """Lane index of each row's ``rank``-th kept element.

    ``cs_rows`` (B, m) f32 — the row's inclusive validity cumsum (gathered
    payload lanes); ``rank`` (B,) int32.  Returns (B,) int32 ``lane =
    #{ l : cs[l] <= rank }`` — the position of the (rank+1)-th set bit
    (m for rank >= count; callers clip).  Monotone cumsum makes the count
    exact; everything stays in small-integer f32.
    """
    q = rank.astype(jnp.float32)[:, None]
    return jnp.sum(cs_rows <= q, axis=-1, dtype=jnp.int32)
