"""Scatter-free accumulation of update rows into table slots.

``grad[t] = sum_i [idx_i == t] * upd_i`` is the backward of an embedding
/ hash-table gather.  XLA's ``scatter-add`` on this chip costs ~60 ns per
update ROW regardless of table size, sortedness, or uniqueness (measured,
scripts/hash_bwd_probe.py): the 8.4M-row backward of the NGP hash encoder
(reference tcnn config, examples/radiance_fields/ngp.py:110-163) is
~520 ms — the single reason ``--field ngp`` trains ~35x slower than the
factorized fields.

This module implements the same reduction with ZERO scatters, following
the repo's sort-then-structured-math playbook (ops/compaction.py):

1. sort the (idx, upd) stream by idx — one int32-keyed multi-operand
   sort, ~2.4 ms per 1M keys on this chip;
2. cut the SORTED stream into fixed blocks of ``block_updates`` rows.
   A block's slot values span ~``num_rows * block_updates / n`` whp
   (uniform hash), so align each block to a ``win``-row boundary and
   accumulate it DENSELY into a ``win_per_block * win`` slot window on
   the MXU: ``g_win[b] = upd_sorted[b]^T @ onehot(slot - w0[b]*win)``
   — the iota-compare one-hot fuses into the dot, no materialization;
3. combine overlapping block windows: for window stream j, the block
   keys ``w0 + j`` are sorted, so per-sub-window totals are cumsum
   boundary differences along the block axis (row gathers, no scatter);
4. exactness: rows whose offset overflows the block window are zeroed in
   step 2 and repaired under ``lax.cond(n_overflow > 0, ...)`` by a
   masked scatter-add of ONLY those rows — the branch never executes for
   a uniformly hashed stream, but the result is exact by construction
   for ANY index distribution.

Measured on the v5e (8.4M updates, 2 features, 2^23-row table):
scatter-add 509 ms -> 157 ms at (block=8192, win=4096, w=4); see
PERF.md for the tuning table.
"""
from __future__ import annotations

import functools

import jax
import jax.lax as lax
import jax.numpy as jnp

__all__ = ["accumulate_table_rows"]


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_rows",
        "block_updates",
        "win",
        "win_per_block",
        "mxu_dtype",
    ),
)
def accumulate_table_rows(
    idx: jnp.ndarray,
    updates: jnp.ndarray,
    num_rows: int,
    *,
    block_updates: int = 8192,
    win: int = 4096,
    win_per_block: int = 4,
    mxu_dtype=jnp.float32,
) -> jnp.ndarray:
    """Sum ``updates`` rows into a ``(num_rows, F)`` table, scatter-free.

    Exact equivalent of
    ``jnp.zeros((num_rows, F)).at[idx].add(updates)`` (up to dot-product
    summation order; bit-exact reassociation is not promised, matching
    XLA's own scatter nondeterminism contract).

    Args:
        idx: ``(n,)`` int32 slot ids in ``[0, num_rows)``.
        updates: ``(n, F)`` float update rows (F small, e.g. 2-8).
        num_rows: number of table rows.
        block_updates: updates per MXU block (power of two).
        win: aligned sub-window width (power of two).
        win_per_block: sub-windows per block window; the dense window
            covers ``win_per_block * win`` slots.  Blocks of a sorted
            uniform stream span ``~num_rows * block_updates / n`` slots,
            so size the window >= 2x that; out-of-window rows fall back
            to the exact repair branch.
        mxu_dtype: dtype of the blocked one-hot dot.  ``float32`` keeps
            the result exact vs scatter; ``bfloat16`` halves MXU work
            but quantizes each update row to bf16 before summation.

    Returns:
        ``(num_rows, F)`` float32 accumulated table.
    """
    n, f = updates.shape
    ws = win_per_block * win
    rows_pad = _ceil_to(num_rows, win)
    n_pad = _ceil_to(n, block_updates)
    if n_pad != n:
        # Pad with zero-updates aimed at slot 0: contributes nothing.
        idx = jnp.concatenate(
            [idx, jnp.zeros((n_pad - n,), idx.dtype)]
        )
        updates = jnp.concatenate(
            [updates, jnp.zeros((n_pad - n, f), updates.dtype)]
        )
        n = n_pad
    nblk = n // block_updates
    nsub = rows_pad // win

    ops = [idx.astype(jnp.int32)] + [
        updates[:, j].astype(jnp.float32) for j in range(f)
    ]
    sorted_ops = lax.sort(ops, num_keys=1)
    sk = sorted_ops[0].reshape(nblk, block_updates)
    w0 = sk[:, 0] // win  # (nblk,) non-decreasing block window starts
    off = sk - (w0 * win)[:, None]  # (nblk, block_updates)
    overflow = off >= ws
    offc = jnp.where(overflow, 0, off)
    upd_sorted = jnp.stack(sorted_ops[1:], axis=-1)  # (n, f), pre-masking
    upd_blk = jnp.stack(
        [c.reshape(nblk, block_updates) for c in sorted_ops[1:]], axis=1
    )  # (nblk, f, block_updates)
    upd_blk = jnp.where(overflow[:, None, :], 0.0, upd_blk)

    # Blocked dense accumulation; the iota-compare one-hot fuses into the
    # dot (no (block_updates, ws) materialization in HBM).
    onehot = (
        offc[:, :, None] == jnp.arange(ws, dtype=jnp.int32)[None, None, :]
    )
    g_win = lax.dot_general(
        upd_blk.astype(mxu_dtype),
        onehot.astype(mxu_dtype),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (nblk, f, ws)

    # Combine: window stream j covers sub-window w0[b] + j; the keys are
    # sorted along b, so each sub-window's total is a cumsum boundary
    # difference (row gather of run-end prefix sums — zero scatters).
    gj = jnp.moveaxis(
        g_win.reshape(nblk, f, win_per_block, win), 2, 0
    )  # (win_per_block, nblk, f, win)
    csum = jnp.cumsum(gj, axis=1)
    csum = jnp.concatenate(
        [jnp.zeros((win_per_block, 1, f, win), jnp.float32), csum], axis=1
    )
    sub_iota = jnp.arange(nsub, dtype=jnp.int32)
    table = jnp.zeros((nsub, f, win), jnp.float32)
    for j in range(win_per_block):
        key_j = w0 + j  # (nblk,) sorted
        cnt = jnp.sum(
            (key_j[None, :] <= sub_iota[:, None]).astype(jnp.int32), axis=1
        )  # per sub-window: #blocks with key <= s
        picked = jnp.take(csum[j], cnt, axis=0)  # (nsub, f, win)
        prev = jnp.concatenate(
            [jnp.zeros((1, f, win), jnp.float32), picked[:-1]], axis=0
        )
        table = table + picked - prev
    grad = jnp.moveaxis(table, 1, 2).reshape(rows_pad, f)[:num_rows]

    # Exact repair of overflow rows (cond: never executes for uniform
    # hash streams — the sorted-block span concentrates far below ws).
    n_over = jnp.sum(overflow)

    def _repair(args):
        grad, sk_flat, upd_flat, over_flat = args
        rid = jnp.where(over_flat, sk_flat, num_rows)
        return grad.at[rid].add(upd_flat, mode="drop")

    def _no_repair(args):
        return args[0]

    grad = lax.cond(
        n_over > 0,
        _repair,
        _no_repair,
        (grad, sk.reshape(-1), upd_sorted, overflow.reshape(-1)),
    )
    return grad
