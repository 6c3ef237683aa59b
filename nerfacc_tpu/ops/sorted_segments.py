"""Scatter-free segmented reductions for *sorted* ray indices.

The training render path works on a compacted flat sample buffer whose ray
ids are nondecreasing (``CompactSamples``).  On this hardware the generic
lowerings of segmented ops are dominated by three pathologies measured on
chip (scripts/microbench_scan.py):

* scatter-add transpose of a gather: ~3.3 ms for 262k rows into 2048 slots;
* any scatter at all: ~1.6 ms even for 2048 rows;
* ``reverse`` applied to a scan output: ~2 ms (breaks fusion).

For sorted segments every forward AND backward can instead be written with
only prefix ``cumsum``, boundary gathers (n_rays rows from the flat array)
and small-table gathers (flat rows from an (n_rays,) table) — each ~30 us.
These ops implement that via ``jax.custom_vjp``:

* exclusive-sum backward: ``dL/dv[j] = sum_{i>j, same seg} g[i]
  = incl[end(seg(j))] - incl[j]`` with ``incl = cumsum(g)`` — no reverse,
  no scatter (suffix sums fall out of prefix sums and the scalar total).
* segment-sum backward: broadcast per-segment grads back with one
  small-table gather.

Replaces the tuple ``lax.associative_scan`` path for training (17.7 ms ->
~0.3 ms fwd+bwd for the full composite at 2^18 samples).  The general
unsorted layouts keep the associative-scan implementation in ``scan.py``.

(reference semantics: nerfacc/scan.py:80-145 ``exclusive_sum`` and
nerfacc/volrend.py:497-561 ``accumulate_along_rays`` restricted to sorted
``ray_indices`` — the layout the reference's traversal emits, grid.cu:247.)
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def segment_ends(ids: jnp.ndarray, n_rays: int) -> jnp.ndarray:
    """Index of the last element of each segment (-1 for empty segments
    before the first sample; ends are nondecreasing)."""
    return (
        jnp.searchsorted(
            ids, jnp.arange(n_rays, dtype=ids.dtype), side="right"
        ).astype(jnp.int32)
        - 1
    )


def segment_starts(ids: jnp.ndarray, n_rays: int) -> jnp.ndarray:
    return jnp.searchsorted(
        ids, jnp.arange(n_rays, dtype=ids.dtype), side="left"
    ).astype(jnp.int32)


def _take_table(table: jnp.ndarray, ids: jnp.ndarray, n_rays: int):
    """Gather from an (n_rays, ...) table at flat sorted ids; out-of-range
    ids (the ``n_rays`` fill value of compacted buffers) read row n_rays-1 —
    callers must mask those slots."""
    return jnp.take(table, jnp.minimum(ids, n_rays - 1), axis=0)


def spread_table(table: jnp.ndarray, ids: jnp.ndarray, n_rays: int):
    """``out[i] = table[ids[i]]`` as a one-hot f32 matmul instead of a gather.

    An XLA gather costs ~7 ns/index on this TPU regardless of width (~2 ms
    at 2^18 indices); the MXU evaluates the equivalent (N, n_rays) one-hot
    contraction in ~0.1 ms, and XLA fuses the iota-compare one-hot into the
    dot without materializing it.  Exact: the one-hot and the f32 dot are
    exact for f32 table values.  Out-of-range ids (compacted-buffer fill,
    ``ids == n_rays``) produce all-zero rows -> spread value 0.

    REQUIRES finite table values: a single inf/NaN entry poisons EVERY
    output row (``0 * inf = NaN`` in the contraction) — clip infinities to
    +-1e30 at the call site (a gather would not care).
    """
    squeeze = table.ndim == 1
    t = table[:, None] if squeeze else table
    oh = (
        ids[:, None] == jnp.arange(n_rays, dtype=ids.dtype)[None, :]
    ).astype(jnp.bfloat16)
    # The TPU default lowers f32 dots to single-pass bf16 (measured 0.4%
    # relative error on spread values — enough to shift ray origins by half
    # a voxel), and Precision.HIGHEST costs ~2.3 ms/step in spreads alone.
    # Exactness at default precision: split the table into three bf16 limbs
    # (top/mid/low 8 mantissa bits) — each one-hot contraction moves its
    # limb exactly (1.0 * limb, f32 accumulate), and hi+mid+lo reconstructs
    # the f32 value bit-exactly.  The limbs ride ONE dot as column groups
    # of a concatenated (n_rays, 3C) rhs, so the (N, n_rays) one-hot is
    # generated and streamed through the MXU once, not three times (the
    # one-hot generation dominates: three separate limb dots cost ~3x).
    # The barriers are REQUIRED: XLA folds the bf16->f32->subtract convert
    # chain (r1 = t - f32(bf16(t)) simplifies to 0, zeroing the low limbs),
    # and without the post-dot barrier it can rewrite the column-group sum
    # as a pre-summed bf16 rhs — both verified on the v5e to silently
    # reintroduce the 0.4% error the limbs exist to remove.
    hi = jax.lax.optimization_barrier(t.astype(jnp.bfloat16))
    r1 = t - hi.astype(jnp.float32)
    mid = jax.lax.optimization_barrier(r1.astype(jnp.bfloat16))
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)

    C = t.shape[1]
    limbs = jnp.concatenate([hi, mid, lo], axis=1)  # (n_rays, 3C)
    out3 = jax.lax.dot_general(
        oh, limbs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    parts = jax.lax.optimization_barrier(
        (out3[:, :C], out3[:, C : 2 * C], out3[:, 2 * C :])
    )
    out = ((parts[0] + parts[1]) + parts[2]).astype(t.dtype)
    return out[:, 0] if squeeze else out


def spread_table_bf16(table: jnp.ndarray, ids: jnp.ndarray, n_rays: int):
    """Fast single-dot one-hot spread — bf16 VALUE precision (~0.4%
    relative).  NOT used by the sorted-segment backwards anymore: spreading a
    GLOBAL prefix sum in bf16 and differencing it against an f32 prefix
    cancels catastrophically (error scales with the global cumsum magnitude,
    not 0.4% — measured max rel err 2.09 at n=512), and the exact 3-limb
    :func:`spread_table` costs about the same (fused bf16 dots).  Kept for
    callers spreading SMALL standalone values where 0.4% is acceptable and
    no near-equal subtraction follows.  Out-of-range ids spread 0.  Requires
    finite table values."""
    squeeze = table.ndim == 1
    t = table[:, None] if squeeze else table
    oh = (
        ids[:, None] == jnp.arange(n_rays, dtype=ids.dtype)[None, :]
    ).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        oh, t.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(t.dtype)
    return out[:, 0] if squeeze else out


def _resolve_bounds(ids, n_rays, seg_starts, seg_ends, need):
    """Boundaries from precomputed arrays (preferred: searchsorted lowers to
    a slow multi-pass binary search on TPU) or searchsorted fallback."""
    if need == "starts":
        return segment_starts(ids, n_rays) if seg_starts is None else seg_starts
    return segment_ends(ids, n_rays) if seg_ends is None else seg_ends


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 5))
def exclusive_sum_sorted(
    vals: jnp.ndarray,
    ids: jnp.ndarray,
    n_rays: int,
    seg_starts: jnp.ndarray = None,
    seg_ends: jnp.ndarray = None,
    nonnegative: bool = False,
) -> jnp.ndarray:
    """``out[i] = sum_{j < i, ids[j] == ids[i]} vals[j]`` for nondecreasing
    ``ids``.  Slots with ``ids >= n_rays`` (buffer fill) get unspecified
    values — mask downstream.

    ``seg_starts`` / ``seg_ends``: optional precomputed (n_rays,) first/last
    slot of each segment (e.g. from ``CompactSamples``); avoids searchsorted.

    ``nonnegative``: promise that ``vals >= 0`` (true for sigma*dt).  Then
    the forward switches to a BLOCK-DECOMPOSED evaluation whose error is
    relative to the segment-local true value instead of the global running
    magnitude.  The naive form (global f32 cumsum, subtract the value at the
    segment start) carries absolute error ~eps * global_cumsum: at 2^18
    samples of capped optical depth the global sum reaches 1e6+ and the
    measured transmittance error hits 0.35 (scripts/diag_eval_break.py, the
    round-5 opaque eval break).  Decomposed:

        excl_seg(i) = p(i) + rangesum(t_b, [b_s, b_i)) - p(s)

    with ``p`` the within-block exclusive prefix (reshaped cumsum, error
    <= eps * block_sum <= eps * 40 * L), ``t_b`` the per-block totals summed
    over the segment's own block range by an exact 3-limb one-hot matmul
    (f32-accumulated, so error ~ eps * true range sum — RELATIVE), and the
    segment-start pair (b_s, p_s) spread per sample by the bit-exact
    :func:`spread_table`.  Result clamped at 0 (exact under the vals >= 0
    contract).
    """
    n = vals.shape[0]
    if nonnegative:
        L = 128
        n_pad = -(-n // L) * L
        v = jnp.pad(vals, (0, n_pad - n)) if n_pad != n else vals
        v2 = v.reshape(n_pad // L, L)
        incl_b = jnp.cumsum(v2, axis=1)
        p_flat = (incl_b - v2).reshape(-1)
        t_b = incl_b[:, -1]  # (B,) block totals
        B = n_pad // L

        starts = _resolve_bounds(ids, n_rays, seg_starts, seg_ends, "starts")
        sc = jnp.clip(starts, 0, n - 1)
        start_tab = jnp.stack(
            [(sc // L).astype(jnp.float32), jnp.take(p_flat, sc)], axis=1
        )  # (n_rays, 2): [block of segment start, prefix within that block]
        sp = spread_table(start_tab, ids, n_rays)  # exact; fill ids -> 0
        b_s, p_s = sp[:, 0], sp[:, 1]

        iota = jnp.arange(n, dtype=jnp.int32)
        b_i = (iota // L).astype(jnp.float32)
        arange_b = jnp.arange(B, dtype=jnp.float32)
        # 3-limb exact range-sum matmul (same barrier discipline as
        # spread_table: see the comment there for why both are required)
        tb2 = t_b[:, None]
        hi = jax.lax.optimization_barrier(tb2.astype(jnp.bfloat16))
        r1 = tb2 - hi.astype(jnp.float32)
        mid = jax.lax.optimization_barrier(r1.astype(jnp.bfloat16))
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        limbs = jnp.concatenate([hi, mid, lo], axis=1)  # (B, 3)
        mask = (
            (arange_b[None, :] >= b_s[:, None])
            & (arange_b[None, :] < b_i[:, None])
        ).astype(jnp.bfloat16)
        out3 = jax.lax.dot_general(
            mask, limbs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        parts = jax.lax.optimization_barrier(
            (out3[:, 0], out3[:, 1], out3[:, 2])
        )
        rangesum = (parts[0] + parts[1]) + parts[2]
        return jnp.maximum(p_flat[:n] + rangesum - p_s, 0.0)
    incl = jnp.cumsum(vals)
    excl = incl - vals
    starts = _resolve_bounds(ids, n_rays, seg_starts, seg_ends, "starts")
    seg_off = jnp.take(excl, jnp.clip(starts, 0, n - 1))
    return excl - _take_table(seg_off, ids, n_rays)


def _excl_fwd(vals, ids, n_rays, seg_starts=None, seg_ends=None, nonnegative=False):
    out = exclusive_sum_sorted(
        vals, ids, n_rays, seg_starts, seg_ends, nonnegative
    )
    return out, (ids, seg_ends)


def _excl_bwd(n_rays, nonnegative, res, g):
    ids, seg_ends = res
    n = g.shape[0]
    incl = jnp.cumsum(g)
    ends = _resolve_bounds(ids, n_rays, None, seg_ends, "ends")
    incl_at_end = jnp.take(incl, jnp.clip(ends, 0, n - 1))
    # dL/dv[j] = sum_{i > j, same segment} g[i] = incl[end(seg)] - incl[j];
    # fill slots get incl_at_end 0 from the one-hot spread — their grads are
    # garbage either way and are masked upstream.
    # EXACT spread required: incl is a GLOBAL cumsum, so the difference
    # cancels catastrophically — a bf16 spread of incl_at_end carries error
    # proportional to the global prefix magnitude, not 0.4% of the gradient
    # (measured max rel err 2.09 at n=512).  The three-limb spread_table is
    # bit-exact and its fused bf16 dots cost ~the single-dot spread.
    return (spread_table(incl_at_end, ids, n_rays) - incl, None, None, None)


exclusive_sum_sorted.defvjp(_excl_fwd, _excl_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def segment_sum_sorted(
    src: jnp.ndarray,
    ids: jnp.ndarray,
    n_rays: int,
    seg_starts: jnp.ndarray = None,
    seg_ends: jnp.ndarray = None,
) -> jnp.ndarray:
    """Per-segment sums ``out[r] = sum_{ids[i] == r} src[i]`` for
    nondecreasing ``ids``; ``src`` may be (n,) or (n, C).  Fill slots
    (``ids >= n_rays``) are excluded automatically (they lie past every
    real segment's end).

    Multi-channel inputs are reduced channel-by-channel: C independent 1-D
    cumsums are ~30 us each on TPU while a single (n, C) axis-0 cumsum pays
    a pathological minor-dim layout (~4 ms measured at n=2^18, C=5).
    """
    n = src.shape[0]
    ends = _resolve_bounds(ids, n_rays, seg_starts, seg_ends, "ends")
    ends_c = jnp.clip(ends, 0, n - 1)
    nonempty = ends >= 0

    def _one(col):
        csum = jnp.cumsum(col)
        cae = jnp.where(nonempty, jnp.take(csum, ends_c), 0.0)
        prev = jnp.concatenate([jnp.zeros_like(cae[:1]), cae[:-1]])
        return cae - prev

    if src.ndim == 1:
        return _one(src)
    return jnp.stack([_one(src[:, c]) for c in range(src.shape[1])], axis=-1)


def _seg_fwd(src, ids, n_rays, seg_starts=None, seg_ends=None):
    out = segment_sum_sorted(src, ids, n_rays, seg_starts, seg_ends)
    return out, ids


def _seg_bwd(n_rays, ids, g):
    # dL/dsrc[i] = g[seg(i)]; fill slots spread to 0 (masked upstream anyway:
    # w = 0 on fill slots).  Exact spread: the grad tests pin 1e-5 agreement
    # with jax.ops.segment_sum, and the 3-limb spread costs ~ the bf16 one.
    return (spread_table(g, ids, n_rays), None, None, None)


segment_sum_sorted.defvjp(_seg_fwd, _seg_bwd)
