"""VMEM-resident fused multiresolution hash-grid lookup (Pallas TPU).

STATUS: MEASURED DEAD END on current Mosaic — kept as the executable
record of the experiment (VERDICT r4 task 3) and as an interpret-mode
reference for a future gather primitive.  ``tpu.dynamic_gather`` refuses
any source spanning more than ONE vreg along the gathered dimension:

    Not implemented: Multiple source vregs along gather dimension
    (vector<512x128xf32> source; T=16 f32 already fails, T=8 lowers)

i.e. per-lane tables are capped at 8 f32 rows — five orders of magnitude
short of a 2^19-row hash level.  Composing bigger tables from 8-row
gathers (range-select over T/8 chunks) or per-sample scalar-core DMAs
multiplies work by T/8 resp. issues ~67M sequential DMAs per step; both
are strictly worse than the XLA HBM gather floor (~7.3 ns/index,
scripts/hash_bwd_probe.py).  Conclusion recorded in PERF.md: on this
hardware generation there is no on-chip random-gather path faster than
XLA's, and the factorized/matmul fields remain the TPU-native answer to
the hash-grid quality role.

The kernel below is complete and interpret-mode exact: it keeps the
whole multi-level table on-chip and evaluates every level of every
sample with 8 ``tpu.dynamic_gather`` passes (one per trilinear corner),
computing hash indices and corner weights in-kernel.

Layout (the Mosaic gather lowers only same-shape 2-D per-lane operands,
see ops/lane_gather.py):

- lanes = L levels x F features x Q folds, Q = largest power of two with
  ``L * F * Q <= 128``.  Each level's ``(T, F)`` table is folded into Q
  column groups of ``T/Q`` rows: ``src[t, lane(l,f,q)] = table[l, q*Tr+t, f]``
  with ``Tr = T/Q``.
- one gather call processes exactly ``Tr`` samples (the same-shape
  constraint pins block height to table height), so the sample grid runs
  in blocks of ``Tr``.
- per corner: hash h in [0, T); its fold ``q_h = h >> log2(Tr)`` selects
  which lane holds the true row — the other Q-1 fold lanes gather garbage
  that is masked to zero.  The XLA caller sums fold lanes:
  ``feats = out.reshape(n, L, F, Q).sum(-1)``.

Capacity bound: src is ``(Tr, 128)`` f32 and must fit VMEM together with
the x/out blocks — Tr <= 8192 in f32, i.e. per-level tables up to
``T = Q * 8192`` (2^15 at the NGP L=16/F=2 geometry).  Bigger tables stay
on the XLA gather path.

Exactly matches the XLA ``HashGridEncoder`` math (same tcnn primes, same
uint32 wraparound, same trilinear corner order); equality is asserted in
tests/test_hash_vmem.py.

Reference role: the tcnn HashGrid+lerp fused CUDA forward
(reference examples/radiance_fields/ngp.py:110-163).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["hash_vmem_lookup", "fold_table", "plan_lanes"]

# tcnn spatial hash primes (public constants), as wrapped int32 so the
# in-kernel i32 multiply reproduces uint32 wraparound bit-for-bit.
_PRIMES = tuple(
    p - (1 << 32) if p >= (1 << 31) else p
    for p in (1, 2654435761, 805459861)
)

# Trilinear corner order matching HashGridEncoder (__call__): offsets
# enumerated as dx-major: (0,0,0), (0,0,1), (0,1,0), ..., (1,1,1).
_CORNERS = tuple(
    (dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)
)


def plan_lanes(n_levels: int, n_features: int) -> int:
    """Folds per level: largest power of two with L*F*Q <= 128."""
    q = 128 // (n_levels * n_features)
    if q < 1:
        raise ValueError(
            f"L*F = {n_levels * n_features} exceeds the 128-lane budget"
        )
    return 1 << (q.bit_length() - 1)


def fold_table(table: jnp.ndarray) -> jnp.ndarray:
    """Pack ``(L, T, F)`` params into the ``(T/Q, 128)`` lane layout.

    Lane order is l-major: ``lane = l*(F*Q) + f*Q + q``; unused tail
    lanes (when L*F*Q < 128) are zero.
    """
    l, t, f = table.shape
    q = plan_lanes(l, f)
    if t % q:
        raise ValueError(f"table rows ({t}) must divide by folds ({q})")
    tr = t // q
    # (L, Q, Tr, F) -> (Tr, L, F, Q) -> (Tr, L*F*Q)
    folded = jnp.transpose(
        table.reshape(l, q, tr, f), (2, 0, 3, 1)
    ).reshape(tr, l * f * q)
    pad = 128 - l * f * q
    if pad:
        folded = jnp.pad(folded, ((0, 0), (0, pad)))
    return folded


def _lane_constants(resolutions, q, f):
    """(3, 128) f32: rows = [level res, fold id, lane-valid mask]."""
    import numpy as np

    l = len(resolutions)
    lane = np.arange(128)
    lane_level = np.minimum(lane // (f * q), l - 1)
    return jnp.asarray(
        np.stack(
            [
                np.asarray(resolutions, np.float32)[lane_level],
                (lane % q).astype(np.float32),
                (lane < l * f * q).astype(np.float32),
            ]
        ),
        jnp.float32,
    )


def _make_kernel(t_res, q, n_corners=8):
    log2_tr = (t_res - 1).bit_length()
    assert t_res == 1 << log2_tr, "t_res must be a power of two"
    t_eff = t_res * q

    def kernel(src_ref, x_ref, const_ref, out_ref):
        x = x_ref[:]  # (t_res, 3)
        bs = x.shape[0]
        consts = const_ref[:]  # (3, 128)
        res_row = jax.lax.broadcast_in_dim(consts[0], (bs, 128), (1,))
        fold_row = jax.lax.broadcast_in_dim(
            consts[1].astype(jnp.int32), (bs, 128), (1,)
        )
        valid_row = jax.lax.broadcast_in_dim(consts[2], (bs, 128), (1,))
        # Per-dim positions broadcast across lanes at the lane's level res.
        pos = [x[:, d][:, None] * res_row for d in range(3)]
        i0 = [jnp.floor(p).astype(jnp.int32) for p in pos]
        frac = [p - jnp.floor(p) for p in pos]

        acc = jnp.zeros((bs, 128), jnp.float32)
        for dx, dy, dz in _CORNERS[:n_corners]:
            cx = i0[0] + dx
            cy = i0[1] + dy
            cz = i0[2] + dz
            h = (
                cx * jnp.int32(_PRIMES[0])
                ^ cy * jnp.int32(_PRIMES[1])
                ^ cz * jnp.int32(_PRIMES[2])
            ) & jnp.int32(t_eff - 1)
            off = h & jnp.int32(t_res - 1)
            q_h = jax.lax.shift_right_logical(h, jnp.int32(log2_tr))
            g = jnp.take_along_axis(src_ref[:], off, axis=0)
            w = (
                (frac[0] if dx else 1.0 - frac[0])
                * (frac[1] if dy else 1.0 - frac[1])
                * (frac[2] if dz else 1.0 - frac[2])
            )
            hit = (q_h == fold_row).astype(jnp.float32) * valid_row
            acc = acc + g * (w * hit)
        out_ref[:] = acc

    return kernel


@functools.partial(
    jax.jit, static_argnames=("resolutions", "interpret")
)
def hash_vmem_lookup(
    src: jnp.ndarray,
    x: jnp.ndarray,
    *,
    resolutions: tuple,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused multi-level hash lookup with the table VMEM-resident.

    Args:
        src: ``(Tr, 128)`` folded table (:func:`fold_table`).
        x: ``(n, 3)`` positions in [0, 1]; ``n`` must be a multiple of
            ``Tr`` (pad and mask at the caller).
        resolutions: per-level grid resolutions (length L).
        interpret: Pallas interpret mode; default (None) auto-enables
            it off-TPU so CPU tests exercise the same call path.

    Returns:
        ``(n, 128)`` per-lane weighted corner sums; fold lanes of the
        same (level, feature) must be summed by the caller:
        ``out.reshape(n, L, F, Q).sum(-1)``.
    """
    t_res = src.shape[0]
    n = x.shape[0]
    l = len(resolutions)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if n % t_res:
        raise ValueError(
            f"samples ({n}) must be a multiple of the folded table "
            f"height ({t_res})"
        )
    # Infer F and Q from the 128-lane budget: caller packed via
    # fold_table, which uses F from the table; F=2 for all NGP fields.
    # The kernel only needs Q (fold count), recovered from geometry:
    feats = 2
    q = plan_lanes(l, feats)
    kernel = _make_kernel(t_res, q)
    consts = _lane_constants(tuple(resolutions), q, feats)
    return pl.pallas_call(
        kernel,
        grid=(n // t_res,),
        in_specs=[
            pl.BlockSpec(
                (t_res, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (t_res, 3), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (t_res, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
        interpret=interpret,
    )(src, x, consts)
