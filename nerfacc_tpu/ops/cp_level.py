"""Fused CP-level encoder — Pallas TPU kernel.

One CP level of :class:`~nerfacc_tpu.models.cp_field.CPGridEncoder` computes

    out[n, :] = (w_x @ L_x) * (w_y @ L_y) * (w_z @ L_z)   (elementwise prod)

where ``w_a = max(0, 1 - |u[n, a] * (R - 1) - i|)`` is the dense (N, R)
hat-interpolation matrix of axis ``a``.  Compiled with plain XLA this
materializes the (3, N, R) hat tensors in HBM twice per step (forward +
recompute for the line-gradient matmuls) plus six (N, rank) f32 product
cotangents — ~2 GB of pure bandwidth at the training budget (N = 2^18,
R = 512), which profiling shows is the single largest block of the train
step.  This kernel generates every hat tile in VMEM on both passes, so the
only HBM traffic is ``u``, the three line tables, ``out`` and the gradient
cotangent.

Backward (custom VJP):

    dL_a = w_a^T @ (g * prod_{b != a} (w_b @ L_b))    accumulated over blocks

``du`` is NOT computed: sample positions come from traversal and carry no
gradient path in any caller (the reference library has the same contract —
rendering is differentiable to the field outputs, not to t values,
reference volrend.py:38-39).

``interpret=True`` runs in the Pallas interpreter (CPU test suite).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 1024  # samples per kernel block


def _hat_block(u_col, R):
    """(BLK, 1) coords in [0, 1] -> (BLK, R) hat weights, bf16."""
    pos = u_col * (R - 1)
    # int32 iota + convert: Mosaic's tpu.iota only produces integer vectors
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (u_col.shape[0], R), 1
    ).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos - cols)).astype(jnp.bfloat16)


def _axis_feat(u_ref, line_ref, axis):
    R = line_ref.shape[0]
    w = _hat_block(u_ref[:, axis : axis + 1], R)
    return w, jnp.dot(
        w, line_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(u_ref, lx_ref, ly_ref, lz_ref, out_ref):
    _, ax = _axis_feat(u_ref, lx_ref, 0)
    _, ay = _axis_feat(u_ref, ly_ref, 1)
    _, az = _axis_feat(u_ref, lz_ref, 2)
    out_ref[:] = ax * ay * az


def _bwd_kernel(u_ref, g_ref, lx_ref, ly_ref, lz_ref, dlx_ref, dly_ref, dlz_ref):
    i = pl.program_id(0)
    wx, ax = _axis_feat(u_ref, lx_ref, 0)
    wy, ay = _axis_feat(u_ref, ly_ref, 1)
    wz, az = _axis_feat(u_ref, lz_ref, 2)
    g = g_ref[:]
    contribs = []
    for w, da in (
        (wx, g * ay * az),
        (wy, g * ax * az),
        (wz, g * ax * ay),
    ):
        contribs.append(
            jax.lax.dot_general(
                w, da.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )

    @pl.when(i == 0)
    def _():
        dlx_ref[:], dly_ref[:], dlz_ref[:] = contribs

    @pl.when(i > 0)
    def _():
        dlx_ref[:] = dlx_ref[:] + contribs[0]
        dly_ref[:] = dly_ref[:] + contribs[1]
        dlz_ref[:] = dlz_ref[:] + contribs[2]


def _pad_rows(x):
    pad = (-x.shape[0]) % BLK
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x, pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def cp_level_encode(u, lines, interpret=False):
    """One fused CP level.

    Args:
        u: (N, 3) coordinates in [0, 1] (no gradient path — see module doc).
        lines: (3, R, rank) per-axis line tables.

    Returns:
        (N, rank) f32 features: the CP product of the three axis interps.
    """
    return _fwd(u, lines, interpret)[0]


def _fwd(u, lines, interpret):
    n = u.shape[0]
    _, R, rank = lines.shape
    up, pad = _pad_rows(u)
    grid = (up.shape[0] // BLK,)
    line_spec = pl.BlockSpec((R, rank), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((up.shape[0], rank), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            line_spec, line_spec, line_spec,
        ],
        out_specs=pl.BlockSpec(
            (BLK, rank), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(up, lines[0], lines[1], lines[2])
    out = out[:n] if pad else out
    return out, (u, lines)


def _bwd(interpret, res, g):
    u, lines = res
    _, R, rank = lines.shape
    up, _ = _pad_rows(u)
    gp, _ = _pad_rows(g)
    grid = (up.shape[0] // BLK,)
    line_spec = pl.BlockSpec((R, rank), lambda i: (0, 0), memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((R, rank), lambda i: (0, 0), memory_space=pltpu.VMEM)
    acc_shape = jax.ShapeDtypeStruct((R, rank), jnp.float32)
    dlx, dly, dlz = pl.pallas_call(
        _bwd_kernel,
        out_shape=(acc_shape, acc_shape, acc_shape),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, rank), lambda i: (i, 0), memory_space=pltpu.VMEM),
            line_spec, line_spec, line_spec,
        ],
        out_specs=(acc_spec, acc_spec, acc_spec),
        interpret=interpret,
    )(up, gp, lines[0], lines[1], lines[2])
    du = jnp.zeros_like(u)  # no gradient path by contract (see module doc)
    return du, jnp.stack([dlx, dly, dlz])


cp_level_encode.defvjp(_fwd, _bwd)
