"""Fused hat-interpolation matmul — Pallas TPU kernel.

The CP-factorized encoder interpolates N sample coordinates from a 1-D line
table ``(R, rank)`` by building a dense hat-function weight matrix
``W (N, R)`` (two nonzeros per row) and multiplying on the MXU.  In plain
XLA the weight matrix materializes in HBM (~350 MB per forward at the
training budget); this kernel generates each ``W`` tile in registers and
feeds the MXU directly, so the only HBM traffic is ``x``, the line table,
and the output.

Forward:  out[n, :] = sum_i max(0, 1 - |x[n]*(R-1) - i|) * line[i, :]
Backward: dline = W^T g   (accumulated across sample blocks)
          dx[n] = (dW/dpos_n · (g[n] line^T)) * (R - 1)

All refs are kept 2-D (TPU vector tiling).  ``interpret=True`` runs the
kernels in the Pallas interpreter (used by the CPU test suite).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 512  # samples per kernel block


def _cols(R):
    return jax.lax.broadcasted_iota(jnp.int32, (BLK, R), 1).astype(jnp.float32)


def _weights(x_col, R):
    pos = x_col * (R - 1)  # (BLK, 1)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos - _cols(R)))


def _fwd_kernel(x_ref, line_ref, out_ref):
    R = line_ref.shape[0]
    w = _weights(x_ref[:], R)
    out_ref[:] = jnp.dot(
        w.astype(jnp.bfloat16),
        line_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _bwd_line_kernel(x_ref, g_ref, dline_ref):
    R = dline_ref.shape[0]
    i = pl.program_id(0)
    w = _weights(x_ref[:], R)
    contrib = jnp.dot(
        w.astype(jnp.bfloat16).T,
        g_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == 0)
    def _():
        dline_ref[:] = contrib

    @pl.when(i > 0)
    def _():
        dline_ref[:] = dline_ref[:] + contrib


def _bwd_x_kernel(x_ref, g_ref, line_ref, dx_ref):
    R = line_ref.shape[0]
    pos = x_ref[:] * (R - 1)  # (BLK, 1)
    delta = pos - _cols(R)
    dw = jnp.where(jnp.abs(delta) < 1.0, -jnp.sign(delta), 0.0)
    s = jnp.dot(
        g_ref[:].astype(jnp.bfloat16),
        line_ref[:].astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    )  # (BLK, R) = g @ line^T
    dx_ref[:] = jnp.sum(dw * s, axis=1, keepdims=True) * (R - 1)


def _pad(x, n):
    pad = (-x.shape[0]) % n
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x, pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hat_interp_matmul(x, line, interpret=False):
    """``(N,) coords in [0,1] x (R, rank) line -> (N, rank) features``."""
    return _fwd(x, line, interpret)[0]


def _fwd(x, line, interpret):
    n = x.shape[0]
    R, rank = line.shape
    xp, pad = _pad(x.reshape(-1, 1), BLK)
    grid = (xp.shape[0] // BLK,)
    out = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], rank), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, rank), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BLK, rank), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xp, line)
    out = out[:n] if pad else out
    return out, (x, line)


def _bwd(interpret, res, g):
    x, line = res
    n = x.shape[0]
    R, rank = line.shape
    xp, pad = _pad(x.reshape(-1, 1), BLK)
    gp, _ = _pad(g, BLK)
    grid = (xp.shape[0] // BLK,)

    dline = pl.pallas_call(
        _bwd_line_kernel,
        out_shape=jax.ShapeDtypeStruct((R, rank), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, rank), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (R, rank), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xp, gp)

    dx = pl.pallas_call(
        _bwd_x_kernel,
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], 1), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, rank), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, rank), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xp, gp, line)
    dx = dx[:, 0]
    dx = dx[:n] if pad else dx
    return dx, dline


hat_interp_matmul.defvjp(_fwd, _bwd)
