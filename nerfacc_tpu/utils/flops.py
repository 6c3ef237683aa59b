"""Analytic FLOP counts for the factorized radiance fields.

Used by ``bench.py`` to report MFU (model FLOPs utilization): achieved
TFLOP/s through the field's matmul chain divided by the chip's peak.  The
count is a deliberate LOWER bound of useful work — it includes only the
dense matmul FLOPs of the encoder and MLPs (the MXU work the design is
built around), not the traversal, compositing, optimizer, or elementwise
hat/product work (VPU); a backward pass is counted as 2x its forward
(each matmul contributes a dX and a dW matmul).

Reference scale for the v5e: ~197 bf16 TFLOP/s peak per chip.
"""
from __future__ import annotations


def _mlp_flops(dims) -> int:
    """Forward FLOPs/sample of a dense MLP with layer widths ``dims``."""
    return sum(2 * a * b for a, b in zip(dims[:-1], dims[1:]))


def cp_encoder_flops_per_sample(encoder) -> int:
    """Forward matmul FLOPs/sample of a :class:`CPGridEncoder`.

    Per line level: three (1, R) @ (R, rank) hat dots.  Per tri-plane
    level: three (1, R) @ (R, R*rank) dots plus the (R, rank) x (R, 1)
    v-contraction.
    """
    total = 0
    for R, rank in zip(encoder.resolutions, encoder.ranks):
        total += 3 * 2 * R * rank
    vm = getattr(encoder, "plane_mode", "product") == "vm"
    for R, rank in zip(
        getattr(encoder, "plane_resolutions", ()),
        getattr(encoder, "plane_ranks", ()),
    ):
        total += 3 * (2 * R * R * rank + 2 * R * rank)
        if vm:
            total += 3 * 2 * R * rank  # complementary-axis line dots
    return total


def cp_field_flops_per_sample(field, backward: bool = True) -> int:
    """Matmul FLOPs/sample of a full :class:`CPRadianceField` evaluation
    (encoder + base MLP + view head).  ``backward=True`` adds 2x for the
    gradient pass."""
    enc = cp_encoder_flops_per_sample(field.encoder)
    base = _mlp_flops(
        [field.encoder.output_dim, field.hidden_dim, 1 + field.geo_feat_dim]
    )
    head_in = (16 if field.use_viewdirs else 0) + field.geo_feat_dim
    head = _mlp_flops([head_in, field.hidden_dim, field.hidden_dim, 3])
    fwd = enc + base + head
    return fwd * (3 if backward else 1)


def cp_density_flops_per_sample(field, backward: bool = False) -> int:
    """Matmul FLOPs/sample of a :class:`CPDensityField` density query
    (used for occupancy refreshes and proposal levels)."""
    enc = cp_encoder_flops_per_sample(field.encoder)
    base = _mlp_flops([field.encoder.output_dim, field.hidden_dim, 1])
    fwd = enc + base
    return fwd * (3 if backward else 1)


def cp_density_query_flops_per_sample(field) -> int:
    """Forward density-only query of a full radiance field (encoder +
    base MLP; no view head) — the occupancy-update evaluation."""
    enc = cp_encoder_flops_per_sample(field.encoder)
    base = _mlp_flops(
        [field.encoder.output_dim, field.hidden_dim, 1 + field.geo_feat_dim]
    )
    return enc + base
