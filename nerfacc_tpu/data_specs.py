"""Ray-segment data containers as JAX pytrees.

TPU-native analog of the reference's ``RaySamples`` / ``RayIntervals``
(reference: nerfacc/data_specs.py:12-181).  Two layouts are supported:

* **flattened**: ``vals`` has shape ``(all_samples,)`` with ``packed_info``
  ``(n_rays, 2) = [chunk_start, chunk_cnt]`` and/or ``ray_indices``.
* **batched**:  ``vals`` has shape ``(n_rays, n_samples)`` (no aux fields).

On TPU the batched/padded layout is the primary (static-shape) fast path;
flattened adapters are provided for API fidelity with the reference.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RaySamples:
    """Samples along rays (reference: nerfacc/data_specs.py:12-76).

    Attributes:
        vals: (all_samples,) or (n_rays, n_samples).
        packed_info: optional (n_rays, 2) int32 [start, cnt] per ray chunk.
        ray_indices: optional (all_samples,) int32 ray id per sample.
        is_valid: optional bool mask, same shape as ``vals``.
    """

    vals: jnp.ndarray
    packed_info: Optional[jnp.ndarray] = None
    ray_indices: Optional[jnp.ndarray] = None
    is_valid: Optional[jnp.ndarray] = None

    def tree_flatten(self):
        return (
            (self.vals, self.packed_info, self.ray_indices, self.is_valid),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RayIntervals:
    """Interval edges along rays (reference: nerfacc/data_specs.py:79-181).

    Attributes:
        vals: (all_edges,) or (n_rays, n_edges).
        packed_info: optional (n_rays, 2) int32 [start, cnt] per ray chunk.
        ray_indices: optional (all_edges,) int32 ray id per edge.
        is_left: optional bool mask; edge is the left side of an interval.
        is_right: optional bool mask; edge is the right side of an interval.
    """

    vals: jnp.ndarray
    packed_info: Optional[jnp.ndarray] = None
    ray_indices: Optional[jnp.ndarray] = None
    is_left: Optional[jnp.ndarray] = None
    is_right: Optional[jnp.ndarray] = None

    def tree_flatten(self):
        return (
            (
                self.vals,
                self.packed_info,
                self.ray_indices,
                self.is_left,
                self.is_right,
            ),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)
