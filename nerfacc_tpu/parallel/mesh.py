"""Data-parallel scaling over a TPU mesh.

The reference is single-GPU with no distributed layer at all
(SURVEY.md §2.12: no torch.distributed/NCCL anywhere).  The idiomatic TPU
scaling for this workload is ray-batch data parallelism over the ICI mesh:

* the ray axis of every batch is sharded across devices;
* model params, optimizer state, and the occupancy grid are replicated;
* gradients are ``pmean``-ed across the mesh (XLA lowers this to an
  all-reduce riding the ICI);
* sample compaction, segmented scans, and traversal all stay *local* to a
  device's ray shard — nothing in the sampling pipeline crosses devices
  (samples never need to, since every op is per-ray).

Implemented with ``shard_map`` so the per-device program is exactly the
single-chip fused step on its shard.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """A 1-D device mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_batch(batch: Dict, mesh: Mesh, axis_name: str = "data") -> Dict:
    """Device-put a ray batch with the ray axis sharded over the mesh."""
    out = {}
    for k, v in batch.items():
        v = jnp.asarray(v)
        spec = P(axis_name) if v.ndim >= 1 and k != "color_bkgd" else P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def make_dp_train_step(trainer, mesh: Mesh, axis_name: str = "data"):
    """Build a data-parallel fused train step from an NGPOccTrainer.

    The per-device program is **exactly** the trainer's single-chip fused
    step (``NGPOccTrainer._step_body``) run on the local ray shard with
    ``axis_name`` set: windowed traversal, budget/window truncation masking,
    time-dependent fields and the distortion loss all work multi-chip with
    identical semantics.  The body normalizes its loss by the global
    completed-ray count and psums gradients, so the DP update equals the
    single-chip update on the same global batch (up to float reassociation).

    Replicated state (params, optimizer, occupancy grid, PRNG key) stays
    bitwise identical across devices: the occupancy update uses the
    replicated key, and every device applies the same psum-ed gradients.

    Note: the trainer's ``sample_budget`` / batch-controller quantities apply
    *per device* here — the global sample budget is ``n_devices *
    trainer.sample_budget``, matching how rays are split.

    Returns a function ``(state, batch) -> (state, aux)`` where ``batch``
    leaves are globally-shaped with the ray axis sharded (see
    :func:`shard_batch`); aux totals are summed over the mesh.
    """
    try:  # jax >= 0.8 promotes shard_map out of experimental
        from jax import shard_map as _shard_map

        def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
            return _shard_map(
                f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=check_rep,
            )
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    body = functools.partial(trainer._step_body, axis_name=axis_name)
    cache: Dict[Tuple[str, ...], Any] = {}

    def step(state, batch):
        keys = tuple(sorted(batch.keys()))
        if keys not in cache:
            specs = {
                k: P() if k == "color_bkgd" else P(axis_name) for k in keys
            }
            sharded = shard_map(
                body,
                mesh=mesh,
                in_specs=(P(), specs),
                out_specs=(P(), P()),
                check_rep=False,
            )
            cache[keys] = jax.jit(sharded, donate_argnums=(0,))
        return cache[keys](state, batch)

    return step


def make_dp_prop_step(trainer, mesh: Mesh, axis_name: str = "data"):
    """Data-parallel fused train step for an ``NGPPropTrainer``.

    Same structure as :func:`make_dp_train_step`: the per-device program is
    the trainer's own ``_train_step_impl`` on the local ray shard.  Every
    loss term is a mean over the (equal-sized) ray shards, so ``pmean`` of
    the per-shard gradients is exactly the gradient of the global-batch
    loss; params/optimizer state stay replicated.

    Returns ``step(state, batch, requires_grad)`` — batch leaves globally
    shaped with the ray axis sharded (:func:`shard_batch`).
    """
    try:  # jax >= 0.8
        from jax import shard_map as _shard_map

        def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
            return _shard_map(
                f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=check_rep,
            )
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    cache: Dict[Tuple, Any] = {}

    def step(state, batch, requires_grad: bool = False):
        keys = (tuple(sorted(batch.keys())), bool(requires_grad))
        if keys not in cache:
            body = functools.partial(
                trainer._train_step_impl,
                requires_grad=bool(requires_grad),
                axis_name=axis_name,
            )
            specs = {
                k: P() if k == "color_bkgd" else P(axis_name)
                for k in batch.keys()
            }
            sharded = shard_map(
                body,
                mesh=mesh,
                in_specs=(P(), specs),
                out_specs=(P(), P()),
                check_rep=False,
            )
            cache[keys] = jax.jit(sharded, donate_argnums=(0,))
        return cache[keys](state, batch)

    return step
