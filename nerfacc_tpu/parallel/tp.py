"""Tensor parallelism for the CP field over a 2-D (data, model) TPU mesh.

The reference has no distributed layer at all (SURVEY.md §2.12); ray-axis
data parallelism (``mesh.py``) is the natural first axis for this workload.
This module adds the second one: **megatron-style tensor parallelism of the
field itself**, for scaling the *model* (line-table capacity / MLP width)
past one chip's HBM and compute:

* each level's CP line table ``(3, R, rank)`` is sharded over its rank dim —
  every shard evaluates the hat/one-hot dots for its rank slice only;
* the 3-axis CP products and level concat stay local (elementwise over rank);
* the first base-MLP layer's weight ``(sum_ranks, hidden)`` is row-sharded to
  match the local feature slice; the partial products are ``psum``-ed over
  the model axis (one small (N, hidden) all-reduce riding the ICI — the only
  model-axis communication in the whole step, forward AND backward, since the
  psum's transpose is the identity; see
  :func:`~nerfacc_tpu.models.cp_field.tp_allreduce`);
* everything downstream (later MLP layers, head MLP, compositing, optimizer)
  runs replicated over the model axis; traversal/compaction stay local to the
  ray shard exactly as in the DP step.

The per-device program is still the trainer's own ``_step_body`` — TP
composes with DP on the same mesh, and the update equals the single-chip
update on the same global batch (up to float reassociation); the tests
assert that equivalence through a real optimizer step.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import tree_map_with_path


def make_mesh_2d(
    n_data: int,
    n_model: int,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    """A ``(n_data, n_model)`` device mesh; the model axis is innermost so
    the per-layer all-reduce rides the fastest ICI links."""
    devs = np.asarray(jax.devices()[: n_data * n_model]).reshape(
        n_data, n_model
    )
    return Mesh(devs, (data_axis, model_axis))


def tp_w1_permutation(ranks, n_model: int) -> np.ndarray:
    """Row permutation aligning the first MLP weight with TP feature layout.

    Globally, the encoder feature vector is ``[lvl0 ranks | lvl1 ranks | ...]``.
    Under TP each shard holds a contiguous rank slice *per level*, so its
    local feature vector is ``[lvl0 slice_d | lvl1 slice_d | ...]`` — which is
    NOT a contiguous slice of the global layout.  Contiguous-dim sharding of
    the weight therefore needs its rows pre-permuted into shard-major order:
    ``perm[i]`` gives the original row feeding permuted row ``i``.
    """
    offs = np.cumsum([0] + list(ranks))
    chunks = []
    for d in range(n_model):
        for lvl, r in enumerate(ranks):
            assert r % n_model == 0, (
                f"level rank {r} must divide over {n_model} model shards"
            )
            lo = offs[lvl] + d * (r // n_model)
            chunks.append(np.arange(lo, lo + r // n_model))
    return np.concatenate(chunks)


def make_tp_field(field, model_axis: str = "model"):
    """The same CP field with tensor-parallel semantics enabled."""
    return dataclasses.replace(field, tp_axis=model_axis)


def permute_w1(params: Dict, perm: np.ndarray) -> Dict:
    """Permute the first base-MLP weight's rows into TP shard-major order."""
    params = dict(params)
    mlp = list(params["mlp_base"])
    mlp[0] = jnp.asarray(mlp[0])[jnp.asarray(perm)]
    params["mlp_base"] = mlp
    return params


def _path_keys(path) -> list:
    out = []
    for p in path:
        for attr in ("key", "idx", "name"):
            v = getattr(p, attr, None)
            if v is not None:
                out.append(v)
                break
    return out


def make_state_specs(
    state, data_axis: str, model_axis: str
):
    """PartitionSpec tree for a ``TrainState`` under TP.

    Sharded leaves: every ``lines`` table (rank dim) and the first
    ``mlp_base`` weight (rows) — *including their optimizer-state mirrors*
    (adam's mu/nu are param-shaped pytrees whose tree paths repeat the param
    paths, so the same path rules hit them).  Everything else is replicated.
    """

    def spec(path, leaf):
        keys = _path_keys(path)
        if not hasattr(leaf, "ndim"):
            return P()
        if "lines" in keys and leaf.ndim == 3:
            return P(None, None, model_axis)
        if "mlp_base" in keys and leaf.ndim == 2:
            i = keys.index("mlp_base")
            if i + 1 < len(keys) and keys[i + 1] == 0:
                return P(model_axis, None)
        return P()

    return tree_map_with_path(spec, state)


def make_tp_train_step(
    trainer,
    mesh: Mesh,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """Build the fused DP+TP train step from an ``NGPOccTrainer``.

    The trainer must have been constructed with a TP-enabled field
    (:func:`make_tp_field`) and its initial state passed through
    :func:`permute_w1` with :func:`tp_w1_permutation`.

    Returns ``(step_fn, shard_state, shard_batch)`` where ``shard_state`` /
    ``shard_batch`` device-put their argument with the right shardings.
    """
    try:  # jax >= 0.8
        from jax import shard_map as _shard_map

        def shard_map(f, mesh, in_specs, out_specs):
            return _shard_map(
                f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as _sm

        def shard_map(f, mesh, in_specs, out_specs):
            return _sm(
                f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_rep=False,
            )

    body = functools.partial(trainer._step_body, axis_name=data_axis)
    cache: Dict[Tuple, Any] = {}

    def shard_state(state):
        specs = make_state_specs(state, data_axis, model_axis)
        return jax.device_put(
            state,
            jax.tree.map(
                lambda s: NamedSharding(mesh, s), specs,
                is_leaf=lambda x: isinstance(x, P),
            ),
        )

    def shard_batch(batch):
        out = {}
        for k, v in batch.items():
            v = jnp.asarray(v)
            spec = P(data_axis) if v.ndim >= 1 and k != "color_bkgd" else P()
            out[k] = jax.device_put(v, NamedSharding(mesh, spec))
        return out

    def step(state, batch):
        keys = tuple(sorted(batch.keys()))
        if keys not in cache:
            state_specs = make_state_specs(state, data_axis, model_axis)
            batch_specs = {
                k: P() if k == "color_bkgd" else P(data_axis) for k in keys
            }
            aux_specs = P()
            sharded = shard_map(
                body,
                mesh=mesh,
                in_specs=(state_specs, batch_specs),
                out_specs=(state_specs, aux_specs),
            )
            cache[keys] = jax.jit(sharded, donate_argnums=(0,))
        return cache[keys](state, batch)

    return step, shard_state, shard_batch
