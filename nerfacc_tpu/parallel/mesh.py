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
from typing import Dict, Tuple

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

    Per device: run the trainer's loss/render pipeline on the local ray
    shard, ``pmean`` the gradients, then apply identical optimizer and
    occupancy-grid updates on every device (replicated state stays bitwise
    identical because the PRNG keys are replicated).

    Returns a function ``(state, batch) -> (state, aux)`` where ``batch``
    leaves are globally-shaped with the ray axis sharded (see
    :func:`shard_batch`); aux totals are summed over the mesh.
    """
    from ..estimators.occ_grid import sampling_padded, update_occ_grid
    from ..trainers.ngp_occ import TrainState, smooth_l1_loss
    from ..utils.rendering import compact_samples, render_rays_with_occgrid
    import optax

    n_dev = mesh.devices.size

    def per_device_step(state: TrainState, batch: Dict) -> Tuple:
        key, k_occ, k_strat = jax.random.split(state.key, 3)
        params = state.params

        def occ_eval_fn(x):
            return trainer.field.query_density(params, x)[..., 0] * (
                trainer.render_step_size
            )

        occ_state = jax.lax.cond(
            state.step % trainer.update_interval == 0,
            lambda s: update_occ_grid(
                s,
                k_occ,
                state.step,
                occ_eval_fn,
                occ_thre=trainer.occ_thre,
                ema_decay=trainer.ema_decay,
                warmup_steps=trainer.warmup_steps,
            ),
            lambda s: s,
            state.occ_state,
        )

        # Local ray shard -> local traversal, compaction and budget.
        local_budget = max(trainer.sample_budget // n_dev, 1)
        res = sampling_padded(
            occ_state,
            batch["rays_o"],
            batch["rays_d"],
            near_plane=trainer.near_plane,
            far_plane=trainer.far_plane,
            render_step_size=trainer.render_step_size,
            alpha_thre=trainer.alpha_thre,
            early_stop_eps=trainer.early_stop_eps,
            stratified=True,
            cone_angle=trainer.cone_angle,
            key=jax.random.fold_in(k_strat, jax.lax.axis_index(axis_name)),
            max_samples=trainer.max_samples_per_ray,
        )
        samples = compact_samples(res, local_budget)

        def loss_fn(params):
            def rgb_sigma_fn(positions, dirs, ray_indices):
                rgb, density = trainer.field(params, positions, dirs)
                return rgb, density[..., 0]

            colors, _, _, _ = render_rays_with_occgrid(
                rgb_sigma_fn,
                batch["rays_o"],
                batch["rays_d"],
                samples,
                render_bkgd=batch["color_bkgd"],
            )
            loss = smooth_l1_loss(colors, batch["rgb"])
            mse = jnp.mean((colors - batch["rgb"]) ** 2)
            return loss, mse

        (loss, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # All-reduce over the ray-sharded mesh axis (ICI collective).
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
        mse = jax.lax.pmean(mse, axis_name)

        updates, opt_state = trainer.optimizer.update(
            grads, state.opt_state, params
        )
        params = optax.apply_updates(params, updates)

        new_state = TrainState(params, opt_state, occ_state, key, state.step + 1)
        aux = {
            "loss": loss,
            "mse": mse,
            "n_rendering_samples": jax.lax.psum(samples.num_valid, axis_name),
            "n_total_samples": jax.lax.psum(
                samples.num_valid + samples.overflow, axis_name
            ),
        }
        return new_state, aux

    from jax.experimental.shard_map import shard_map

    batch_specs = {
        "rays_o": P(axis_name),
        "rays_d": P(axis_name),
        "rgb": P(axis_name),
        "color_bkgd": P(),
    }
    sharded = shard_map(
        per_device_step,
        mesh=mesh,
        in_specs=(P(), batch_specs),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))
