"""Fused NGP + proposal-network trainer.

TPU-native analog of the reference proposal-network training harness
(reference: examples/train_ngp_nerf_prop.py:61-249 +
examples/utils.py:170-264).  One jitted step: hierarchical proposal
sampling (batched importance sampling — static shapes by construction),
radiance-field rendering of the final samples, smooth-L1 reconstruction
loss, plus the interlevel PDF-matching loss for the proposal networks —
main-field and proposal gradients flow in a single backward (the reference
uses a separate optimizer + manual backward; here optax partitions handle
the two parameter groups in one update).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..estimators.prop_net import propnet_loss, propnet_sampling
from ..volrend import rendering
from .ngp_occ import make_lr_schedule, smooth_l1_loss


class PropTrainState(NamedTuple):
    params: Any          # {"field": ..., "props": [...]}
    opt_state: Any
    key: jax.Array
    step: jnp.ndarray


@dataclasses.dataclass
class NGPPropTrainer:
    """Instant-NGP + PropNet trainer (reference config:
    train_ngp_nerf_prop.py:61-127).

    Args:
        field: radiance field (init/__call__/query_density protocol).
        prop_fields: proposal density fields, coarse-to-fine.
        prop_samples: samples per proposal level (e.g. [128] or [256, 96]).
        num_samples: final samples per ray (e.g. 64 or 48).
        sampling_type: "uniform" (bounded) or "lindisp" (unbounded).
        opaque_bkgd: force the last sample opaque (reference
            utils.py:205-217, used for unbounded scenes).
        prop_loss_scaler: interlevel-loss scale (reference: 1024).
    """

    field: Any
    prop_fields: Sequence[Any]
    prop_samples: Sequence[int] = (128,)
    num_samples: int = 64
    near_plane: float = 2.0
    far_plane: float = 6.0
    sampling_type: str = "uniform"
    opaque_bkgd: bool = False
    prop_loss_scaler: float = 1024.0
    max_steps: int = 20000
    lr: float = 1e-2
    weight_decay: float = 0.0
    seed: int = 42
    stratified: bool = True

    def __post_init__(self):
        assert len(self.prop_fields) == len(self.prop_samples)
        self.schedule = make_lr_schedule(self.max_steps, self.lr)
        self.optimizer = optax.chain(
            optax.add_decayed_weights(self.weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-15),
            optax.scale_by_learning_rate(self.schedule),
        )
        self._train_step = jax.jit(
            self._train_step_impl,
            donate_argnums=(0,),
            static_argnames=("requires_grad",),
        )
        self._train_steps = jax.jit(
            self._train_steps_impl, donate_argnums=(0,)
        )
        self._train_steps_sampled = jax.jit(
            self._train_steps_sampled_impl,
            donate_argnums=(0,),
            static_argnames=("sampler",),
        )
        self._render_chunk = jax.jit(self._render_chunk_impl)
        self._render_chunks_scan = jax.jit(self._render_chunks_scan_impl)

    def init_state(self) -> PropTrainState:
        key = jax.random.PRNGKey(self.seed)
        keys = jax.random.split(key, len(self.prop_fields) + 2)
        params = {
            "field": self.field.init(keys[0]),
            "props": [
                p.init(k) for p, k in zip(self.prop_fields, keys[1:-1])
            ],
        }
        opt_state = self.optimizer.init(params)
        return PropTrainState(
            params, opt_state, keys[-1], jnp.zeros((), jnp.int32)
        )

    def _sample_and_render(
        self, params, rays_o, rays_d, render_bkgd, key, requires_grad: bool
    ):
        n_rays = rays_o.shape[0]
        prop_sigma_fns = [
            self._prop_sigma_fn(pf, pp, rays_o, rays_d)
            for pf, pp in zip(self.prop_fields, params["props"])
        ]
        t_starts, t_ends, cache = propnet_sampling(
            prop_sigma_fns,
            list(self.prop_samples),
            self.num_samples,
            n_rays,
            self.near_plane,
            self.far_plane,
            self.sampling_type,
            stratified=key is not None and self.stratified,
            requires_grad=requires_grad,
            key=key,
        )

        def rgb_sigma_fn(t0, t1, _):
            t_mid = 0.5 * (t0 + t1)
            pos = rays_o[:, None, :] + t_mid[..., None] * rays_d[:, None, :]
            dirs = jnp.broadcast_to(rays_d[:, None, :], pos.shape)
            rgb, density = self.field(
                params["field"], pos.reshape(-1, 3), dirs.reshape(-1, 3)
            )
            sigmas = density.reshape(t0.shape)
            if self.opaque_bkgd:
                sigmas = sigmas.at[..., -1].set(jnp.inf)
            return rgb.reshape(t0.shape + (3,)), sigmas

        colors, opacities, depths, extras = rendering(
            t_starts,
            t_ends,
            rgb_sigma_fn=rgb_sigma_fn,
            render_bkgd=render_bkgd,
        )
        return colors, opacities, depths, extras, cache

    def _prop_sigma_fn(self, prop_field, prop_params, rays_o, rays_d):
        def fn(t0, t1):
            t_mid = 0.5 * (t0 + t1)
            pos = rays_o[:, None, :] + t_mid[..., None] * rays_d[:, None, :]
            density = prop_field(prop_params, pos.reshape(-1, 3))
            return density.reshape(t0.shape)

        return fn

    def _train_step_impl(
        self,
        state: PropTrainState,
        batch: Dict,
        requires_grad: bool,
        axis_name=None,
    ):
        """One fused step.  With ``axis_name`` set this same body runs
        per-device inside a ``shard_map`` over a ray-sharded mesh (see
        ``parallel.mesh.make_dp_prop_step``): sampling and field eval stay
        local to the shard, and — because every loss term is a mean over
        equal-sized ray shards — ``pmean`` of the per-shard gradients equals
        the gradient of the global-batch loss."""
        key, k_strat = jax.random.split(state.key)
        if axis_name is not None:
            # decorrelate per-shard stratified jitter; the replicated `key`
            # carried in the state stays identical across devices
            k_strat = jax.random.fold_in(
                k_strat, jax.lax.axis_index(axis_name)
            )
        _pmean = (
            (lambda x: jax.lax.pmean(x, axis_name))
            if axis_name
            else (lambda x: x)
        )
        rays_o = batch["rays_o"]
        rays_d = batch["rays_d"]
        pixels = batch["rgb"]
        render_bkgd = batch["color_bkgd"]

        def loss_fn(params):
            colors, _, _, extras, cache = self._sample_and_render(
                params, rays_o, rays_d, render_bkgd, k_strat, requires_grad
            )
            loss = smooth_l1_loss(colors, pixels)
            mse = jnp.mean((colors - pixels) ** 2)
            p_loss = (
                propnet_loss(cache, extras["trans"], self.prop_loss_scaler)
                if requires_grad
                else jnp.zeros((), jnp.float32)
            )
            return loss + p_loss, (mse, p_loss)

        (loss, (mse, p_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads = _pmean(grads)
        loss = _pmean(loss)
        mse = _pmean(mse)
        p_loss = _pmean(p_loss)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = PropTrainState(params, opt_state, key, state.step + 1)
        return new_state, {"loss": loss, "mse": mse, "prop_loss": p_loss}

    def train_step(self, state, batch, requires_grad: bool = False):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        return self._train_step(state, batch, requires_grad=requires_grad)

    def _train_steps_impl(self, state, batches: Dict, requires_grads):
        """Several steps in one ``lax.scan`` (amortizes the ~10 ms tunnel
        dispatch; the occ trainer does the same).  ``requires_grads`` is a
        per-step bool array — the proposal-gradient schedule
        (reference prop_net.py:196-212) becomes a ``lax.cond`` between the
        two step graphs, so the fused program serves any schedule."""

        def body(st, xs):
            b, rg = xs
            return jax.lax.cond(
                rg,
                lambda s, bb: self._train_step_impl(s, bb, True),
                lambda s, bb: self._train_step_impl(s, bb, False),
                st,
                b,
            )

        return jax.lax.scan(body, state, (batches, requires_grads))

    def train_steps(self, state, batches: Dict, requires_grads):
        """Run ``len(requires_grads)`` steps fused into one dispatch.

        Batch leaves must be stacked along a leading steps axis.
        """
        batches = {k: jnp.asarray(v) for k, v in batches.items()}
        return self._train_steps(
            state, batches, jnp.asarray(requires_grads, bool)
        )

    def _train_steps_sampled_impl(self, state, arrays, rgs, *, sampler):
        """``_train_steps_impl`` with the batches drawn ON DEVICE each step
        (``data.device_sampler.DeviceRaySampler``).  Removes the host from
        the steady-state loop entirely: profiling showed the fused device
        step at ~8 ms while host-side numpy batch assembly held the loop at
        ~13.5 ms/step (PERF.md "Proposal-network path")."""

        def body(st, rg):
            # a per-step batch key independent of the strat-key split chain
            kb = jax.random.fold_in(st.key, 0x5A)
            batch = sampler.sample(arrays, kb)
            return jax.lax.cond(
                rg,
                lambda s, bb: self._train_step_impl(s, bb, True),
                lambda s, bb: self._train_step_impl(s, bb, False),
                st,
                batch,
            )

        return jax.lax.scan(body, state, rgs)

    def train_steps_sampled(self, state, sampler, requires_grads):
        """Run ``len(requires_grads)`` steps in one dispatch with device-side
        ray sampling — zero per-step H2D (reference draws batches on-GPU the
        same way: examples/datasets/nerf_synthetic.py:104-160)."""
        return self._train_steps_sampled(
            state,
            sampler.arrays,
            jnp.asarray(requires_grads, bool),
            sampler=sampler,
        )

    # -- evaluation --------------------------------------------------------
    def _render_chunk_impl(self, params, rays_o, rays_d, bkgd):
        colors, opacities, depths, _, _ = self._sample_and_render(
            params, rays_o, rays_d, bkgd, key=None, requires_grad=False
        )
        return colors, opacities, depths

    def _render_chunks_scan_impl(self, params, rays_o, rays_d, bkgd):
        """Whole image in ONE dispatch: ``lax.scan`` over (n_chunks, chunk)
        ray blocks.  Per-call dispatch overhead on the tunnel is ~28 ms; a
        320^2 frame at chunk=8192 would otherwise pay it 13 times (the occ
        trainer's pooled eval renderer made the same move)."""

        def body(_, od):
            o, d = od
            c, op, dep = self._render_chunk_impl(params, o, d, bkgd)
            return None, (c, op, dep)

        _, outs = jax.lax.scan(body, None, (rays_o, rays_d))
        return outs

    def render_image(self, state, data: Dict, chunk: int = 8192) -> np.ndarray:
        rays_o = np.asarray(data["rays_o"])
        rays_d = np.asarray(data["rays_d"])
        bkgd = jnp.asarray(data["color_bkgd"])
        n = rays_o.shape[0]
        n_chunks = max(1, -(-n // chunk))
        pad = n_chunks * chunk - n
        if pad:
            rays_o = np.pad(rays_o, ((0, pad), (0, 0)), constant_values=1e8)
            rays_d = np.pad(rays_d, ((0, pad), (0, 0)), constant_values=1.0)
        o = jnp.asarray(rays_o).reshape(n_chunks, chunk, 3)
        d = jnp.asarray(rays_d).reshape(n_chunks, chunk, 3)
        colors, _, _ = self._render_chunks_scan(state.params, o, d, bkgd)
        return np.asarray(colors).reshape(n_chunks * chunk, 3)[:n]

    def eval_metrics(self, state, dataset, max_images=None) -> dict:
        """Mean PSNR and SSIM (the reference reports PSNR + LPIPS; SSIM
        fills the second-metric role offline — see utils/metrics.py)."""
        from ..utils import metrics as M

        psnrs, ssims = [], []
        n = len(dataset) if max_images is None else min(len(dataset), max_images)
        h, w = dataset.HEIGHT, dataset.WIDTH
        for i in range(n):
            data = dataset[i]
            rgb = self.render_image(state, data)
            ref = np.asarray(data["rgb"])
            psnrs.append(M.psnr(rgb, ref))
            ssims.append(M.ssim(rgb.reshape(h, w, 3), ref.reshape(h, w, 3)))
        return {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims))}

    def eval_psnr(self, state, dataset, max_images=None) -> float:
        return self.eval_metrics(state, dataset, max_images)["psnr"]
