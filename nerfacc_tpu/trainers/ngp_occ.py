"""Fused single-step NGP + occupancy-grid trainer.

TPU-native analog of the reference training harness
(reference: examples/train_ngp_nerf_occ.py:28-214 + examples/utils.py:54-167),
re-architected around one jitted train step: occupancy-grid EMA update,
stratified grid traversal, sample compaction, radiance-field evaluation,
differentiable compositing, smooth-L1 loss, and the Adam update all compile
into a single XLA program — zero host round-trips per step except the
dynamic ray-batch controller (which quantizes to buckets to bound
recompiles).
"""
from __future__ import annotations

import collections
import dataclasses
import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..estimators.occ_grid import (
    OccGridState,
    init_occ_grid,
    sampling_padded,
    sampling_pooled,
    update_occ_grid,
)
from ..utils.rendering import (
    compact_samples,
    compact_samples_from_windows,
    render_rays_with_occgrid,
)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    occ_state: OccGridState
    key: jax.Array
    step: jnp.ndarray


def make_lr_schedule(max_steps: int, base_lr: float = 1e-2, warmup: int = 100):
    """LinearLR warmup (0.01x over ``warmup`` steps; 0 disables) chained with
    MultiStep 0.33 decay at 1/2, 3/4, 9/10 (reference:
    train_ngp_nerf_occ.py:128-143; the MLP trainers use no warmup,
    train_mlp_nerf.py:98-107)."""
    warmup = (
        optax.linear_schedule(base_lr * 0.01, base_lr, warmup)
        if warmup > 0
        else optax.constant_schedule(base_lr)
    )
    boundaries = {
        max_steps // 2: 0.33,
        max_steps * 3 // 4: 0.33,
        max_steps * 9 // 10: 0.33,
    }
    return optax.join_schedules(
        [warmup]
        + [
            optax.constant_schedule(
                base_lr * 0.33 ** (i + 1)
            )
            for i in range(len(boundaries))
        ],
        list(boundaries.keys()),
    )


def smooth_l1_loss(pred, target):
    """torch.nn.functional.smooth_l1_loss with beta=1 (mean reduction)."""
    diff = jnp.abs(pred - target)
    return jnp.mean(jnp.where(diff < 1.0, 0.5 * diff**2, diff - 0.5))


@dataclasses.dataclass
class NGPOccTrainer:
    """Instant-NGP + OccGrid trainer (reference config:
    train_ngp_nerf_occ.py:55-78 for nerf_synthetic).

    Args:
        field: radiance field with ``init(key)``, ``__call__(params, pos,
            dirs)`` and ``query_density(params, x)``.
        aabb: scene roi.
        max_steps: schedule length.
        occ_* / render_*: estimator and marching parameters.
        sample_budget: static per-step sample-buffer size (the reference's
            ``target_sample_batch_size``).
        max_samples_per_ray: candidate lattice length.
    """

    field: Any
    aabb: Any
    max_steps: int = 20000
    grid_resolution: int = 128
    grid_nlvl: int = 1
    render_step_size: float = 5e-3
    near_plane: float = 0.0
    far_plane: float = 1e10
    cone_angle: float = 0.0
    alpha_thre: float = 0.0
    early_stop_eps: float = 1e-4
    occ_thre: float = 1e-2
    ema_decay: float = 0.95
    warmup_steps: int = 256
    update_interval: int = 16
    weight_decay: float = 1e-6
    lr: float = 1e-2
    sample_budget: int = 2**18
    max_samples_per_ray: int = 1024
    # traversal mode: "pooled" (global window pool — fastest, no per-ray
    # window cliff), "windowed" (per-ray window cap) or "padded" (exact
    # full-lattice; slowest).  ``windowed`` kept as a bool alias for
    # backward compat: windowed=False forces "padded".
    traversal: str = "pooled"
    windowed: bool = True
    # W=64 beat 48 by +1.6 dB eval PSNR at 10k steps for +2.4 ms/step on the
    # benchmark scene (incomplete-ray truncation costs quality); 96 plateaus.
    # (Only used by traversal="windowed"; "pooled" sizes itself from
    # window_budget and has no per-ray cliff.)
    n_windows: int = 64
    window_size: int = 8
    # global window pool size for traversal="pooled"; None = sample_budget//4
    # (a window holds up to window_size samples; ~60% are fine-valid on
    # typical scenes, so budget//4 windows can always fill the sample budget)
    window_budget: Optional[int] = None
    # fine occupancy test for traversal="pooled".  "auto" resolves to -1
    # (ONE 27-word box row gather per window, _occupancy_lookup_window_box)
    # when the static config guarantees the box covers every window —
    # uniform stepping, single grid level, (window_size/2)*step_size <=
    # voxel — making the sampling structurally EXACT at fewer gathers than
    # any probe count (measured 20.8M vs fp4's 19.5M samples/s on the v5e
    # bench config); otherwise falls back to 4 run-start word probes
    # (~window_size/probes fewer gathers; exact for windows spanning <= 4
    # bit-words, tiny conservative superset beyond — 0.002% false samples
    # at the measured knee; 3 probes cost ~1 dB eval PSNR by training
    # density into eval-skipped voxels).  Explicit ints: -1 = box, 0 =
    # exact per-candidate gather, K>0 = K run-start probes.
    fine_probes: Any = "auto"
    # pool/sample compaction strategy: "onehot" (default) = sort-free
    # hierarchical cumsum inversion (ops/compaction.py, bit-identical to
    # the sort, measured faster — the two sorts were 23% of the round-5
    # step trace); "sort" = the legacy order-preserving key sorts.
    compaction: str = "onehot"
    # dense occupancy updates: refresh ALL cells every update_interval steps
    # (scatter/sort-free — see update_occ_grid docstring) instead of the
    # reference's 1/4-uniform + 1/4-occupied sampled update
    dense_occ_update: bool = True
    # striped partial refresh for dense occupancy updates: after warmup,
    # each update refreshes one rotating 1/S contiguous stripe of the grid
    # (scatter-free dynamic_update_slice) so every cell revisits every
    # S * update_interval steps at 1/S the field evals per update.  S=1 is
    # the full dense refresh (see update_occ_grid).
    occ_refresh_stripes: int = 1
    # dynamic scenes (T-NeRF): condition the field on per-ray timestamps
    # (batches must carry a "timestamps" (n_rays, 1) entry) and feed random
    # frame times into occupancy updates (reference: train_mlp_tnerf.py:128-135)
    time_dependent: bool = False
    timestamps: Any = None  # (n_frames, 1) all frame times, for occ updates
    # Mip-NeRF 360 distortion regularization weight (0 disables;
    # reference: nerfacc/losses.py:7-41)
    distortion_loss_weight: float = 0.0
    # Field-parameter smoothness regularizer weight (0 disables): adds
    # ``weight * field.param_regularizer(params)`` to the loss — e.g. the
    # K-Planes TV prior over the CP/tri-plane grid tables.
    field_reg_weight: float = 0.0
    adam_eps: float = 1e-15
    warmup_lr_steps: int = 100
    seed: int = 42
    # stratified near-plane jitter (reference: occ_grid.py:162-163); off is
    # only useful for deterministic tests (e.g. DP-vs-single equivalence)
    stratified: bool = True
    # eval/inference renderer: "cursor" (default) hoists the coarse phase
    # out of the round loop (one CoarsePool per chunk, per-ray window
    # cursors) — measured fastest at frame scale once the window list holds
    # a whole chunk (0.95 vs pooled's 1.12 s / 320^2 frame; round 3's
    # cursor regression was the 2^17 window-list cap forcing re-coarses).
    # "pooled" re-coarses every round with the train-path traversal;
    # "" / anything else falls back to the classic full-batch while-loop
    # window marcher (render_rays_occgrid_test), kept for reference.
    eval_renderer: str = "cursor"
    # cursor renderer: coarse window-list capacity per chunk.  If a chunk's
    # surviving windows exceed it, rays re-coarse in an outer iteration
    # (one extra coarse phase + 1.3M-key sort each) — on translucent scenes
    # at 8k-ray chunks the default round-3 cap (2^17) forced ~2 re-coarses
    # per chunk, which is exactly the cost the cursor design hoists out.
    cursor_max_windows: int = 1 << 18
    # per-round sample budget for the pooled/cursor EVAL renderers; None =
    # reuse the train `sample_budget`.  Eval at frame scale is sample-bound
    # (rounds = total_samples / budget) while each round also pays fixed
    # coarse/sort costs — a larger eval budget amortizes those fixed costs
    # over fewer rounds at the price of a bigger per-round buffer.
    eval_sample_budget: Optional[int] = None
    # dynamic sample-buffer sizing: `train_steps` specializes the jitted
    # step to the smallest budget bucket covering recent observed demand
    # (with headroom), so the field/compositing never run on the ~20% of
    # padding slots the static budget wastes at steady state.  Buckets are
    # multiples of `budget_granularity`; the demand peak decays slowly so
    # the bucket is sticky (one compile per bucket, reused via the jit
    # cache).  Semantically identical to the static budget: a transient
    # demand spike only truncates like any budget overflow would.
    dynamic_budget: bool = True
    budget_granularity: int = 32768
    budget_headroom: float = 1.15
    # global UPDATE-norm clip applied after Adam, before the lr (0
    # disables).  Hard-surface scenes and multiplicative grid encoders can
    # blow up mid-training (measured: the opaque procedural scene NaNs —
    # fixed at the source by the trunc_exp forward cap — and the K-Planes
    # dynamic run collapses 30 -> 9 dB between 2.5k-5k steps — fixed by
    # its TV prior); this knob bounds any remaining runaway step.  NOTE:
    # clipping RAW grads would be a no-op here — Adam's m/sqrt(v) update
    # is invariant to gradient scale — so the clip sits after Adam.
    grad_clip: float = 0.0
    # learning-rate multiplier for the field's grid-table params (the
    # top-level "encoder" subtree): the hash field's per-step quality edge
    # is its directly-indexed tables memorizing in hundreds of steps
    # (PERF.md head-to-head) — letting the factorized tables train faster
    # than the MLP probes the same optimization-dynamics axis.  1.0 = off.
    table_lr_mult: float = 1.0

    def __post_init__(self):
        if self.fine_probes == "auto":
            aabb = np.asarray(self.aabb, np.float32).reshape(-1)
            voxel = float(
                np.min((aabb[3:] - aabb[:3]) / self.grid_resolution)
            )
            box_exact = (
                self.cone_angle == 0.0
                and self.grid_nlvl == 1
                and (self.window_size / 2) * self.render_step_size <= voxel
            )
            self.fine_probes = -1 if box_exact else 4
        self.schedule = make_lr_schedule(
            self.max_steps, self.lr, self.warmup_lr_steps
        )
        clip = (
            [optax.clip_by_global_norm(self.grad_clip)]
            if self.grad_clip > 0
            else []
        )
        def _encoder_mask(params):
            return {
                k: jax.tree.map(lambda _: k == "encoder", v)
                for k, v in params.items()
            }

        table_boost = (
            [optax.masked(optax.scale(self.table_lr_mult), _encoder_mask)]
            if self.table_lr_mult != 1.0
            else []
        )
        self.optimizer = optax.chain(
            optax.add_decayed_weights(self.weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=self.adam_eps),
            *clip,
            *table_boost,
            optax.scale_by_learning_rate(self.schedule),
        )
        self._train_step = jax.jit(
            self._train_step_impl, donate_argnums=(0,), static_argnums=(2,)
        )
        self._train_steps = jax.jit(
            self._train_steps_impl, donate_argnums=(0,), static_argnums=(2,)
        )
        self._train_steps_sampled = jax.jit(
            self._train_steps_sampled_impl,
            donate_argnums=(0,),
            static_argnums=(2,),
            static_argnames=("sampler", "n_steps"),
        )
        self._render_chunk = jax.jit(self._render_chunk_impl)
        self._render_round = jax.jit(self._render_round_impl)
        self._render_chunk_pooled = jax.jit(self._render_chunk_pooled_impl)
        self._render_chunk_cursor = jax.jit(self._render_chunk_cursor_impl)
        # eval_renderer is part of the jit cache key (static): toggling the
        # attribute between calls must not reuse the other renderer's
        # compiled program.
        self._render_frame = jax.jit(
            self._render_frame_impl, static_argnums=(6,)
        )
        # host-side demand history for dynamic_budget: max over a short
        # sliding window (adapts down once the warmup-phase demand spike
        # leaves the window; bucket granularity absorbs jitter)
        self._demand_hist = collections.deque(maxlen=8)
        self._pending_demand = collections.deque()  # not-yet-read aux

    def init_state(self) -> TrainState:
        key = jax.random.PRNGKey(self.seed)
        key, sub = jax.random.split(key)
        params = self.field.init(sub)
        if self.table_lr_mult != 1.0 and "encoder" not in params:
            import warnings

            warnings.warn(
                f"table_lr_mult={self.table_lr_mult} has no effect: the "
                f"field's params have no top-level 'encoder' subtree "
                f"(keys: {sorted(params)}); the masked lr scale is a no-op",
                stacklevel=2,
            )
        opt_state = self.optimizer.init(params)
        occ_state = init_occ_grid(
            jnp.asarray(self.aabb, jnp.float32),
            self.grid_resolution,
            self.grid_nlvl,
        )
        return TrainState(
            params, opt_state, occ_state, key, jnp.zeros((), jnp.int32)
        )

    def _apply_field(self, params, positions, dirs, ray_indices, batch):
        """Evaluate the radiance field on flat samples, wiring per-ray
        extras (timestamps) through when the field is time-dependent."""
        if self.time_dependent:
            t = jnp.take(batch["timestamps"], ray_indices, axis=0)
            return self.field(params, positions, t, condition=dirs)
        return self.field(params, positions, dirs)

    # -- one fused step ----------------------------------------------------
    def _train_step_impl(
        self, state: TrainState, batch: Dict, budget: Optional[int] = None
    ) -> Tuple:
        return self._step_body(state, batch, axis_name=None, budget=budget)

    def _step_body(
        self,
        state: TrainState,
        batch: Dict,
        axis_name: Optional[str] = None,
        budget: Optional[int] = None,
    ) -> Tuple:
        """The full fused train step.

        With ``axis_name`` set, this same body runs per-device inside a
        ``shard_map`` over a ray-sharded mesh (see ``parallel.mesh``):
        sampling/compaction/field stay local to the shard, the loss is
        normalized by the *global* completed-ray count, and gradients are
        psum-ed over the mesh — so multi-chip training follows exactly the
        single-chip code path (windowed traversal, truncation masking,
        time-dependence, distortion loss included).
        """
        _psum = (
            (lambda x: jax.lax.psum(x, axis_name)) if axis_name else (lambda x: x)
        )
        _pmean = (
            (lambda x: jax.lax.pmean(x, axis_name)) if axis_name else (lambda x: x)
        )
        key, k_occ, k_strat, k_time = jax.random.split(state.key, 4)
        if axis_name is not None:
            # decorrelate the per-shard stratified jitter; k_occ stays
            # replicated so the occupancy update is identical on every device
            k_strat = jax.random.fold_in(
                k_strat, jax.lax.axis_index(axis_name)
            )
        params = state.params

        # Occupancy-grid EMA update every `update_interval` steps
        # (reference: train_ngp_nerf_occ.py:161-170).
        if self.time_dependent:
            assert self.timestamps is not None, (
                "time_dependent trainers need the dataset's frame timestamps"
            )
            timestamps = jnp.asarray(self.timestamps)

            def occ_eval_fn(x):
                # random frame time per queried cell
                # (reference: mlp.py:264-271 query_opacity)
                return self.field.query_opacity(
                    params, x, timestamps, self.render_step_size, k_time
                )[..., 0]

        else:

            def occ_eval_fn(x):
                return self.field.query_density(params, x)[..., 0] * (
                    self.render_step_size
                )

        occ_state = jax.lax.cond(
            state.step % self.update_interval == 0,
            lambda s: update_occ_grid(
                s,
                k_occ,
                state.step,
                occ_eval_fn,
                occ_thre=self.occ_thre,
                ema_decay=self.ema_decay,
                warmup_steps=self.warmup_steps,
                dense=self.dense_occ_update,
                eval_chunk=min(
                    2**21, getattr(self.field, "max_eval_chunk", 2**21)
                ),
                dense_stripes=self.occ_refresh_stripes,
                update_interval=self.update_interval,
            ),
            lambda s: s,
            state.occ_state,
        )

        rays_o = batch["rays_o"]
        rays_d = batch["rays_d"]
        pixels = batch["rgb"]
        render_bkgd = batch["color_bkgd"]

        # Sampling (no gradients through traversal).
        max_coarse = max(self.max_samples_per_ray // self.window_size + 32, 64)
        mode = self.traversal if self.windowed else "padded"
        if mode == "pooled":
            # default pool: budget / (window_size * ~0.6 fine-valid fraction)
            # — sized so the surviving samples roughly fill the sample budget
            # without paying fine-phase work on samples the budget drops
            wb = (
                self.window_budget
                if self.window_budget is not None
                else max(self.sample_budget // 5, 1024)
            )
            ws = sampling_pooled(
                occ_state,
                rays_o,
                rays_d,
                near_plane=self.near_plane,
                far_plane=self.far_plane,
                render_step_size=self.render_step_size,
                stratified=self.stratified,
                cone_angle=self.cone_angle,
                key=k_strat,
                window_budget=min(wb, rays_o.shape[0] * max_coarse),
                window_size=self.window_size,
                max_coarse=max_coarse,
                fine_probes=self.fine_probes,
                compaction=self.compaction,
            )
            samples = compact_samples_from_windows(
                ws,
                budget or self.sample_budget,
                rays_o.shape[0],
                step_size=self.render_step_size,
                cone_angle=self.cone_angle,
                compaction=self.compaction,
            )
            terminated = ws.terminated
            # demand estimate for the batch-size controller: dropped windows
            # hold samples at the OBSERVED per-window yield (counting the
            # full window_size would overestimate ~1.6x and shrink the ray
            # batch more than the scene requires)
            windows_used = jnp.maximum(
                jnp.sum((ws.ray_ids < rays_o.shape[0]).astype(jnp.int32)), 1
            )
            yield_per_window = jnp.sum(ws.counts) / windows_used
            extra_demand = (
                ws.window_overflow.astype(jnp.float32) * yield_per_window
            ).astype(jnp.int32)
        else:
            res = sampling_padded(
                occ_state,
                rays_o,
                rays_d,
                near_plane=self.near_plane,
                far_plane=self.far_plane,
                render_step_size=self.render_step_size,
                alpha_thre=self.alpha_thre,
                early_stop_eps=self.early_stop_eps,
                stratified=self.stratified,
                cone_angle=self.cone_angle,
                key=k_strat,
                max_samples=self.max_samples_per_ray,
                windowed=(mode == "windowed"),
                n_windows=self.n_windows,
                window_size=self.window_size,
                max_coarse=max_coarse,
            )
            samples = compact_samples(res, budget or self.sample_budget)
            terminated = res.terminated
            extra_demand = jnp.zeros((), jnp.int32)

        # Rays truncated by the sample budget render wrong colors; exclude
        # them from the loss (training them toward the background biases the
        # whole field toward the background color).
        budget_ok = (
            jnp.arange(rays_o.shape[0], dtype=jnp.int32)
            < samples.first_incomplete_ray
        )[:, None]

        def loss_fn(params):
            def rgb_sigma_fn(positions, dirs, ray_indices):
                rgb, density = self._apply_field(
                    params, positions, dirs, ray_indices, batch
                )
                return rgb, density[..., 0]

            colors, opacities, _, extras = render_rays_with_occgrid(
                rgb_sigma_fn,
                rays_o,
                rays_d,
                samples,
                render_bkgd=render_bkgd,
            )
            # Rays whose window budget ran out mid-scene are also missing
            # far content — prefer rays that finished or saturated opacity.
            # But early in training (dense grid, low density) EVERY ray can
            # be truncated; masking them all would zero the loss and
            # deadlock, so only apply this mask once a reasonable fraction
            # of rays completes.
            window_ok = terminated[:, None] | (opacities > 1.0 - 1e-3)
            frac_ok = _pmean(jnp.mean(window_ok.astype(jnp.float32)))
            ray_ok = budget_ok & jnp.where(frac_ok > 0.25, window_ok, True)
            # Normalize by the GLOBAL completed-ray count so the per-shard
            # loss sums to the exact single-chip loss under DP.
            n_ok = jnp.maximum(_psum(jnp.sum(ray_ok)), 1)
            diff = jnp.abs(colors - pixels) * ray_ok
            loss = jnp.sum(
                jnp.where(diff < 1.0, 0.5 * diff**2, diff - 0.5)
            ) / (n_ok * 3)
            mse = jnp.sum((diff) ** 2) / (n_ok * 3)
            if self.distortion_loss_weight > 0:
                from ..losses import distortion

                dist = distortion(
                    extras["weights"],
                    samples.t_starts,
                    samples.t_ends,
                    samples.ray_indices,
                    rays_o.shape[0],
                    masks=samples.valid,
                )
                loss = loss + self.distortion_loss_weight * jnp.sum(
                    dist * ray_ok
                ) / n_ok
            if self.field_reg_weight > 0:
                # params are replicated under DP and the per-shard losses
                # are psum-ed: divide by the axis size so the global loss
                # carries the regularizer exactly once.
                reg = self.field.param_regularizer(params)
                if axis_name is not None:
                    reg = reg / jax.lax.psum(1.0, axis_name)
                loss = loss + self.field_reg_weight * reg
            return loss, (mse, jnp.sum(ray_ok))

        (loss, (mse, n_rays_ok)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        # DP all-reduce (identity single-chip): losses/grads are per-shard
        # partial sums of the globally-normalized objective.
        grads = _psum(grads)
        loss = _psum(loss)
        mse = _psum(mse)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, params
        )
        params = optax.apply_updates(params, updates)

        new_state = TrainState(
            params, opt_state, occ_state, key, state.step + 1
        )
        n_truncated = jnp.sum(~terminated)
        aux = {
            "loss": loss,
            "mse": mse,
            "n_rays_ok": _psum(n_rays_ok),
            "n_rendering_samples": _psum(samples.num_valid),
            # the batch-size controller must see the TRUE sample demand,
            # including samples dropped past the budget, or it will not
            # shrink the ray batch when overflowing
            "n_total_samples": _psum(
                samples.num_valid + samples.overflow + extra_demand
            ),
            "overflow": _psum(samples.overflow),
            # windowed-traversal cliff guard: the fraction of rays whose
            # window budget ran out mid-scene.  Persistently high values mean
            # n_windows is too small for the scene and quality silently
            # collapses (W=28 -> PSNR 10 on the bench scene) — train loops
            # should warn/adapt on this signal (see examples/).
            "n_rays_truncated": _psum(n_truncated),
        }
        return new_state, aux

    def _train_steps_impl(
        self, state: TrainState, batches: Dict, budget: Optional[int] = None
    ) -> Tuple:
        """Run several steps in one ``lax.scan`` — amortizes per-dispatch
        host overhead (~10 ms on a tunneled chip) across the scan length."""

        def body(st, b):
            st, aux = self._train_step_impl(st, b, budget)
            return st, aux

        return jax.lax.scan(body, state, batches)

    def _pick_budget(self) -> Optional[int]:
        """Smallest budget bucket covering recent demand (dynamic_budget)."""
        if not self.dynamic_budget or not self._demand_hist:
            return None  # full static budget (also: first call)
        g = self.budget_granularity
        want = int(max(self._demand_hist) * self.budget_headroom) + g - 1
        bucket = min(self.sample_budget, max(g, want // g * g))
        return None if bucket >= self.sample_budget else bucket

    def _note_demand(self, n_total_samples) -> None:
        """Record the demand of a dispatched call WITHOUT syncing on it.

        Device values are folded into the host-side history two calls later:
        reading call N-2 while N-1 is still queued keeps the device fed
        during the host's dispatch of call N (reading N-1 directly was
        measured to cost ~3% end-to-end — the device idles for one dispatch
        latency per call).
        """
        self._pending_demand.append(n_total_samples)
        while len(self._pending_demand) > 2:
            # np.max on the fetched array — jnp.max would dispatch a (tiny)
            # device program per call, ~10 ms each over a tunneled link
            self._demand_hist.append(
                float(np.max(np.asarray(self._pending_demand.popleft())))
            )

    def train_steps(self, state: TrainState, batches: Dict) -> Tuple:
        """Run ``batches['rgb'].shape[0]`` steps fused into one dispatch.

        All leaves must be stacked along a leading steps axis.
        """
        batches = {k: jnp.asarray(v) for k, v in batches.items()}
        state, aux = self._train_steps(state, batches, self._pick_budget())
        if self.dynamic_budget:
            self._note_demand(aux["n_total_samples"])
        return state, aux

    def _train_steps_sampled_impl(
        self,
        state: TrainState,
        arrays: Dict,
        budget: Optional[int] = None,
        *,
        sampler,
        n_steps: int,
    ) -> Tuple:
        """``_train_steps_impl`` with the batches drawn ON DEVICE each step
        (``data.device_sampler.DeviceRaySampler``) — no host batch assembly,
        no per-step H2D.  Same move as ``NGPPropTrainer.train_steps_sampled``
        (PERF.md "Proposal-network path": host assembly held that loop ~1.7x
        over its device time)."""

        def body(st, _):
            kb = jax.random.fold_in(st.key, 0x5A)
            batch = sampler.sample(arrays, kb)
            return self._train_step_impl(st, batch, budget)

        return jax.lax.scan(body, state, None, length=n_steps)

    def train_steps_sampled(
        self, state: TrainState, sampler, n_steps: int
    ) -> Tuple:
        """Run ``n_steps`` fused steps with device-side ray sampling."""
        assert not self.time_dependent, (
            "device-side sampling does not carry timestamps yet — "
            "use train_steps for time-dependent fields"
        )
        state, aux = self._train_steps_sampled(
            state,
            sampler.arrays,
            self._pick_budget(),
            sampler=sampler,
            n_steps=int(n_steps),
        )
        if self.dynamic_budget:
            self._note_demand(aux["n_total_samples"])
        return state, aux

    def train_step(self, state: TrainState, batch: Dict) -> Tuple:
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, aux = self._train_step(state, batch, self._pick_budget())
        if self.dynamic_budget:
            self._note_demand(aux["n_total_samples"])
        return state, aux

    # -- evaluation --------------------------------------------------------
    def _render_chunk_impl(self, params, occ_state, rays_o, rays_d, bkgd, t):
        # Iterative alive-ray renderer: fixed-window marching with resumable
        # transmittance — per-ray sample counts are unbounded, so a fixed
        # flat budget (which silently truncates rays) is not usable for
        # full-image eval (reference: examples/utils.py:267-439).
        from ..utils.rendering import render_rays_occgrid_test

        def field_fn(positions, dirs):
            if self.time_dependent:
                times = jnp.broadcast_to(t, positions.shape[:1] + (1,))
                rgb, density = self.field(
                    params, positions, times, condition=dirs
                )
            else:
                rgb, density = self.field(params, positions, dirs)
            return rgb, density[..., 0]

        colors, opacities, depths = render_rays_occgrid_test(
            field_fn,
            occ_state,
            rays_o,
            rays_d,
            render_bkgd=bkgd,
            near_plane=self.near_plane,
            far_plane=self.far_plane,
            render_step_size=self.render_step_size,
            cone_angle=self.cone_angle,
            early_stop_eps=max(self.early_stop_eps, 1e-4),
            window=128,
            max_iters=self.max_samples_per_ray // 32,
        )
        return colors, opacities, depths

    def _field_eval_fn(self, params, t):
        def field_fn(positions, dirs):
            if self.time_dependent:
                times = jnp.broadcast_to(t, positions.shape[:1] + (1,))
                rgb, density = self.field(
                    params, positions, times, condition=dirs
                )
            else:
                rgb, density = self.field(params, positions, dirs)
            return rgb, density[..., 0]

        return field_fn

    def _render_round_impl(
        self, params, occ_state, rays_o, rays_d, t,
        near, alive, color, opacity, depth,
    ):
        # One pooled marching round (see utils.rendering
        # make_pooled_eval_round): dead rays cost nothing, so a chunk
        # finishes in 2-3 rounds instead of ~32 full-batch window
        # iterations of the while-loop renderer (~10x faster eval).
        from ..utils.rendering import make_pooled_eval_round

        max_coarse = max(self.max_samples_per_ray // self.window_size + 32, 64)
        round_fn = make_pooled_eval_round(
            self._field_eval_fn(params, t),
            occ_state,
            near_plane=self.near_plane,
            far_plane=self.far_plane,
            render_step_size=self.render_step_size,
            cone_angle=self.cone_angle,
            early_stop_eps=max(self.early_stop_eps, 1e-4),
            budget=self.sample_budget,
            window_size=self.window_size,
            max_coarse=max_coarse,
        )
        return round_fn(rays_o, rays_d, near, alive, color, opacity, depth)

    def _render_chunk_pooled_impl(self, params, occ_state, o, d, bkgd, t):
        # The whole multi-round march is ONE dispatch: a lax.while_loop
        # whose body is the pooled round, exiting on-device when no ray is
        # alive.  (A host-side round loop pays a tunnel dispatch + an
        # `any(alive)` round-trip per round — measured ~80 ms of overhead
        # on a ~15 ms round.)
        from ..utils.rendering import make_pooled_eval_round

        max_coarse = max(self.max_samples_per_ray // self.window_size + 32, 64)
        round_fn = make_pooled_eval_round(
            self._field_eval_fn(params, t),
            occ_state,
            near_plane=self.near_plane,
            far_plane=self.far_plane,
            render_step_size=self.render_step_size,
            cone_angle=self.cone_angle,
            early_stop_eps=max(self.early_stop_eps, 1e-4),
            budget=self.eval_sample_budget or self.sample_budget,
            window_size=self.window_size,
            max_coarse=max_coarse,
        )
        n = o.shape[0]

        def cond(carry):
            i, near, alive, *_ = carry
            return (i < 64) & jnp.any(alive)

        def body(carry):
            i, near, alive, color, opacity, depth = carry
            near, alive, color, opacity, depth = round_fn(
                o, d, near, alive, color, opacity, depth
            )
            return (i + 1, near, alive, color, opacity, depth)

        init = (
            jnp.zeros((), jnp.int32),
            jnp.full((n,), self.near_plane, jnp.float32),
            jnp.ones((n,), bool),
            jnp.zeros((n, 3), jnp.float32),
            jnp.zeros((n, 1), jnp.float32),
            jnp.zeros((n, 1), jnp.float32),
        )
        _, _, _, color, opacity, depth = jax.lax.while_loop(cond, body, init)
        depth = depth / jnp.clip(opacity, min=jnp.finfo(jnp.float32).eps)
        color = color + bkgd * (1.0 - opacity)
        return color, opacity, depth

    def _render_chunk_cursor_impl(self, params, occ_state, o, d, bkgd, t):
        # Cursor-based pooled renderer: the coarse phase + global window
        # sort run ONCE per chunk (utils.rendering.make_cursor_eval_chunk);
        # rounds only pay fine probes + field + composite on the consumed
        # pool.  Eval uses the SAME fine_probes as training so train and
        # eval sample the identical voxel set (see PERF.md on the
        # train/eval sampling-mismatch cost).
        from ..utils.rendering import make_cursor_eval_chunk

        max_coarse = max(self.max_samples_per_ray // self.window_size + 32, 64)
        chunk_fn = make_cursor_eval_chunk(
            self._field_eval_fn(params, t),
            occ_state,
            near_plane=self.near_plane,
            far_plane=self.far_plane,
            render_step_size=self.render_step_size,
            cone_angle=self.cone_angle,
            early_stop_eps=max(self.early_stop_eps, 1e-4),
            # Full train-path budget (or the eval override): per-round costs
            # are dominated by the FIXED pool/budget shapes, not by
            # alive-ray demand, so a smaller budget just multiplies the
            # round count (measured: budget/2 -> 5 rounds x 6.5 ms vs 2-3
            # rounds at full budget).
            sample_budget=self.eval_sample_budget or self.sample_budget,
            window_size=self.window_size,
            max_coarse=max_coarse,
            fine_probes=self.fine_probes,
            max_windows=self.cursor_max_windows,
        )
        color, opacity, depth = chunk_fn(o, d)
        depth = depth / jnp.clip(opacity, min=jnp.finfo(jnp.float32).eps)
        color = color + bkgd * (1.0 - opacity)
        return color, opacity, depth

    def _render_frame_impl(
        self, params, occ_state, o_chunks, d_chunks, bkgd, t, renderer
    ):
        # Whole-frame eval in ONE dispatch: lax.scan over ray chunks with
        # the pooled/cursor chunk renderer as the body.  On the tunneled
        # backend each jitted call carries ~25-40 ms of host+dispatch
        # overhead that does NOT overlap device execution across calls
        # (measured: 13 pipelined 29 ms-device chunks still took 77 ms
        # each wall); scanning the chunks inside one program removes all
        # but one of those fixed costs — the eval analog of the trainer's
        # fused multi-step scan.
        render = {
            "pooled": self._render_chunk_pooled_impl,
            "cursor": self._render_chunk_cursor_impl,
        }.get(renderer, self._render_chunk_impl)

        def body(_, od):
            o, d = od
            c, op, dep = render(params, occ_state, o, d, bkgd, t)
            return (), (c, op, dep)

        _, (c, op, dep) = jax.lax.scan(body, (), (o_chunks, d_chunks))
        return c, op, dep

    def render_image(
        self, state: TrainState, data: Dict, chunk: int = 8192
    ) -> np.ndarray:
        if self.eval_renderer in ("pooled", "cursor"):
            rays_o = np.asarray(data["rays_o"], np.float32).reshape(-1, 3)
            rays_d = np.asarray(data["rays_d"], np.float32).reshape(-1, 3)
            bkgd = jnp.asarray(data["color_bkgd"], jnp.float32)
            t = jnp.asarray(
                data["timestamps"].reshape(-1)[0]
                if "timestamps" in data
                else 0.0,
                jnp.float32,
            )
            n = rays_o.shape[0]
            n_chunks = -(-n // chunk)
            pad = n_chunks * chunk - n
            if pad:
                rays_o = np.pad(
                    rays_o, ((0, pad), (0, 0)), constant_values=1e8
                )
                rays_d = np.pad(
                    rays_d, ((0, pad), (0, 0)), constant_values=1.0
                )
            c, _, _ = self._render_frame(
                state.params,
                state.occ_state,
                jnp.asarray(rays_o.reshape(n_chunks, chunk, 3)),
                jnp.asarray(rays_d.reshape(n_chunks, chunk, 3)),
                bkgd,
                t,
                self.eval_renderer,
            )
            return np.asarray(c).reshape(n_chunks * chunk, 3)[:n]
        return self._render_image_chunked(state, data, chunk)

    def _render_image_chunked(
        self, state: TrainState, data: Dict, chunk: int = 8192
    ) -> np.ndarray:
        rays_o = np.asarray(data["rays_o"])
        rays_d = np.asarray(data["rays_d"])
        bkgd = jnp.asarray(data["color_bkgd"])
        t = jnp.asarray(
            data["timestamps"].reshape(-1)[0]
            if "timestamps" in data
            else 0.0,
            jnp.float32,
        )
        n = rays_o.shape[0]
        out = []
        for s in range(0, n, chunk):
            o = rays_o[s : s + chunk]
            d = rays_d[s : s + chunk]
            pad = chunk - o.shape[0]
            if pad:
                o = np.pad(o, ((0, pad), (0, 0)), constant_values=1e8)
                d = np.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
            render = {
                "pooled": self._render_chunk_pooled,
                "cursor": self._render_chunk_cursor,
            }.get(self.eval_renderer, self._render_chunk)
            c, _, _ = render(
                state.params,
                state.occ_state,
                jnp.asarray(o),
                jnp.asarray(d),
                bkgd,
                t,
            )
            # Keep results on device: materializing each chunk here would
            # serialize dispatch with compute (the ~10 ms tunnel dispatch
            # stops overlapping the previous chunk's execution).  One
            # device_get at the end pipelines all chunks.
            out.append((c, pad))
        return np.concatenate(
            [
                np.asarray(c)[: chunk - pad] if pad else np.asarray(c)
                for c, pad in out
            ]
        )

    def eval_metrics(self, state: TrainState, dataset, max_images=None) -> dict:
        """Mean PSNR and SSIM over the eval split (reference eval reports
        PSNR + LPIPS, examples/train_ngp_nerf_occ.py:246-272; LPIPS needs
        pretrained VGG weights — infeasible offline — so SSIM fills the
        second-metric role, see utils/metrics.py)."""
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

    def eval_psnr(self, state: TrainState, dataset, max_images=None) -> float:
        return self.eval_metrics(state, dataset, max_images)["psnr"]
