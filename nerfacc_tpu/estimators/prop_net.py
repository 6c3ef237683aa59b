"""Proposal-network transmittance estimator (Mip-NeRF 360 style).

TPU-native rebuild of the reference ``PropNetEstimator``
(reference: nerfacc/estimators/prop_net.py:17-313).  The core is functional —
:func:`propnet_sampling` returns the sample bounds *and* the proposal cache
as explicit values, and :func:`propnet_loss` consumes them — so the whole
thing composes with ``jax.grad``/``jit`` (the reference's side-effecting
``self.prop_cache`` list cannot survive tracing).  A thin class wrapper
mirrors the reference OO API for eager use.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..data_specs import RayIntervals
from ..pdf import importance_sampling, searchsorted
from ..volrend import render_transmittance_from_density
from .base import AbstractEstimator


def _transform_stot(
    transform_type: str,
    s_vals: jnp.ndarray,
    t_min: float,
    t_max: float,
) -> jnp.ndarray:
    """Map normalized s in [0, 1] to metric t (reference: prop_net.py:215-229)."""
    if transform_type == "uniform":
        _contract, _icontract = lambda x: x, lambda x: x
    elif transform_type == "lindisp":
        _contract, _icontract = lambda x: 1 / x, lambda x: 1 / x
    else:
        raise ValueError(f"Unknown transform_type: {transform_type}")
    s_min, s_max = _contract(t_min), _contract(t_max)
    return _icontract(s_vals * s_max + (1 - s_vals) * s_min)


def _pdf_loss(
    segments_query: RayIntervals,
    cdfs_query: jnp.ndarray,
    segments_key: RayIntervals,
    cdfs_key: jnp.ndarray,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """Interlevel PDF-matching loss (reference: prop_net.py:232-256)."""
    w = cdfs_query[..., 1:] - cdfs_query[..., :-1]
    q_vals = segments_query.vals
    k_vals = segments_key.vals
    if q_vals.ndim > 1:
        # Fused batched path.  The reference gathers cdfs_key at the
        # searchsorted indices (prop_net.py:249-253); on this chip the two
        # (n_rays*n) row gathers plus their scatter-add backward were 56% of
        # the proposal-step device time.  Instead: the indices are prefix
        # counts over the sorted key edges, so the gathered values are one-hot
        # select-reductions over the (small) edge axis — exact index
        # semantics, elementwise forward, and a broadcast-multiply backward
        # (no scatter).  Same trick as importance_sampling (pdf.py:199-218).
        k_edges = k_vals.shape[-1]
        cnt = jnp.sum(
            k_vals[:, None, :-1] <= q_vals[:, :, None], axis=-1
        ).astype(jnp.int32)
        last = k_edges - 1
        ids_left = jnp.clip(cnt[..., :-1] - 1, 0, last)
        ids_right = jnp.clip(cnt[..., 1:], 0, last)
        iota = jnp.arange(k_edges, dtype=jnp.int32)
        sel = (ids_right[:, :, None] == iota).astype(cdfs_key.dtype) - (
            ids_left[:, :, None] == iota
        ).astype(cdfs_key.dtype)
        w_outer = jnp.sum(sel * cdfs_key[:, None, :], axis=-1)
    else:
        ids_left, ids_right = searchsorted(segments_key, segments_query)
        ids_left = ids_left[..., :-1]
        ids_right = ids_right[..., 1:]
        w_outer = jnp.take_along_axis(cdfs_key, ids_right, axis=-1) - (
            jnp.take_along_axis(cdfs_key, ids_left, axis=-1)
        )
    return jnp.clip(w - w_outer, min=0) ** 2 / (w + eps)


def _outer(
    t0_starts: jnp.ndarray,
    t0_ends: jnp.ndarray,
    t1_starts: jnp.ndarray,
    t1_ends: jnp.ndarray,
    y1: jnp.ndarray,
) -> jnp.ndarray:
    """Histogram outer measure (reference: prop_net.py:259-293, test helper)."""
    cy1 = jnp.concatenate(
        [jnp.zeros_like(y1[..., :1]), jnp.cumsum(y1, axis=-1)], axis=-1
    )

    def row_ss(a, v, side):
        # compare_all: the default "scan" method is a while loop of row
        # gathers — pathological on TPU (see pdf.py importance_sampling)
        return jax.vmap(
            lambda aa, vv: jnp.searchsorted(
                aa, vv, side=side, method="compare_all"
            )
        )(
            a.reshape(-1, a.shape[-1]), v.reshape(-1, v.shape[-1])
        ).reshape(v.shape)

    idx_lo = row_ss(t1_starts, t0_starts, "right") - 1
    idx_lo = jnp.clip(idx_lo, 0, y1.shape[-1] - 1)
    idx_hi = row_ss(t1_ends, t0_ends, "right")
    idx_hi = jnp.clip(idx_hi, 0, y1.shape[-1] - 1)
    cy1_lo = jnp.take_along_axis(cy1[..., :-1], idx_lo, axis=-1)
    cy1_hi = jnp.take_along_axis(cy1[..., 1:], idx_hi, axis=-1)
    return cy1_hi - cy1_lo


def _lossfun_outer(
    t: jnp.ndarray,
    w: jnp.ndarray,
    t_env: jnp.ndarray,
    w_env: jnp.ndarray,
) -> jnp.ndarray:
    """Reference interlevel loss (reference: prop_net.py:296-313, test helper)."""
    eps = jnp.finfo(t.dtype).eps
    w_outer = _outer(
        t[..., :-1], t[..., 1:], t_env[..., :-1], t_env[..., 1:], w_env
    )
    return jnp.clip(w - w_outer, min=0) ** 2 / (w + eps)


def propnet_sampling(
    prop_sigma_fns: Sequence[Callable],
    prop_samples: Sequence[int],
    num_samples: int,
    n_rays: int,
    near_plane: float,
    far_plane: float,
    sampling_type: str = "lindisp",
    stratified: bool = False,
    requires_grad: bool = False,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, List[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """Hierarchical sampling through the proposal-network CDF cascade.

    (reference: prop_net.py:37-129).  Pure function; when ``requires_grad``
    the per-level ``(interval_edges, cdfs)`` pairs are returned so
    :func:`propnet_loss` can propagate gradients into the proposal networks.

    Args:
        prop_sigma_fns: per-level callables ``(t_starts, t_ends) -> sigmas``,
            all shapes ``(n_rays, n)``.
        prop_samples: samples per proposal level.
        num_samples: final sample count.
        key: PRNG key (required when ``stratified``).

    Returns:
        (t_starts (n_rays, num_samples), t_ends, prop_cache).
    """
    assert len(prop_sigma_fns) == len(prop_samples), (
        "The number of proposal networks and the number of samples "
        "should be the same."
    )
    cdfs = jnp.concatenate(
        [jnp.zeros((n_rays, 1)), jnp.ones((n_rays, 1))], axis=-1
    )
    intervals = RayIntervals(vals=cdfs)
    prop_cache: List = []

    keys = (
        jax.random.split(key, len(prop_sigma_fns) + 1)
        if key is not None
        else [None] * (len(prop_sigma_fns) + 1)
    )

    for level, (level_fn, level_samples) in enumerate(
        zip(prop_sigma_fns, prop_samples)
    ):
        intervals, _ = importance_sampling(
            RayIntervals(vals=jax.lax.stop_gradient(intervals.vals)),
            jax.lax.stop_gradient(cdfs),
            level_samples,
            stratified,
            key=keys[level],
        )
        t_vals = _transform_stot(
            sampling_type, intervals.vals, near_plane, far_plane
        )
        t_starts = t_vals[..., :-1]
        t_ends = t_vals[..., 1:]

        sigmas = level_fn(t_starts, t_ends)
        if not requires_grad:
            sigmas = jax.lax.stop_gradient(sigmas)
        assert sigmas.shape == t_starts.shape
        trans, _ = render_transmittance_from_density(t_starts, t_ends, sigmas)
        cdfs = 1.0 - jnp.concatenate(
            [trans, jnp.zeros_like(trans[:, :1])], axis=-1
        )
        if requires_grad:
            prop_cache.append((intervals.vals, cdfs))

    intervals, _ = importance_sampling(
        RayIntervals(vals=jax.lax.stop_gradient(intervals.vals)),
        jax.lax.stop_gradient(cdfs),
        num_samples,
        stratified,
        key=keys[-1],
    )
    t_vals = _transform_stot(sampling_type, intervals.vals, near_plane, far_plane)
    t_starts = t_vals[..., :-1]
    t_ends = t_vals[..., 1:]
    if requires_grad:
        prop_cache.append((intervals.vals, None))

    return t_starts, t_ends, prop_cache


def propnet_loss(
    prop_cache: List[Tuple[jnp.ndarray, Optional[jnp.ndarray]]],
    trans: jnp.ndarray,
    loss_scaler: float = 1.0,
) -> jnp.ndarray:
    """Interlevel loss over the cached proposal CDFs (reference: prop_net.py:131-154).

    Args:
        prop_cache: output of :func:`propnet_sampling` with
            ``requires_grad=True`` (last entry holds the final intervals).
        trans: (n_rays, num_samples) transmittance of the final samples.
    """
    if len(prop_cache) == 0:
        return jnp.zeros(())

    final_vals, _ = prop_cache[-1]
    cdfs = 1.0 - jnp.concatenate(
        [trans, jnp.zeros_like(trans[:, :1])], axis=-1
    )
    cdfs = jax.lax.stop_gradient(cdfs)
    intervals = RayIntervals(vals=final_vals)

    loss = 0.0
    for prop_vals, prop_cdfs in prop_cache[:-1]:
        loss += jnp.mean(
            _pdf_loss(intervals, cdfs, RayIntervals(vals=prop_vals), prop_cdfs)
        )
    return loss * loss_scaler


class PropNetEstimator(AbstractEstimator):
    """Proposal network estimator — reference-compatible stateful wrapper.

    (reference: nerfacc/estimators/prop_net.py:17-193).  The optimizer for
    the proposal networks lives with the caller in the JAX world (optax
    transforms over the proposal params); this wrapper only orchestrates
    sampling and caches the proposal CDFs for eager (non-jit) use.
    """

    def __init__(
        self,
        optimizer=None,
        scheduler=None,
        seed: int = 0,
        params=None,
        sigma_fns_builder: Optional[Callable] = None,
    ) -> None:
        """Args:
            optimizer: optax gradient transform for the proposal params
                (the reference passes a torch optimizer, prop_net.py:27-34).
            scheduler: optional optax schedule — already baked into optax
                optimizers; accepted for signature parity and ignored.
            params: proposal-network parameter pytree (required for
                ``update_every_n_steps`` to take gradient steps).
            sigma_fns_builder: ``params -> [sigma_fn, ...]`` rebuilding the
                per-level density closures from parameters.  JAX has no
                retained autograd tape, so the estimator re-traces sampling
                under ``jax.grad`` using this builder.
        """
        super().__init__()
        self.optimizer = optimizer
        self.scheduler = scheduler
        self.params = params
        self.opt_state = (
            optimizer.init(params)
            if (optimizer is not None and params is not None)
            else None
        )
        self.sigma_fns_builder = sigma_fns_builder
        self.prop_cache: List = []
        self._sampling_args = None
        self._key = jax.random.PRNGKey(seed)

    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def sampling(
        self,
        prop_sigma_fns: Optional[Sequence[Callable]] = None,
        prop_samples: Sequence[int] = (),
        num_samples: int = 32,
        n_rays: int = 0,
        near_plane: float = 0.0,
        far_plane: float = 1e10,
        sampling_type: str = "lindisp",
        stratified: bool = False,
        requires_grad: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Sampling with proposal-network CDFs (reference: prop_net.py:37-129).

        ``prop_sigma_fns=None`` uses ``sigma_fns_builder(self.params)`` so a
        later :meth:`update_every_n_steps` can differentiate through the
        sampling (JAX keeps no tape; the estimator re-traces instead).
        """
        if prop_sigma_fns is None:
            assert self.sigma_fns_builder is not None and self.params is not None
            prop_sigma_fns = self.sigma_fns_builder(self.params)
        key = self._next_key() if stratified else None
        t_starts, t_ends, cache = propnet_sampling(
            prop_sigma_fns,
            prop_samples,
            num_samples,
            n_rays,
            near_plane,
            far_plane,
            sampling_type,
            stratified,
            requires_grad,
            key=key,
        )
        if requires_grad:
            self.prop_cache = list(cache)
            self._sampling_args = dict(
                prop_samples=list(prop_samples),
                num_samples=num_samples,
                n_rays=n_rays,
                near_plane=near_plane,
                far_plane=far_plane,
                sampling_type=sampling_type,
                stratified=stratified,
                key=key,
            )
        return t_starts, t_ends

    def compute_loss(self, trans: jnp.ndarray, loss_scaler: float = 1.0):
        """(reference: prop_net.py:131-154)"""
        if len(self.prop_cache) == 0:
            return jnp.zeros(())
        loss = propnet_loss(self.prop_cache, trans, loss_scaler)
        self.prop_cache = []
        return loss

    def update_every_n_steps(
        self,
        trans: jnp.ndarray,
        requires_grad: bool = False,
        loss_scaler: float = 1.0,
    ) -> float:
        """Interlevel loss + one optimizer step on the proposal networks.

        (reference: prop_net.py:156-193 — loss from the cached CDFs, then
        zero_grad/backward/step on the estimator's own optimizer.)  Needs
        ``optimizer``/``params``/``sigma_fns_builder`` from the constructor;
        without them this degenerates to :meth:`compute_loss` (loss value,
        no parameter update), mirroring ``requires_grad=False``.
        """
        if not requires_grad:
            self.prop_cache = []
            return 0.0
        can_step = (
            self.optimizer is not None
            and self.params is not None
            and self.sigma_fns_builder is not None
            and self._sampling_args is not None
        )
        if not can_step:
            return float(self.compute_loss(trans, loss_scaler))

        import optax

        args = self._sampling_args
        trans = jax.lax.stop_gradient(trans)

        def loss_fn(params):
            fns = self.sigma_fns_builder(params)
            _, _, cache = propnet_sampling(
                fns,
                args["prop_samples"],
                args["num_samples"],
                args["n_rays"],
                args["near_plane"],
                args["far_plane"],
                args["sampling_type"],
                args["stratified"],
                requires_grad=True,
                key=args["key"],
            )
            return propnet_loss(cache, trans, loss_scaler)

        loss, grads = jax.value_and_grad(loss_fn)(self.params)
        updates, self.opt_state = self.optimizer.update(
            grads, self.opt_state, self.params
        )
        self.params = optax.apply_updates(self.params, updates)
        self.prop_cache = []
        self._sampling_args = None
        return float(loss)

    def state_dict(self):
        return {}

    def load_state_dict(self, state_dict) -> None:
        pass


def get_proposal_requires_grad_fn(
    target: float = 5.0, num_steps: int = 1000
) -> Callable:
    """Schedule that sparsifies proposal-grad passes (reference: prop_net.py:196-212)."""
    schedule = lambda s: min(s / num_steps, 1.0) * target

    steps_since_last_grad = 0

    def proposal_requires_grad_fn(step: int) -> bool:
        nonlocal steps_since_last_grad
        target_steps_since_last_grad = schedule(step)
        requires_grad = steps_since_last_grad > target_steps_since_last_grad
        if requires_grad:
            steps_since_last_grad = 0
        steps_since_last_grad += 1
        return requires_grad

    return proposal_requires_grad_fn
