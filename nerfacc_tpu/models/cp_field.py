"""CP-factorized radiance field — the TPU-native fast path.

Why this exists: on TPU, XLA lowers random gathers to a ~4 ns/row serial
path, so Instant-NGP's hash-grid encoder (33M random rows per step) is
bandwidth-starved by 100x.  The MXU, in contrast, delivers hundreds of
TFLOPs.  This field replaces the hash grid with a CP/K-Planes-style
factorized grid evaluated entirely by dense matmuls: per axis and per
resolution, a "hat-function" interpolation matrix (N, R) — two adjacent
nonzeros per row, built from an iota comparison — is multiplied with a line
table (R, rank) on the MXU; per-sample features are the elementwise product
of the three axis features (CP contraction), concatenated over resolutions.

No gathers anywhere: encode + MLP + backward are all matmuls/elementwise.
Fills the same role as the reference's tcnn NGP field
(examples/radiance_fields/ngp.py:69-217) at TPU-native speed.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .encoders import spherical_harmonics_16
from .ngp import _mlp_apply, _mlp_init, contract_to_unisphere, trunc_exp


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def tp_allreduce(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """All-reduce a tensor-parallel partial sum with an identity transpose.

    Forward: ``psum`` over the model axis (each shard holds the partial
    product of its rank-slice of the encoder features with its row-slice of
    the first MLP layer).  Backward: the output is replicated over the model
    axis, so the arriving cotangent is too, and each shard's partial
    contributes linearly exactly once — the correct input cotangent is the
    cotangent itself.  Spelling this out as a custom VJP keeps the gradient
    unambiguous under ``shard_map(check_vma=False)`` (where JAX cannot track
    replication to transpose ``psum`` on its own).
    """
    return jax.lax.psum(x, axis_name)


def _tp_allreduce_fwd(x, axis_name):
    return jax.lax.psum(x, axis_name), None


def _tp_allreduce_bwd(axis_name, _res, g):
    return (g,)


tp_allreduce.defvjp(_tp_allreduce_fwd, _tp_allreduce_bwd)


def _mlp_apply_tp(params, x, compute_dtype, tp_axis: Optional[str]):
    """Bias-free ReLU MLP with megatron-style row parallelism on layer 0.

    With ``tp_axis`` set, ``x`` is the locally-sharded feature slice and
    ``params[0]`` the matching row-slice of the first weight matrix; the
    partial products are psum-ed before the activation and every later layer
    runs replicated.  ``tp_axis=None`` is exactly ``_mlp_apply``.
    """
    x = x.astype(compute_dtype)
    for i, w in enumerate(params):
        x = jnp.dot(
            x, w.astype(compute_dtype), preferred_element_type=jnp.float32
        )
        if i == 0 and tp_axis is not None:
            x = tp_allreduce(x, tp_axis)
        if i < len(params) - 1:
            x = jax.nn.relu(x).astype(compute_dtype)
    return x


def _hat_weights(u: jnp.ndarray, R: int, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Dense linear-interpolation weights onto an R-point grid.

    ``u`` in [0, 1] maps to grid coordinate ``u * (R - 1)``; the row has the
    classic two-nonzero hat profile ``max(0, 1 - |pos - i|)``.  Dense on
    purpose: (N, R) @ (R, rank) rides the MXU instead of a gather.
    """
    pos = u * (R - 1)
    grid = jnp.arange(R, dtype=u.dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - grid[None, :]))
    return w.astype(dtype)


@dataclasses.dataclass(frozen=True)
class CPGridEncoder:
    """Multi-resolution CP line encoder.

    Attributes:
        resolutions: per-level 1D grid sizes.
        ranks: per-level number of CP components (= output features).
        kernel: "fused" evaluates each level with the fused Pallas kernel
            (:func:`~nerfacc_tpu.ops.cp_level.cp_level_encode` — hat tiles
            generated in VMEM on both passes), "xla" uses the batched-dot
            XLA path.  Measured on the v5e: XLA wins (1.96 vs 2.54 ms fwd
            at the top level — the VPU hat generation dominates and XLA
            schedules it as well as Mosaic while overlapping HBM better),
            so "auto" currently resolves to "xla" everywhere; the kernel is
            kept as a measured reference point for future Mosaic work.
        use_pallas: legacy alias — True forces the per-axis
            :func:`~nerfacc_tpu.ops.hat_matmul.hat_interp_matmul` kernel
            (superseded by ``kernel="fused"``).
    """

    resolutions: Sequence[int] = (32, 128, 512)
    ranks: Sequence[int] = (32, 32, 32)
    compute_dtype: Any = jnp.bfloat16
    kernel: str = "auto"
    use_pallas: bool = False
    # Block-decomposed levels: for R >= block_min_res, split the R-point hat
    # dot into a one-hot block-select dot (N, R/bs) @ (R/bs, (bs+1)*rank)
    # followed by a local (bs+1)-point hat contraction.  Exact (the hat row's
    # two nonzeros never cross an overlapped block boundary) and it shrinks
    # the materialized per-level intermediates from N*(R+rank) to
    # N*(R/bs + (bs+1)*rank) — the top level's (3, N, 512) bf16 hat tensor
    # (~800 MB/step at N=2^18) is the single largest HBM stream in the field
    # block.  block_size=0 disables (dense hat dot everywhere).
    # Default 0 (dense hat dot — the round-2 validated operating point)
    # until the block path is measured on-chip.
    block_size: int = 0
    block_min_res: int = 256
    # Autodiff-residual policy for each level's encode:
    #   "none" — plain autodiff: XLA saves the (3, N, R) bf16 hat tensor as
    #       a residual and re-reads it in the backward dline dot — at the
    #       top level that is the single largest HBM stream in the field
    #       block (~800 MB/step at N=2^18).
    #   "dots" — jax.checkpoint(policy=dots_saveable): save only the
    #       (3, N, rank) dot outputs; the hat weights are rematerialized in
    #       the backward, where the iota-compare generation fuses into the
    #       transposed dot operand (same fusion XLA applies to one-hot
    #       spreads — see PERF.md cost model).  Trades ~N*R cheap VPU flops
    #       for the full hat-tensor round trip.
    #   "full" — jax.checkpoint with the default (save-nothing) policy:
    #       measured SLOWER end-to-end in round 2 (17.7M vs 18.2M
    #       samples/s) because the dots themselves are also re-run; kept as
    #       a measured reference point.
    remat: str = "none"
    # Tri-plane (K-Planes) levels — the expressiveness tier ABOVE the CP
    # line products (PERF.md "CP vs hash" verdict: the gap to the hash field
    # is the separable-line factorization, and a tri-plane closes it).  A
    # bilinear plane lookup is normally a 4-neighbor 2-D gather — infeasible
    # at speed on this memory system — but at plane resolutions <= ~128 it
    # is exactly a dense chain the MXU eats: ``hat_u @ P.reshape(R, R*rank)``
    # (one (N, R) x (R, R*rank) matmul) followed by a local v-contraction
    # against ``hat_v`` (VPU elementwise-reduce that fuses into the matmul
    # epilogue).  Zero gathers, exact bilinear semantics.  Per K-Planes the
    # three plane features (xy, xz, yz) combine multiplicatively and are
    # concatenated after the line levels.  Empty = pure CP (the default).
    # Fused-levels mode: evaluate ALL line levels with ONE batched dot
    # against a block-diagonal (3, sum(R), sum(rank)) table instead of one
    # dot per level.  3x the MXU flops (the off-diagonal blocks are zeros)
    # but one pass over the hat stream, a 96-lane output tile instead of
    # three rank-32 tiles (the round-4 verdict's "MXU output starvation"),
    # and one fused product/backward instead of three.  Measured on-chip
    # before shipping — see PERF.md round-5 notes.
    fused_levels: bool = False
    plane_resolutions: Sequence[int] = ()
    plane_ranks: Sequence[int] = ()
    # How a plane level's three plane features combine:
    #   "product" — Hadamard of the (xy, xz, yz) features (K-Planes style;
    #       rank outputs per level).
    #   "vm" — TensoRF's vector-matrix decomposition: each plane feature
    #       multiplies a 1-D line feature of its COMPLEMENTARY axis
    #       (xy*z, xz*y, yz*x) and the three products are CONCATENATED
    #       (3*rank outputs per level).  Additive mixing across components
    #       happens in the MLP — a linear composition that optimizes more
    #       easily than the triple product (TensoRF paper, Sec. 4).
    plane_mode: str = "product"

    @property
    def output_dim(self) -> int:
        per_plane = 3 if self.plane_mode == "vm" else 1
        return int(sum(self.ranks)) + per_plane * int(sum(self.plane_ranks))

    def init(self, key: jax.Array) -> Dict:
        lines = []
        for lvl, (R, rank) in enumerate(zip(self.resolutions, self.ranks)):
            key, sub = jax.random.split(key)
            # multiplicative decomposition: init near 1 so products start
            # smooth and gradients flow (K-Planes-style init).
            lines.append(
                1.0
                + 0.1
                * jax.random.normal(sub, (3, R, rank), jnp.float32)
            )
        params = {"lines": lines}
        if self.plane_resolutions:
            planes, plines = [], []
            for R, rank in zip(self.plane_resolutions, self.plane_ranks):
                key, sub = jax.random.split(key)
                planes.append(
                    1.0
                    + 0.1
                    * jax.random.normal(sub, (3, R, R, rank), jnp.float32)
                )
                if self.plane_mode == "vm":
                    key, sub = jax.random.split(key)
                    # complementary-axis line per plane (z, y, x), same R
                    plines.append(
                        1.0
                        + 0.1
                        * jax.random.normal(sub, (3, R, rank), jnp.float32)
                    )
            params["planes"] = planes
            if self.plane_mode == "vm":
                params["plane_lines"] = plines
        return params

    def __call__(self, params: Dict, x: jnp.ndarray) -> jnp.ndarray:
        """Encode points.

        Args:
            x: (N, 3) in [0, 1]^3 (clamped).

        Returns:
            (N, sum(ranks)) features.
        """
        # NOTE on remat: full jax.checkpoint (save-nothing) was measured
        # SLOWER end-to-end (17.7M vs 18.2M samples/s); the selective
        # ``remat="dots"`` policy (save dot outputs, remat only the hat
        # weights) is the one that targets the residual HBM stream.
        x = jnp.clip(x, 0.0, 1.0)
        kernel = self.kernel
        if kernel == "auto":
            kernel = "xla"
        feats = []
        if self.fused_levels and kernel == "xla" and not self.use_pallas:
            fn = self._fused_levels_encode
            if self.remat == "dots":
                fn = jax.checkpoint(
                    fn, policy=jax.checkpoint_policies.dots_saveable
                )
            elif self.remat == "full":
                fn = jax.checkpoint(fn)
            feats.append(fn(x, params["lines"]))
        else:
            for R, line in zip(self.resolutions, params["lines"]):
                fn = functools.partial(
                    self._level_encode, R=R, kernel=kernel
                )
                if self.remat == "dots":
                    fn = jax.checkpoint(
                        fn, policy=jax.checkpoint_policies.dots_saveable
                    )
                elif self.remat == "full":
                    fn = jax.checkpoint(fn)
                feats.append(fn(x, line))
        plines = params.get("plane_lines", [None] * len(self.plane_resolutions))
        for R, plane, pline in zip(
            self.plane_resolutions, params.get("planes", ()), plines
        ):
            fn = functools.partial(self._plane_level_encode, R=R)
            if self.remat == "dots":
                fn = jax.checkpoint(
                    fn, policy=jax.checkpoint_policies.dots_saveable
                )
            elif self.remat == "full":
                fn = jax.checkpoint(fn)
            if self.plane_mode == "vm":
                feats.append(fn(x, plane, pline))
            else:
                feats.append(fn(x, plane))
        return jnp.concatenate(feats, axis=-1)

    def param_regularizer(self, params: Dict) -> jnp.ndarray:
        """Total-variation regularizer over the grid tables (K-Planes-style
        smoothness prior): mean squared adjacent-difference along each grid
        axis of every line and plane table.  Pure elementwise work on the
        (small) tables — negligible cost next to the encode."""
        terms = []
        for line in params["lines"]:
            d = line[:, 1:, :] - line[:, :-1, :]
            terms.append(jnp.mean(d * d))
        for plane in params.get("planes", ()):
            du = plane[:, 1:, :, :] - plane[:, :-1, :, :]
            dv = plane[:, :, 1:, :] - plane[:, :, :-1, :]
            terms.append(jnp.mean(du * du) + jnp.mean(dv * dv))
        for pline in params.get("plane_lines", ()):
            d = pline[:, 1:, :] - pline[:, :-1, :]
            terms.append(jnp.mean(d * d))
        return sum(terms)

    def _plane_level_encode(self, x, plane, pline=None, *, R: int) -> jnp.ndarray:
        """One tri-plane level.

        ``plane`` is (3, R, R, rank) for the (xy, xz, yz) planes.  Bilinear
        interpolation of plane ``p`` at (u, v) is the separable chain
        ``hat_u @ P_p @ hat_v`` — evaluated as one (N, R) x (R, R*rank)
        MXU matmul and a (N, R, rank) * (N, R, 1) sum-reduce, not gathers.

        plane_mode="product": Hadamard of the three plane features (rank
        outputs).  plane_mode="vm" (``pline`` (3, R, rank) given): TensoRF
        VM — each plane feature times its complementary-axis line feature
        (xy*z, xz*y, yz*x), concatenated (3*rank outputs).
        """
        rank = plane.shape[-1]
        cd = self.compute_dtype
        pairs = ((0, 1), (0, 2), (1, 2))  # xy, xz, yz
        pos = x.T * (R - 1)  # (3, N)
        grid = jnp.arange(R, dtype=x.dtype)
        hat = jnp.maximum(
            0.0, 1.0 - jnp.abs(pos[:, :, None] - grid[None, None, :])
        ).astype(cd)  # (3, N, R) — per AXIS, reused across planes
        hat_u = jnp.stack([hat[a] for a, _ in pairs])  # (3, N, R)
        tbl = plane.astype(cd).reshape(3, R, R * rank)
        t = jax.lax.dot_general(
            hat_u,
            tbl,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=cd,
        ).reshape(3, -1, R, rank)  # (3, N, R, rank)
        hat_v = jnp.stack([hat[b] for _, b in pairs])  # (3, N, R)
        f = jnp.sum(t * hat_v[..., None], axis=2)  # (3, N, rank)
        if pline is not None:
            # complementary axes of (xy, xz, yz) = (z, y, x)
            hat_w = jnp.stack([hat[2], hat[1], hat[0]])  # (3, N, R)
            lf = jax.lax.dot_general(
                hat_w,
                pline.astype(cd),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=cd,
            )  # (3, N, rank)
            vm = f * lf  # (3, N, rank)
            return jnp.concatenate(
                [vm[0], vm[1], vm[2]], axis=-1
            ).astype(jnp.float32)
        return (f[0] * f[1] * f[2]).astype(jnp.float32)

    def _fused_levels_encode(self, x, lines) -> jnp.ndarray:
        """All line levels in ONE batched dot against a block-diagonal
        table (see ``fused_levels``).  Exact: the zero off-diagonal blocks
        contribute nothing, so each rank column sees only its own level's
        hat columns — identical math to the per-level dots, concatenated."""
        cd = self.compute_dtype
        hats = []
        for R in self.resolutions:
            pos = x.T * (R - 1)  # (3, N)
            grid = jnp.arange(R, dtype=x.dtype)
            hats.append(
                jnp.maximum(
                    0.0, 1.0 - jnp.abs(pos[:, :, None] - grid[None, None, :])
                ).astype(cd)
            )
        w_all = jnp.concatenate(hats, axis=-1)  # (3, N, sum(R))
        R_tot = sum(self.resolutions)
        rank_tot = sum(line.shape[-1] for line in lines)
        tbl = jnp.zeros((3, R_tot, rank_tot), cd)
        r0 = c0 = 0
        for line in lines:
            R, rank = line.shape[1], line.shape[2]
            tbl = jax.lax.dynamic_update_slice(
                tbl, line.astype(cd), (0, r0, c0)
            )
            r0 += R
            c0 += rank
        a = jax.lax.dot_general(
            w_all, tbl, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=cd,
        )  # (3, N, rank_tot)
        return (a[0] * a[1] * a[2]).astype(jnp.float32)

    def _level_encode(self, x, line, *, R: int, kernel: str) -> jnp.ndarray:
        """One level's CP product (N, rank) — see ``__call__``."""
        # rank from the param (not the config): under tensor parallelism
        # each shard holds a rank-slice of every level's line table
        rank = line.shape[-1]
        if kernel == "fused" and not self.use_pallas:
            from ..ops.cp_level import cp_level_encode

            return cp_level_encode(x, line)
        if self.use_pallas:
            from ..ops import hat_interp_matmul

            prod = None
            for axis in range(3):
                a = hat_interp_matmul(x[:, axis], line[axis])
                prod = a if prod is None else prod * a
            return prod
        if (
            self.block_size
            and R >= self.block_min_res
            and R % self.block_size == 0
        ):
            return self._block_level(x, line, R, rank)
        # one batched (3, N, R) @ (3, R, rank) dot per level instead
        # of three separate dots — fewer kernel launches, same MXU
        # work (launch overhead is ~0.1-0.2 ms each on this chip)
        pos = x.T * (R - 1)  # (3, N)
        grid = jnp.arange(R, dtype=x.dtype)
        w = jnp.maximum(
            0.0, 1.0 - jnp.abs(pos[:, :, None] - grid[None, None, :])
        ).astype(self.compute_dtype)  # (3, N, R)
        a = jax.lax.dot_general(
            w,
            line.astype(self.compute_dtype),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=self.compute_dtype,
        )  # (3, N, rank)
        return (a[0] * a[1] * a[2]).astype(jnp.float32)

    def _block_level(
        self, x: jnp.ndarray, line: jnp.ndarray, R: int, rank: int
    ) -> jnp.ndarray:
        """Block-decomposed level encode (see ``block_size``).

        Grid row ``i = bs*j + k``; the overlapped block table carries rows
        ``bs*j .. bs*j + bs`` so the hat pair (floor/ceil of the position)
        always lives inside block ``j = floor(pos / bs)``.
        """
        bs = self.block_size
        nb = R // bs
        n = x.shape[0]
        cd = self.compute_dtype
        pad = jnp.concatenate([line, jnp.zeros_like(line[:, :1])], axis=1)
        idx = jnp.arange(nb)[:, None] * bs + jnp.arange(bs + 1)[None, :]
        tbl = pad[:, idx].reshape(3, nb, (bs + 1) * rank).astype(cd)
        pos = x.T * (R - 1)  # (3, N)
        j = jnp.clip((pos // bs).astype(jnp.int32), 0, nb - 1)
        local = pos - j.astype(pos.dtype) * bs  # in [0, bs]
        onehot = (j[:, :, None] == jnp.arange(nb, dtype=jnp.int32)).astype(cd)
        bf = jax.lax.dot_general(
            onehot, tbl, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=cd,
        ).reshape(3, n, bs + 1, rank)
        grid_l = jnp.arange(bs + 1, dtype=x.dtype)
        hat = jnp.maximum(
            0.0, 1.0 - jnp.abs(local[:, :, None] - grid_l[None, None, :])
        ).astype(cd)  # (3, N, bs+1)
        a = jnp.sum(bf * hat[..., None], axis=2)  # (3, N, rank)
        return (a[0] * a[1] * a[2]).astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class CPRadianceField:
    """Radiance field with CP-factorized grid features + small MLPs.

    Drop-in replacement for :class:`NGPRadianceField` (same interface) with
    an all-matmul compute path.  ``density = trunc_exp(raw - 1)``.
    """

    aabb: Tuple[float, ...]
    num_dim: int = 3
    use_viewdirs: bool = True
    unbounded: bool = False
    # (64,256,1024)x(32,32,64) gave +2.4 dB on a small 12-view scene but
    # regressed ~0.6 dB on the 24-view benchmark scene — capacity/resolution
    # is scene-dependent; these defaults won on the benchmark config.
    resolutions: Sequence[int] = (32, 128, 512)
    ranks: Sequence[int] = (32, 32, 32)
    # Tri-plane levels appended to the line levels (K-Planes hybrid — see
    # CPGridEncoder.plane_resolutions).  Empty = pure CP (bench default);
    # the quality configs add e.g. plane_resolutions=(64,), plane_ranks=(16,).
    plane_resolutions: Sequence[int] = ()
    plane_ranks: Sequence[int] = ()
    plane_mode: str = "product"  # see CPGridEncoder.plane_mode
    geo_feat_dim: int = 15
    hidden_dim: int = 64
    compute_dtype: Any = jnp.bfloat16
    # Tensor parallelism: mesh axis name over which the line tables' rank
    # dim and the first base-MLP layer's rows are sharded (see parallel/tp.py).
    # None = single-shard semantics.
    tp_axis: Optional[str] = None
    # Residual policy for the encoder levels (see CPGridEncoder.remat).
    encoder_remat: str = "none"
    # One block-diagonal dot for all line levels (see
    # CPGridEncoder.fused_levels).
    fused_levels: bool = False

    def __post_init__(self):
        if self.plane_resolutions:
            # TP shards the line tables' rank dim; plane sharding is not
            # wired yet — keep the combination explicit rather than silent.
            assert self.tp_axis is None, "tri-plane levels + TP not supported"
        object.__setattr__(
            self,
            "encoder",
            CPGridEncoder(
                resolutions=tuple(self.resolutions),
                ranks=tuple(self.ranks),
                compute_dtype=self.compute_dtype,
                remat=self.encoder_remat,
                fused_levels=self.fused_levels,
                plane_resolutions=tuple(self.plane_resolutions),
                plane_ranks=tuple(self.plane_ranks),
                plane_mode=self.plane_mode,
            ),
        )

    @property
    def max_eval_chunk(self) -> int:
        """Occupancy-update eval chunk bound (see update_occ_grid): each
        tri-plane level's encode materializes a (3, N, R*rank) bf16 dot
        output — at the dense refresh's whole-grid N (2M cells for 128^3)
        that is tens of GB.  Cap the chunk so the intermediate stays
        ~<=1.5 GB; pure-line configs keep the whole-grid chunk."""
        per = sum(
            R * r
            for R, r in zip(self.plane_resolutions, self.plane_ranks)
        )
        if per == 0:
            return 2**21
        cap = max(2**12, int(2.5e8) // per)
        return 1 << (cap.bit_length() - 1)

    def _aabb(self) -> jnp.ndarray:
        return jnp.asarray(self.aabb, jnp.float32)

    def init(self, key: jax.Array) -> Dict:
        k1, k2, k3 = jax.random.split(key, 3)
        params = {
            "encoder": self.encoder.init(k1),
            "mlp_base": _mlp_init(
                k2,
                [
                    self.encoder.output_dim,
                    self.hidden_dim,
                    1 + self.geo_feat_dim,
                ],
            ),
        }
        head_in = (16 if self.use_viewdirs else 0) + self.geo_feat_dim
        params["mlp_head"] = _mlp_init(
            k3, [head_in, self.hidden_dim, self.hidden_dim, 3]
        )
        return params

    def _normalize(self, x: jnp.ndarray):
        aabb = self._aabb()
        if self.unbounded:
            u = contract_to_unisphere(x, aabb)
            selector = jnp.ones(x.shape[:-1], bool)
        else:
            lo, hi = aabb[:3], aabb[3:]
            u = (x - lo) / (hi - lo)
            selector = ((u > 0.0) & (u < 1.0)).all(axis=-1)
        return u, selector

    def query_density(self, params, x, return_feat: bool = False):
        u, selector = self._normalize(x)
        feats = self.encoder(params["encoder"], u)
        h = _mlp_apply_tp(
            params["mlp_base"], feats, self.compute_dtype, self.tp_axis
        )
        raw_density, geo_feat = h[..., :1], h[..., 1:]
        density = trunc_exp(raw_density - 1.0) * selector[..., None]
        if return_feat:
            return density, geo_feat
        return density

    def _query_rgb(self, params, dirs, embedding, apply_act: bool = True):
        if self.use_viewdirs:
            d = spherical_harmonics_16(dirs)
            h = jnp.concatenate([d, embedding], axis=-1)
        else:
            h = embedding
        rgb = _mlp_apply(params["mlp_head"], h, self.compute_dtype)
        if apply_act:
            rgb = jax.nn.sigmoid(rgb)
        return rgb

    def query_opacity(self, params, x, step_size: float):
        return self.query_density(params, x) * step_size

    def param_regularizer(self, params) -> jnp.ndarray:
        """TV smoothness over the encoder tables (see
        :meth:`CPGridEncoder.param_regularizer`); wire via the trainer's
        ``field_reg_weight``."""
        return self.encoder.param_regularizer(params["encoder"])

    def __call__(self, params, positions, directions=None):
        density, embedding = self.query_density(
            params, positions, return_feat=True
        )
        rgb = self._query_rgb(params, directions, embedding)
        return rgb, density


@dataclasses.dataclass(frozen=True)
class TensoRFRadianceField(CPRadianceField):
    """TensoRF-VM configuration of the factorized field.

    The reference benchmarks nerfacc with TensoRF (reference:
    docs/source/examples/static/tensorf.rst:11-30 — NeRF-Synthetic mean
    PSNR 32.52 @ 425 s; the model code lives in an external submodule).
    TensoRF's VM (vector-matrix) decomposition is exactly this module's
    line levels + tri-plane levels: each VM component is a plane feature
    times the complementary axis line.  This subclass just names the
    family and defaults to a VM-style configuration (matched line/plane
    levels); the compute path — bilinear planes and hat-line lookups as
    dense MXU matmul chains, zero gathers — is `CPGridEncoder`.
    """

    resolutions: Sequence[int] = (64, 192)
    ranks: Sequence[int] = (32, 32)
    plane_resolutions: Sequence[int] = (64, 128)
    plane_ranks: Sequence[int] = (16, 16)


@dataclasses.dataclass(frozen=True)
class CPDensityField:
    """Density-only CP field for proposal resampling — the all-matmul
    analog of :class:`NGPDensityField` (reference: ngp.py:220-286)."""

    aabb: Tuple[float, ...]
    unbounded: bool = False
    resolutions: Sequence[int] = (16, 64)
    ranks: Sequence[int] = (16, 16)
    hidden_dim: int = 64
    compute_dtype: Any = jnp.bfloat16
    tp_axis: Optional[str] = None
    encoder_remat: str = "none"

    def __post_init__(self):
        object.__setattr__(
            self,
            "encoder",
            CPGridEncoder(
                resolutions=tuple(self.resolutions),
                ranks=tuple(self.ranks),
                compute_dtype=self.compute_dtype,
                remat=self.encoder_remat,
            ),
        )

    def init(self, key: jax.Array) -> Dict:
        k1, k2 = jax.random.split(key)
        return {
            "encoder": self.encoder.init(k1),
            "mlp_base": _mlp_init(
                k2, [self.encoder.output_dim, self.hidden_dim, 1]
            ),
        }

    def __call__(self, params: Dict, positions: jnp.ndarray) -> jnp.ndarray:
        aabb = jnp.asarray(self.aabb, jnp.float32)
        if self.unbounded:
            u = contract_to_unisphere(positions, aabb)
            selector = jnp.ones(positions.shape[:-1], bool)
        else:
            lo, hi = aabb[:3], aabb[3:]
            u = (positions - lo) / (hi - lo)
            selector = ((u > 0.0) & (u < 1.0)).all(axis=-1)
        feats = self.encoder(params["encoder"], u)
        raw = _mlp_apply_tp(
            params["mlp_base"], feats, self.compute_dtype, self.tp_axis
        )
        return trunc_exp(raw - 1.0) * selector[..., None]
