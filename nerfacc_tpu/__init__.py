"""nerfacc_tpu: TPU-native NeRF acceleration toolbox (JAX / XLA / Pallas).

A ground-up rebuild of the capabilities of ``nerfacc``
(reference: nerfacc/__init__.py:26-56 for the public API surface) designed
for TPU: static-shape padded sample buffers with validity masks, XLA-fused
volume rendering, fully-parallel lattice-based grid traversal, and
``jax.sharding`` data parallelism.
"""

from .data_specs import RayIntervals, RaySamples
from .estimators.base import AbstractEstimator
from .estimators.occ_grid import OccGridEstimator
from .estimators.prop_net import (
    PropNetEstimator,
    get_proposal_requires_grad_fn,
)
from .estimators.sparse_grid import (
    N3TreeEstimator,
    SparseGrid,
    SparseGridEstimator,
    VDBEstimator,
    sparse_grid_from_dense,
    sparse_grid_from_ijk,
    traverse_vdbs,
)
from .grid import (
    ray_aabb_intersect,
    traverse_grids,
    traverse_grids_padded,
    traverse_grids_pooled,
    traverse_grids_voxel,
    TraversalResult,
    WindowSamples,
)
from .losses import distortion
from .cameras import (
    opencv_lens_undistortion,
    opencv_lens_undistortion_fisheye,
)
from .pack import pack_info
from .pdf import importance_sampling, searchsorted
from .scan import exclusive_prod, exclusive_sum, inclusive_prod, inclusive_sum
from .volrend import (
    accumulate_along_rays,
    accumulate_along_rays_,
    render_transmittance_from_alpha,
    render_transmittance_from_density,
    render_visibility_from_alpha,
    render_visibility_from_density,
    render_weight_from_alpha,
    render_weight_from_density,
    rendering,
)

__version__ = "0.1.0"

__all__ = [
    "__version__",
    # data specs
    "RayIntervals",
    "RaySamples",
    # estimators
    "AbstractEstimator",
    "OccGridEstimator",
    "PropNetEstimator",
    "get_proposal_requires_grad_fn",
    "SparseGrid",
    "SparseGridEstimator",
    "VDBEstimator",
    "N3TreeEstimator",
    "sparse_grid_from_dense",
    "sparse_grid_from_ijk",
    "traverse_vdbs",
    # grid
    "ray_aabb_intersect",
    "traverse_grids",
    "traverse_grids_padded",
    "traverse_grids_pooled",
    "traverse_grids_voxel",
    "TraversalResult",
    "WindowSamples",
    # losses
    "distortion",
    # cameras
    "opencv_lens_undistortion",
    "opencv_lens_undistortion_fisheye",
    # pack
    "pack_info",
    # pdf
    "importance_sampling",
    "searchsorted",
    # scan
    "exclusive_prod",
    "exclusive_sum",
    "inclusive_prod",
    "inclusive_sum",
    # volrend
    "accumulate_along_rays",
    "accumulate_along_rays_",
    "render_transmittance_from_alpha",
    "render_transmittance_from_density",
    "render_visibility_from_alpha",
    "render_visibility_from_density",
    "render_weight_from_alpha",
    "render_weight_from_density",
    "rendering",
]
