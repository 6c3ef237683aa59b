from .rendering import (
    compact_samples,
    render_image_with_occgrid,
    render_rays_occgrid_test,
    render_rays_with_occgrid,
)

__all__ = [
    "compact_samples",
    "render_image_with_occgrid",
    "render_rays_occgrid_test",
    "render_rays_with_occgrid",
]
