import os


def setup_compilation_cache(path: str = None) -> None:
    """Enable JAX's persistent compilation cache.

    The fused train step takes minutes to compile; caching it across
    processes removes that from every run's wall clock.  Called by the
    example trainers and bench.
    """
    import jax

    path = path or os.environ.get(
        "NERFACC_TPU_CACHE", os.path.expanduser("~/.nerfacc_tpu_jax_cache")
    )
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


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
    "setup_compilation_cache",
]
