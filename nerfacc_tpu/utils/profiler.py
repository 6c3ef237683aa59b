"""Profiling helpers.

TPU-native analog of the reference's profiling tooling (reference:
scripts/run_profiler.py wraps torch.profiler; docs/source/methodology/
coding.rst teaches CUDA_LAUNCH_BLOCKING methodology).  Here: a
``jax.profiler`` trace context plus a dependency-chained timing harness that
gives honest device timings despite async dispatch — the JAX analog of the
reference's "avoid CPU-GPU sync" guidance is "block_until_ready only at
measurement boundaries".
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/nerfacc_tpu_trace"):
    """Capture a ``jax.profiler`` device trace around a code block.

    View with TensorBoard's profile plugin or xprof.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def benchmark(
    fn: Callable,
    *args,
    iters: int = 10,
    warmup: int = 2,
    **kwargs,
) -> Dict[str, float]:
    """Wall-clock a jitted callable with proper device synchronization.

    Returns dict with ``mean_ms`` and ``total_s``.  Note: on a tunneled
    accelerator each dispatch carries fixed host overhead (~10 ms); chain
    work inside one jit (e.g. ``lax.scan``) to measure compute alone.
    """
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    total = time.time() - t0
    return {"mean_ms": total / iters * 1000.0, "total_s": total}
