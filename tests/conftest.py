"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Unlike the reference's tests (which hard-require cuda:0, see
reference tests/test_scan.py:4), this suite runs anywhere — CPU CI included —
while still exercising the multi-device sharding paths via
``xla_force_host_platform_device_count``.

NOTE: the environment may preset ``JAX_PLATFORMS`` to a remote-compile
accelerator backend AND register that backend from a ``sitecustomize`` hook
at interpreter boot (before pytest imports this file).  Assigning the env var
here is therefore NOT enough — ``jax.config.update("jax_platforms", "cpu")``
after import is what actually forces the CPU platform; otherwise every test
compile round-trips through the remote service and queues behind training
jobs.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is compile-bound (165 tests,
# many structurally-identical trainer/step programs built from distinct
# jitted closures — the in-process jit cache cannot dedupe those, the
# HLO-keyed persistent cache can).  Measured: a warm cache runs the
# heaviest trainer test 20.6 s -> 6.4 s; cold runs still dedupe repeats
# within the run.  Override the location with JAX_COMPILATION_CACHE_DIR.
_cache_dir = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.expanduser("~"), ".cache", "nerfacc_tpu_test_xla"
    ),
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
