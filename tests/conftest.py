"""Test configuration: run everything on CPU with an 8-device virtual mesh.

Multi-chip sharding paths are validated without a pod by forcing the host
platform to expose 8 virtual devices (the same mechanism the driver uses for
`dryrun_multichip`).  Must run before jax is imported anywhere — and must
OVERRIDE the environment's JAX_PLATFORMS=axon (the TPU tunnel), otherwise
every tiny test op round-trips to the remote chip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Default to the native host runtime for protocol tests (fast, exact);
# JAX-kernel equivalence is covered explicitly by test_jax_kernels.py.
os.environ.setdefault("PLONKISH_TPU_BACKEND", "cpp")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "target/jax_cache_cpu",
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
