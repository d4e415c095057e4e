"""Test configuration: force a hermetic 8-device CPU mesh.

Multi-chip sharding is tested on virtual CPU devices
(xla_force_host_platform_device_count), a capability the single-GPU
reference could not have (SURVEY.md §4). Pallas kernels run in interpret
mode on CPU; the real-TPU compile path is exercised by bench.py and
__graft_entry__.py on hardware.
"""
import os

# The shell presets JAX_PLATFORMS=axon (the real-TPU tunnel) and the axon
# sitecustomize imports jax before conftest runs, so the env var alone is
# ignored — force the platform through jax.config as well.
# NT_TPU_TESTS=1 keeps the real TPU visible (tests/test_tpu_kernels.py, the
# compiled-Mosaic parity smoke tests) — everything else still runs CPU-side
# because those tests pin devices explicitly.
_TPU_TESTS = bool(os.environ.get("NT_TPU_TESTS"))
if not _TPU_TESTS:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: compiles dominate test wall-time on this host.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

if not _TPU_TESTS:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
