"""Test configuration: force a hermetic 8-device CPU mesh.

Multi-chip sharding is tested on virtual CPU devices
(xla_force_host_platform_device_count), a capability the single-GPU
reference could not have (SURVEY.md §4). Pallas kernels run in interpret
mode on CPU; the real-TPU compile path is exercised by bench.py and
__graft_entry__.py on hardware.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: compiles dominate test wall-time on this host.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
