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
