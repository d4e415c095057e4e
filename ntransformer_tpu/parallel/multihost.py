"""Multi-host bring-up: jax.distributed + mesh construction.

The reference is a single-process, single-GPU engine (SURVEY §2.14); the
TPU build's north star adds multi-chip and multi-host serving. This module
is the process-level entry: initialize the JAX distributed runtime, then
build a (dp, tp) mesh in which the TP axis stays INSIDE each host's ICI
domain (tensor-parallel collectives every layer must ride ICI; the DP axis
crosses hosts over DCN only at batch boundaries — the bandwidth hierarchy
of SURVEY §5.8).

Typical multi-host launch (same command on every host of a slice):

    python -c "
    from ntransformer_tpu.parallel.multihost import initialize, make_mesh
    initialize()                      # TPU slices: args auto-detected
    mesh = make_mesh(tp=4)            # 4-way TP inside each host, DP across
    ..."

On a TPU pod slice, `jax.distributed.initialize()` needs no arguments (the
TPU runtime provides coordinator/process ids); on CPU/GPU clusters pass
coordinator_address/num_processes/process_id explicitly.
"""
from __future__ import annotations

import numpy as np

DP_AXIS = "dp"
TP_AXIS = "tp"  # must match parallel.tp.TP_AXIS


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the JAX distributed runtime (no-op if already initialized)."""
    import jax
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise


def make_mesh(tp: int | None = None, dp: int | None = None):
    """(dp, tp) mesh, TP innermost so each TP group is ICI-contiguous
    (device order groups a host's chips together). With only one axis
    given the other is inferred to cover ALL devices; with both given
    explicitly the mesh may use a leading subset (dp*tp <= n)."""
    import jax
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    n = devices.size
    explicit = tp is not None and dp is not None
    if tp is None:
        tp = min(n, max(1, jax.local_device_count()))
    if dp is None:
        dp = n // tp
    if explicit:
        assert dp * tp <= n, f"dp({dp}) * tp({tp}) > n_devices({n})"
        if dp * tp < n and jax.process_count() > 1:
            # a leading subset can exclude EVERY device of some process —
            # that process would then drive a mesh it is not in (hangs or
            # 'devices not addressable'); multi-process meshes must cover
            # the full device set so all participants stay lock-step
            raise ValueError(
                f"dp({dp}) * tp({tp}) covers only {dp * tp} of {n} devices "
                f"across {jax.process_count()} processes; multi-process "
                "meshes must use all devices (pick dp*tp == n)")
        devices = devices[: dp * tp]
    else:
        assert dp * tp == n, f"dp({dp}) * tp({tp}) != n_devices({n})"
    if dp == 1:
        return Mesh(devices.reshape(tp), (TP_AXIS,))
    return Mesh(devices.reshape(dp, tp), (DP_AXIS, TP_AXIS))
