"""Data-parallel (and DP×TP) sharding of the batched decode step — the
multi-chip serving path of the continuous-batching server.

Sharding plan over a (dp[, tp]) mesh (parallel/multihost.make_mesh):
  batch slots     : sharded over dp — each dp group serves B/dp sequences
                    with zero cross-group communication;
  weights         : replicated over dp; megatron TP over tp (parallel/tp.py
                    column/row-parallel quant planes);
  batched KV      : [L, B, Hkv, S, D] → P(None, dp, tp, None, None);
  tokens/pos/act  : P(dp);
  logits          : P(dp, None) — full vocab per sequence on its dp group.

Collectives: none on the dp axis (batch rows are independent); the usual
2 psums/layer + embed all-gather + logits psum on tp. Everything rides ICI
when tp stays inside a host and dp crosses hosts (SURVEY §5.8 hierarchy).

Built with shard_map (explicit specs), not GSPMD auto-partitioning —
required because Pallas kernels carry no partitioning rules.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import warnings

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.batched import BatchedKV, batched_decode_body
from ..models.llama import Arch, ModelWeights
from .multihost import DP_AXIS
from .tp import TP_AXIS, local_arch, weight_specs


def _specs(mesh: Mesh, weights_template: ModelWeights, quant: bool = False):
    has_tp = TP_AXIS in mesh.axis_names
    # tp-only meshes (dp=1, e.g. --serve --tp N) have no dp axis: batch
    # stays whole, everything else still megatron-shards
    dp_ax = DP_AXIS if DP_AXIS in mesh.axis_names else None
    cache = P(None, dp_ax, TP_AXIS if has_tp else None, None, None)
    # int8 scales are [L, B, Hkv, S] (S minor) — same leading axes
    sc = P(None, dp_ax, TP_AXIS if has_tp else None, None) if quant else None
    kv_spec = BatchedKV(cache, cache, sc, sc)
    if has_tp:
        wspecs = weight_specs(weights_template)
    else:
        wspecs = jax.tree.map(lambda _: P(), weights_template)
    return wspecs, kv_spec, has_tp


def shard_server_state(mesh: Mesh, arch: Arch, weights: ModelWeights,
                       batch: int, quant: bool = False,
                       with_kv: bool = True
                       ) -> tuple[ModelWeights, BatchedKV | None]:
    """Place replicated/TP-sharded weights and (with_kv) a dp-sharded
    batched KV, created ON device with the sharding pinned.

    Weight placement goes through make_array_from_callback so it also
    works on a multi-PROCESS mesh (jax.distributed): every process holds
    the same host-side weights and contributes its addressable shards —
    device_put to a sharding spanning non-addressable devices would
    fail. Single-process behavior is identical. Callers that build their
    own cache (BatchServer has a jitted creator) pass with_kv=False so a
    multi-GB batched cache isn't allocated just to be dropped."""
    wspecs, kv_spec, _ = _specs(mesh, weights, quant)

    def place(x, s):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, NamedSharding(mesh, s), lambda idx: x[idx])
    w = jax.tree.map(place, weights, wspecs)
    if not with_kv:
        return w, None
    kv_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), kv_spec,
                         is_leaf=lambda x: isinstance(x, P))
    kv = jax.jit(lambda: BatchedKV.create(arch, batch, quant=quant),
                 out_shardings=kv_sh)()
    return w, kv


def make_batched_decode_sharded(mesh: Mesh, arch: Arch,
                                weights_template: ModelWeights,
                                quant: bool = False):
    """jitted (weights, kv, tokens, pos, active) → (logits, kv) running
    under shard_map on the mesh. Batch size must divide dp."""
    wspecs, kv_spec, has_tp = _specs(mesh, weights_template, quant)
    arch_l = local_arch(arch, mesh.shape[TP_AXIS]) if has_tp else arch
    vec = P(DP_AXIS) if DP_AXIS in mesh.axis_names else P(None)

    def body(weights, kv, tokens, pos, active):
        return batched_decode_body(
            arch_l, weights, kv, tokens, pos, active,
            tp_axis=TP_AXIS if has_tp else None)

    dp_ax = DP_AXIS if DP_AXIS in mesh.axis_names else None
    f = shard_map(body, mesh=mesh,
                  in_specs=(wspecs, kv_spec, vec, vec, vec),
                  out_specs=(P(dp_ax, None), kv_spec),
                  check_rep=False)
    return jax.jit(f, donate_argnums=(1,))


def make_batched_draft_sharded(mesh: Mesh, arch: Arch,
                               weights_template: ModelWeights,
                               quant: bool = False,
                               n_layers: int | None = None):
    """Sharded resident-prefix DRAFT step (speculative serving on a dp/tp
    mesh): batched_decode_body limited to the first n_layers."""
    from ..models.batched import batched_decode_body
    wspecs, kv_spec, has_tp = _specs(mesh, weights_template, quant)
    arch_l = local_arch(arch, mesh.shape[TP_AXIS]) if has_tp else arch
    vec = P(DP_AXIS) if DP_AXIS in mesh.axis_names else P(None)

    def body(weights, kv, tokens, pos, active):
        return batched_decode_body(
            arch_l, weights, kv, tokens, pos, active,
            tp_axis=TP_AXIS if has_tp else None, n_layers=n_layers)

    dp_ax = DP_AXIS if DP_AXIS in mesh.axis_names else None
    f = shard_map(body, mesh=mesh,
                  in_specs=(wspecs, kv_spec, vec, vec, vec),
                  out_specs=(P(dp_ax, None), kv_spec),
                  check_rep=False)
    return jax.jit(f, donate_argnums=(1,))


def make_batched_verify_sharded(mesh: Mesh, arch: Arch,
                                weights_template: ModelWeights,
                                quant: bool = False):
    """Sharded VERIFY window (speculative serving on a dp/tp mesh):
    tokens [B, K+1] shard on dp with the slots; logits come back
    [B, K+1, V] dp-sharded on the slot axis."""
    from ..models.batched import batched_verify_body
    wspecs, kv_spec, has_tp = _specs(mesh, weights_template, quant)
    arch_l = local_arch(arch, mesh.shape[TP_AXIS]) if has_tp else arch
    dp_ax = DP_AXIS if DP_AXIS in mesh.axis_names else None
    vec = P(dp_ax)
    vec2 = P(dp_ax, None)

    def body(weights, kv, tokens, pos, active):
        return batched_verify_body(
            arch_l, weights, kv, tokens, pos, active,
            tp_axis=TP_AXIS if has_tp else None)

    f = shard_map(body, mesh=mesh,
                  in_specs=(wspecs, kv_spec, vec2, vec, vec),
                  out_specs=(P(dp_ax, None, None), kv_spec),
                  check_rep=False)
    return jax.jit(f, donate_argnums=(1,))
