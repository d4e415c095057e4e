"""Context parallelism: KV cache sharded along the SEQUENCE axis.

The reference's attention holds a head's full score row in shared memory,
hard-capping context (~16K, SURVEY §5.7); flash attention removed the
per-call ceiling, and this module removes the per-CHIP ceiling: a context
too large for one chip's HBM shards across the mesh on the sequence axis.
Weights stay replicated (CP targets KV capacity, not weight bandwidth —
compose with TP for both); each step runs local attention partials and
combines them exactly with a pmax + two psums (ops/layers.py attention_cp).

Per decode step the collectives move O(Hq·T·D) floats/layer — tiny next to
the KV reads they unlock.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import warnings

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    from jax.experimental.shard_map import shard_map

from ..models.llama import Arch, KVCache, ModelWeights, forward

CP_AXIS = "cp"


def make_cp_mesh(n: int | None = None) -> Mesh:
    devices = np.asarray(jax.devices())
    n = n or devices.size
    return Mesh(devices[:n].reshape(n), (CP_AXIS,))


def kv_spec() -> KVCache:
    # [L, Hkv, S, D] — shard the sequence axis
    return KVCache(P(None, None, CP_AXIS, None), P(None, None, CP_AXIS, None))


def shard_kv(kv: KVCache, mesh: Mesh) -> KVCache:
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), kv, kv_spec())


def replicate_weights(weights: ModelWeights, mesh: Mesh) -> ModelWeights:
    import dataclasses
    tied = weights.lm_head is weights.embed
    rep = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(*(None,) * x.ndim))), weights)
    if tied:
        rep = dataclasses.replace(rep, lm_head=rep.embed)
    return rep


def make_cp_forward(mesh: Mesh, arch: Arch, *, all_logits: bool = False,
                    weights_template: ModelWeights | None = None,
                    has_n_valid: bool = False):
    """Sharded forward: same semantics as models.llama.forward with the KV
    cache sequence-sharded. arch keeps GLOBAL dims; the per-shard cache
    holds max_seq_len/cp positions."""
    wt = weights_template
    wspecs = jax.tree.map(lambda x: P(*(None,) * jnp.ndim(x)), wt)
    kspec = kv_spec()
    rep = P(None)

    def body(weights, kv, tokens, pos, *opt):
        nv = opt[0] if has_n_valid else None
        return forward.__wrapped__(arch, weights, kv, tokens, pos,
                                   n_valid=nv, all_logits=all_logits,
                                   cp_axis=CP_AXIS)

    in_specs = [wspecs, kspec, rep, P()]
    if has_n_valid:
        in_specs.append(P())
    f = shard_map(body, mesh=mesh, in_specs=tuple(in_specs),
                  out_specs=(P(None, None), kspec, None), check_rep=False)
    return jax.jit(f, donate_argnums=(1,))


def make_cp_tp_mesh(cp: int, tp: int) -> Mesh:
    """(cp, tp) mesh, TP innermost (per-layer psums stay ICI-adjacent;
    the CP combine is 3 collectives per layer of O(Hq·T·D) — tiny)."""
    from .tp import TP_AXIS
    devices = np.asarray(jax.devices())
    assert cp * tp <= devices.size
    return Mesh(devices[: cp * tp].reshape(cp, tp), (CP_AXIS, TP_AXIS))


def make_cp_tp_forward(mesh: Mesh, arch: Arch, *, all_logits: bool = False,
                       weights_template: ModelWeights | None = None,
                       has_n_valid: bool = False):
    """CP×TP compose: weights megatron-shard over tp (parallel/tp.py), the
    KV cache shards over BOTH axes — heads on tp, sequence on cp — so a
    long context divides its KV across the whole mesh while every matmul
    still runs tp-wide. layer_step handles both axes in one pass (tp
    psums for wo/down + the exact cp online-softmax combine)."""
    from .tp import TP_AXIS, local_arch, weight_specs

    tp = mesh.shape[TP_AXIS]
    arch_l = local_arch(arch, tp)
    wspecs = weight_specs(weights_template)
    kspec = KVCache(P(None, TP_AXIS, CP_AXIS, None),
                    P(None, TP_AXIS, CP_AXIS, None))
    rep = P(None)

    def body(weights, kv, tokens, pos, *opt):
        nv = opt[0] if has_n_valid else None
        return forward.__wrapped__(arch_l, weights, kv, tokens, pos,
                                   n_valid=nv, all_logits=all_logits,
                                   tp_axis=TP_AXIS, cp_axis=CP_AXIS)

    in_specs = [wspecs, kspec, rep, P()]
    if has_n_valid:
        in_specs.append(P())
    f = shard_map(body, mesh=mesh, in_specs=tuple(in_specs),
                  out_specs=(P(None, None), kspec, None), check_rep=False)
    return jax.jit(f, donate_argnums=(1,))


def shard_cp_tp(weights: ModelWeights, kv: KVCache, mesh: Mesh,
                arch: Arch) -> tuple[ModelWeights, KVCache]:
    from .tp import TP_AXIS, shard_weights
    w = shard_weights(weights, mesh, arch)
    kspec = KVCache(P(None, TP_AXIS, CP_AXIS, None),
                    P(None, TP_AXIS, CP_AXIS, None))
    kv = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), kv, kspec)
    return w, kv
