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
