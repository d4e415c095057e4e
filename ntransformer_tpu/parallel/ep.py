"""Expert parallelism over an ICI mesh — MoE scaling the single-GPU
reference cannot express (SURVEY.md §2.14: no parallelism of any kind).

Sharding plan:
  ffn_*_exps       : sharded on the EXPERT axis of their planes
                     ([L, E, rows, N] → each shard holds E/ep whole
                     experts; per-shard planes are valid quant layouts
                     unchanged, because the split never touches the
                     rows/lanes axes — no alignment constraints at all,
                     unlike TP's K/tp and N/tp divisibility).
  router/attention/norms/embed/lm_head/KV: replicated. On an EP-only mesh
                     every shard redundantly computes attention; EP's win
                     is the expert weights (the bulk of MoE bytes: ~85%
                     of mixtral-8x7B) splitting across HBMs.

Collectives: ONE psum per MoE layer (the weighted expert outputs —
models/llama.py moe_ffn). Each shard computes only its local experts;
tokens routed to remote experts contribute zero locally and arrive via
the psum. Decode (T=1) masks the k selected experts against the shard's
range; prefill's dense expert loop runs E/ep local iterations per shard,
so the loop itself also parallelizes.
"""
from __future__ import annotations

import dataclasses
from functools import partial
import warnings

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    from jax.experimental.shard_map import shard_map

from ..models.llama import Arch, KVCache, ModelWeights, forward
from ..ops.linear import QLinear

EP_AXIS = "ep"


def weight_specs_ep(weights: ModelWeights) -> ModelWeights:
    """Spec tree: expert planes shard dim 1 (the E axis of stacked
    [L, E, rows, N] planes); everything else replicates."""
    rep = jax.tree.map(lambda _: P(), weights)
    lw = weights.layers
    assert lw.ffn_gate_inp is not None, \
        "expert parallelism needs a mixture-of-experts model"
    exp = P(None, EP_AXIS)

    def eql(ql: QLinear) -> QLinear:
        return QLinear(ql.dtype, ql.k, ql.n, {nm: exp for nm in ql.planes})

    layers = dataclasses.replace(
        rep.layers,
        w_gate_exps=eql(lw.w_gate_exps),
        w_up_exps=eql(lw.w_up_exps),
        w_down_exps=eql(lw.w_down_exps))
    return dataclasses.replace(rep, layers=layers)


def shard_weights_ep(weights: ModelWeights, mesh: Mesh,
                     arch: Arch) -> ModelWeights:
    """Place weights on the mesh with the EP plan (host weights go
    straight to their shards, like the TP load path)."""
    ep = mesh.shape[EP_AXIS]
    assert arch.n_experts % ep == 0, \
        f"{arch.n_experts} experts do not divide over {ep} EP shards"
    tied = weights.lm_head is weights.embed
    wspecs = weight_specs_ep(weights)

    def put(w, s):
        return jax.device_put(w, NamedSharding(mesh, s))
    new_w = jax.tree.map(put, weights, wspecs)
    if tied:
        new_w = dataclasses.replace(new_w, lm_head=new_w.embed)
    return new_w


def make_ep_mesh(n: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n if n is not None else len(devs)
    assert len(devs) >= n, f"ep={n} but only {len(devs)} devices"
    import numpy as np
    return Mesh(np.array(devs[:n]), (EP_AXIS,))


def shard_model_ep(weights: ModelWeights, kv: KVCache, mesh: Mesh,
                   arch: Arch) -> tuple[ModelWeights, KVCache]:
    """Place weights/KV on the mesh with the EP plan (KV replicates)."""
    new_w = shard_weights_ep(weights, mesh, arch)
    new_kv = jax.tree.map(
        lambda w: jax.device_put(w, NamedSharding(mesh, P())), kv)
    return new_w, new_kv


def make_ep_forward(mesh: Mesh, arch: Arch, *, weights_template,
                    all_logits: bool = False, has_n_valid: bool = False,
                    kv_quant: bool = False):
    """Sharded forward: same semantics as models.llama.forward with the
    expert loop split across the mesh and ONE psum per MoE layer.
    f(weights, kv, tokens, pos[, n_valid]) — arch stays GLOBAL; moe_ffn
    reads the local expert count off the actual plane shapes."""
    del kv_quant  # KV replicates under EP either way
    wspecs = weight_specs_ep(weights_template)
    in_specs = (wspecs, P(), P(), P())
    if has_n_valid:
        in_specs = in_specs + (P(),)

    def body(weights, kv, tokens, pos, *opt):
        nv = opt[0] if has_n_valid else None
        return forward.__wrapped__(
            arch, weights, kv, tokens, pos, n_valid=nv,
            all_logits=all_logits, ep_axis=EP_AXIS)

    out_specs = (P(None, None), P(), None)
    f = shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)
    return jax.jit(f, donate_argnums=(1,))
