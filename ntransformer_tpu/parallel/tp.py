"""Tensor parallelism over an ICI mesh — the multi-chip capability the
single-GPU reference does not have (SURVEY.md §2.14 north-star row).

Sharding plan (megatron-style, adapted to quantized planes):
  wq/wk/wv/gate/up : column-parallel — planes sharded on N (lane axis);
                     attention heads (both Q and KV) split across shards,
                     so attention itself needs no communication (GQA groups
                     stay intact because Hq and Hkv divide by the same tp).
  wo/down          : row-parallel — planes sharded on K (sublane axis);
                     partial products psum-reduced inside layer_step.
  token_embd/lm_head: row-parallel on K (hidden), so the odd vocab size
                     (128256) never needs lane-padding; embedding rows are
                     reassembled with a tiny tiled all-gather, logits with a
                     psum.
  KV cache         : sharded on the head axis.
  norms/rope/x     : replicated.

Per-shard plane shapes stay valid quant layouts as long as K/tp keeps the
superblock alignment (K/tp % 256 == 0 for K-quants) and N/tp % 128 == 0 —
asserted in shard_model.

Collectives (2 psums per layer + embed gather + logits psum) ride ICI and
are inserted explicitly via shard_map, not left to GSPMD — required because
Pallas kernels have no auto-partitioning rules.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import warnings

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    from jax.experimental.shard_map import shard_map

from ..core.layout import LAYOUTS
from ..models.llama import Arch, KVCache, LayerWeights, ModelWeights, forward
from ..ops.linear import QLinear

TP_AXIS = "tp"


def _qlinear_spec(ql: QLinear, spec: P, stacked: bool) -> QLinear:
    """A QLinear-shaped pytree whose leaves are PartitionSpecs."""
    if stacked:
        spec = P(None, *spec)
    return QLinear(ql.dtype, ql.k, ql.n,
                   {nm: spec for nm in ql.planes})


def weight_specs(weights: ModelWeights) -> ModelWeights:
    col = P(None, TP_AXIS)   # shard N (lanes)
    row = P(TP_AXIS, None)   # shard K (sublanes / plane rows)
    rep = P(None)
    lw = weights.layers
    if lw.ffn_gate_inp is not None:
        raise NotImplementedError(
            "MoE × tensor parallelism not supported — shard the experts "
            "instead (parallel/ep.py); DP-only serving replicates and "
            "works")

    def opt(ql, spec):
        """Fused templates carry None for the folded-away matrices; specs
        must mirror the tree structure exactly."""
        return _qlinear_spec(ql, spec, True) if ql is not None else None
    # fused wqkv / w_gate_up / wqk are column-sharded like their parts —
    # valid because fuse_layer_weights(tp=...) interleaves lanes per shard
    layer_specs = LayerWeights(
        attn_norm=P(None, None),
        wq=opt(lw.wq, col),
        wk=opt(lw.wk, col),
        wv=opt(lw.wv, col),
        wo=_qlinear_spec(lw.wo, row, True),
        ffn_norm=P(None, None),
        w_gate=opt(lw.w_gate, col),
        w_up=opt(lw.w_up, col),
        w_down=_qlinear_spec(lw.w_down, row, True),
        wqkv=opt(lw.wqkv, col),
        w_gate_up=opt(lw.w_gate_up, col),
        wqk=opt(lw.wqk, col),
        # qwen2 QKV biases [L, N]: lanes shard with their matrices' columns
        bq=P(None, TP_AXIS) if lw.bq is not None else None,
        bk=P(None, TP_AXIS) if lw.bk is not None else None,
        bv=P(None, TP_AXIS) if lw.bv is not None else None,
        # gemma2 post norms [L, H] normalize the FULL (post-psum) block
        # output — replicated like the pre-norms
        attn_post_norm=(P(None, None) if lw.attn_post_norm is not None
                        else None),
        ffn_post_norm=(P(None, None) if lw.ffn_post_norm is not None
                       else None),
        # qwen3/gemma3 q/k norms [L, D]: per-HEAD-DIM weights shared by
        # every head, so they replicate across the head-sharded mesh
        q_norm=P(None, None) if lw.q_norm is not None else None,
        k_norm=P(None, None) if lw.k_norm is not None else None,
    )
    return ModelWeights(
        embed=_qlinear_spec(weights.embed, row, False),
        layers=layer_specs,
        output_norm=rep,
        lm_head=_qlinear_spec(weights.lm_head, row, False),
        rope_cos=P(None, None),
        rope_sin=P(None, None),
    )


def kv_spec(quant: bool = False) -> KVCache:
    # cache is [L, Hkv, S, D]; shard the head axis. int8 scales are
    # [L, Hkv, S, 1] — same leading axes, same head sharding (r2 weak #4:
    # int8 KV and TP now compose).
    h = P(None, TP_AXIS, None, None)
    return KVCache(h, h, h if quant else None, h if quant else None)


def check_shardable(arch: Arch, weights: ModelWeights, tp: int,
                    kernel_alignment: bool | None = None):
    """Validate the TP plan. kernel_alignment additionally requires shard
    shapes the Pallas kernels can tile (default: only when the Pallas path
    is active — see ops.linear.KERNEL_MODE)."""
    if kernel_alignment is None:
        from ..ops.linear import use_pallas_default
        kernel_alignment = use_pallas_default()
    assert arch.n_kv_heads % tp == 0, \
        f"n_kv_heads {arch.n_kv_heads} not divisible by tp={tp}"
    for name, ql in (("wo", weights.layers.wo),
                     ("w_down", weights.layers.w_down),
                     ("embed", weights.embed)):
        if ql.dtype in LAYOUTS:
            blk = max(s.rows_div for s in LAYOUTS[ql.dtype])
            assert (ql.k // tp) % blk == 0, \
                f"{name}: K/tp = {ql.k}/{tp} breaks {ql.dtype} block alignment"
    if kernel_alignment:
        lw = weights.layers
        cols = [("wq", lw.wq), ("wk", lw.wk), ("w_gate", lw.w_gate),
                ("wqkv", lw.wqkv), ("w_gate_up", lw.w_gate_up),
                ("wqk", lw.wqk)]
        for name, ql in cols:
            if ql is None:
                continue  # folded into a fused matrix (or not fused)
            assert (ql.n // tp) % 128 == 0, \
                f"{name}: N/tp = {ql.n}/{tp} not a multiple of 128"


def shard_weights(weights: ModelWeights, mesh: Mesh, arch: Arch) -> ModelWeights:
    """Place weights on the mesh with the TP sharding plan. Host (numpy)
    weights go straight to their shards — no unsharded device copy ever
    exists (load_model(device=False) → here is the TPEngine load path)."""
    tp = mesh.shape[TP_AXIS]
    if weights.layers.ffn_gate_inp is not None:
        raise NotImplementedError(
            "MoE × tensor parallelism not supported — shard the experts "
            "instead (parallel/ep.py)")
    kernel_alignment = None
    if mesh.devices.flat[0].platform != "tpu":
        kernel_alignment = False  # CPU-mesh tests/dry runs use jnp fallback
    check_shardable(arch, weights, tp, kernel_alignment)
    tied = weights.lm_head is weights.embed
    wspecs = weight_specs(weights)
    def put(w, s):
        return jax.device_put(w, NamedSharding(mesh, s))
    new_w = jax.tree.map(put, weights, wspecs)
    if tied:
        new_w = dataclasses.replace(new_w, lm_head=new_w.embed)
    return new_w


def shard_model(weights: ModelWeights, kv: KVCache, mesh: Mesh,
                arch: Arch) -> tuple[ModelWeights, KVCache]:
    """Place weights/KV on the mesh with the TP sharding plan."""
    new_w = shard_weights(weights, mesh, arch)
    new_kv = jax.tree.map(
        lambda w, s: jax.device_put(w, NamedSharding(mesh, s)), kv, kv_spec())
    return new_w, new_kv


def local_arch(arch: Arch, tp: int) -> Arch:
    return dataclasses.replace(arch, n_heads=arch.n_heads // tp,
                               n_kv_heads=arch.n_kv_heads // tp)


def make_tp_forward(mesh: Mesh, arch: Arch, *, all_logits: bool = False,
                    with_cosine: bool = False, weights_template=None,
                    has_layer_sel: bool = False, has_n_valid: bool = False,
                    kv_quant: bool = False):
    """Build the sharded forward: same semantics as models.llama.forward but
    executed under shard_map with explicit TP collectives. Optional args are
    positional flags (shard_map in_specs must match the call structure):
    f(weights, kv, tokens, pos[, n_valid][, layer_sel])."""
    tp = mesh.shape[TP_AXIS]
    arch_l = local_arch(arch, tp)
    wspecs = weight_specs(weights_template)
    kspec = kv_spec(kv_quant)
    rep = P(None)

    in_specs = (wspecs, kspec, rep, P())
    if has_n_valid:
        in_specs = in_specs + (P(),)
    if has_layer_sel:
        in_specs = in_specs + (rep,)

    def body(weights, kv, tokens, pos, *opt):
        i = 0
        nv = opt[i] if has_n_valid else None
        i += int(has_n_valid)
        sel = opt[i] if has_layer_sel else None
        return forward.__wrapped__(
            arch_l, weights, kv, tokens, pos, layer_sel=sel, n_valid=nv,
            all_logits=all_logits, with_cosine=with_cosine, tp_axis=TP_AXIS)

    out_specs = (P(None, None), kspec,
                 rep if with_cosine else None)

    f = shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)
    return jax.jit(f, donate_argnums=(1,))


def make_tp_decode_loop(mesh: Mesh, arch: Arch, n_steps: int, *,
                        weights_template=None, kv_quant: bool = False):
    """Fused greedy decode loop UNDER shard_map: the lax.scan over tokens
    runs inside the sharded region, so TP decode pays one host dispatch
    per n_steps tokens instead of one per token (r2 weak #5 — the
    host-driven loop hid the real TP decode rate behind per-token
    dispatch + tunnel latency). Same collectives per layer as
    make_tp_forward; the argmax chains on-device (every shard holds the
    full psum'd logits, so the token is replicated by construction).

    Returns jitted f(weights, kv, first_token, pos0) -> (tokens [n_steps],
    kv)."""
    arch_l = local_arch(arch, mesh.shape[TP_AXIS])
    wspecs = weight_specs(weights_template)
    kspec = kv_spec(kv_quant)

    def body(weights, kv, token, pos0):
        def step(carry, i):
            kv, tok = carry
            logits, kv, _ = forward.__wrapped__(
                arch_l, weights, kv, tok[None], pos0 + i, tp_axis=TP_AXIS)
            nxt = jnp.argmax(logits[0]).astype(jnp.int32)
            return (kv, nxt), nxt

        (kv, _), toks = jax.lax.scan(step, (kv, token),
                                     jnp.arange(n_steps, dtype=jnp.int32))
        return toks, kv

    f = shard_map(body, mesh=mesh,
                  in_specs=(wspecs, kspec, P(), P()),
                  out_specs=(P(None), kspec),
                  check_rep=False)
    return jax.jit(f, donate_argnums=(1,))
