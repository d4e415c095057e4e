"""Tiered MoE: routed (layer, expert) streaming through the SLEP idea.

Dense tiered streaming (models/tiered.py) moves whole layers; an MoE layer
uses only k of E experts per token, so this path keeps every layer's
ATTENTION + router + norms HBM-resident (they are the small minority of an
MoE model's bytes) and streams the EXPERT weight sets through an HBM LRU
with temporal prefetch — the design the r4 cost model measured
(experiments/moe_tiered_cost.py: temporal hit 0.94, ~1.9x fewer bytes than
dense-layer streaming at mixtral shapes after paying misses double).

Per decode token:
  prefetch_token_start()        async-load each layer's last-token experts
  for each layer l:
    _attn_router_step (jit)     attention + ffn_norm + router top-k
    D2H of the k expert ids     (the router names the experts — the one
                                 unavoidable sync point per MoE layer)
    estreamer.get(l, e)         HBM-cache hit (prefetched) or demand load
    _expert_ffn_step (jit)      k expert FFNs, weighted residual add
    estreamer.note(l, ids)      record routing for next token's prefetch
  head (jit)

Prefill (T > 1) runs the dense strategy: every expert of a layer streams
through the cache once and applies with per-token routing weights (same
trade as moe_ffn's prefill loop — static shapes, MXU-dense matmuls).

The reference has no MoE support (llama-only, config.h:13); EP
(parallel/ep.py) remains the recommended MoE deployment, this path is the
capacity escape hatch — the same relationship dense tiering has to TP.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtypes import DType
from ..inference.tokenizer import Tokenizer
from ..memory.experts import ExpertStreamer
from ..memory.pack import PackReader, ensure_pack
from ..ops.layers import rms_norm, rope_table, swiglu
from ..ops.linear import QLinear, qmatmul
from .config import ModelConfig
from .llama import (Arch, KVCache, LayerWeights, ModelWeights, attn_block,
                    embed_positions, head_logits, stack_layers)
from .tiered import _embed_fwd, _head_fwd


@dataclass
class TieredMoEModel:
    config: ModelConfig
    arch: Arch
    resident: ModelWeights          # stacked attention+router, ALL layers
    estreamer: ExpertStreamer
    tokenizer: Tokenizer | None
    pack: PackReader

    @property
    def n_resident(self) -> int:
        return self.arch.n_layers    # attention stack is fully resident

    @property
    def streamer(self):              # TieredEngine duck-typing (close())
        return self.estreamer


@partial(jax.jit, static_argnames=("arch",), donate_argnames=("kv_k", "kv_v"))
def _attn_router_step(arch: Arch, layers: LayerWeights, x, kv_k, kv_v,
                      layer, pos, cos_t, sin_t, n_valid=None):
    """Attention block + ffn_norm + router top-k for ONE layer (stacked
    weights, traced layer index — every layer shares this compilation).
    Returns (x_resid, kv_k, kv_v, hf, topv, tope)."""
    kk = jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, layer, 0, keepdims=False),
        kv_k)
    vv = jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, layer, 0, keepdims=False),
        kv_v)
    x, kk, vv = attn_block(arch, x, layers, kk, vv, pos, cos_t, sin_t,
                           n_valid, layer=layer)
    kv_k = jax.tree.map(
        lambda c, n: jax.lax.dynamic_update_index_in_dim(c, n, layer, 0),
        kv_k, kk)
    kv_v = jax.tree.map(
        lambda c, n: jax.lax.dynamic_update_index_in_dim(c, n, layer, 0),
        kv_v, vv)
    fn = jax.lax.dynamic_index_in_dim(layers.ffn_norm, layer, 0,
                                      keepdims=False)
    if arch.norm_bias != 0.0:
        fn = fn + arch.norm_bias
    hf = rms_norm(x, fn, arch.norm_eps).astype(jnp.bfloat16)
    router = qmatmul(hf, layers.ffn_gate_inp, layer=layer)
    probs = jax.nn.softmax(router.astype(jnp.float32), axis=-1)
    topv, tope = jax.lax.top_k(probs, arch.n_experts_used)
    topv = topv / jnp.sum(topv, -1, keepdims=True)
    return x, kv_k, kv_v, hf, topv, tope


@partial(jax.jit, static_argnames=("arch",))
def _expert_ffn_step(arch: Arch, x, hf, experts: tuple, topv):
    """x += sum_j topv[:, j] * expert_j(hf). experts: tuple of k
    {w_gate, w_up, w_down} dicts (device QLinears) — the pytree structure
    is identical for every (layer, expert), so all calls share one
    compilation."""
    out = jnp.zeros(x.shape, jnp.float32)
    for j, ew in enumerate(experts):
        g = qmatmul(hf, ew["w_gate"])
        u = qmatmul(hf, ew["w_up"])
        d = qmatmul(swiglu(g, u, arch.act).astype(jnp.bfloat16),
                    ew["w_down"])
        out = out + topv[:, j:j + 1] * d
    return x + out


@partial(jax.jit, static_argnames=("arch",))
def _expert_ffn_dense(arch: Arch, acc, hf, ew: dict, col):
    """Prefill accumulator: acc += col * expert(hf) — one expert applied
    to all T tokens with its per-token routing weight column [T, 1]."""
    g = qmatmul(hf, ew["w_gate"])
    u = qmatmul(hf, ew["w_up"])
    d = qmatmul(swiglu(g, u, arch.act).astype(jnp.bfloat16), ew["w_down"])
    return acc + col * d


@partial(jax.jit, static_argnames=("arch", "n_experts"))
def _routing_cols(arch: Arch, topv, tope, n_experts: int):
    """[T, K] routing -> dense [T, E] weight matrix (prefill strategy)."""
    T = topv.shape[0]
    sel = jnp.zeros((T, n_experts), jnp.float32)
    return sel.at[jnp.arange(T)[:, None], tope].set(topv)


def forward_tiered_moe(tm: TieredMoEModel, kv: KVCache, tokens, pos, *,
                       n_valid=None, all_logits: bool = False,
                       with_cosine: bool = False,
                       skip: frozenset = frozenset(),
                       draft_only: bool = False,
                       early_exit_threshold: float = 0.0):
    """Tiered MoE forward — the signature mirrors forward_tiered so
    TieredEngine drives either. Layer-skip / draft / early-exit are dense-
    path capabilities (loudly unsupported here)."""
    if skip or draft_only or early_exit_threshold:
        raise NotImplementedError(
            "layer-skip / draft / early-exit are dense-tiered capabilities; "
            "the MoE-tiered path streams experts, not layers")
    arch = tm.arch
    E, K = arch.n_experts, arch.n_experts_used
    T = int(tokens.shape[0])
    x, cos_t, sin_t = _embed_fwd(arch, tm.resident, tokens, pos)

    kv_k = (kv.k, kv.ks) if kv.quantized else kv.k
    kv_v = (kv.v, kv.vs) if kv.quantized else kv.v

    decode = T == 1
    if decode:
        tm.estreamer.prefetch_token_start()
    cosines = [] if with_cosine else None
    for layer in range(arch.n_layers):
        x0 = x if with_cosine else None
        x, kv_k, kv_v, hf, topv, tope = _attn_router_step(
            arch, tm.resident.layers, x, kv_k, kv_v, jnp.int32(layer), pos,
            cos_t, sin_t, n_valid)
        if decode:
            e_ids = [int(i) for i in np.asarray(tope[0])]  # the sync point
            experts = tuple(tm.estreamer.get(layer, e) for e in e_ids)
            x = _expert_ffn_step(arch, x, hf, experts, topv)
            tm.estreamer.note(layer, e_ids)
        else:
            # prefill: stream EVERY expert once; per-token routing columns
            cols = _routing_cols(arch, topv, tope, E)
            acc = jnp.zeros(x.shape, jnp.float32)
            for e in range(E):
                acc = _expert_ffn_dense(arch, acc, hf,
                                        tm.estreamer.get(layer, e),
                                        cols[:, e:e + 1])
            x = x + acc
            if n_valid is None:
                tm.estreamer.note(layer, np.asarray(tope[-1]))
            else:
                # last VALID row's routing predicts the next decode token
                row = jnp.take(tope, jnp.asarray(n_valid) - 1, axis=0)
                tm.estreamer.note(layer, np.asarray(row))
        if with_cosine:
            from .llama import _cosine
            cosines.append(float(_cosine(x0, x)))

    logits = _head_fwd(arch, tm.resident, x, n_valid, all_logits)
    if kv.quantized:
        new_kv = KVCache(kv_k[0], kv_v[0], kv_k[1], kv_v[1])
    else:
        new_kv = KVCache(kv_k, kv_v)
    cos = np.asarray(cosines, np.float32) if with_cosine else None
    return logits, new_kv, cos


def load_model_tiered_moe(path: str, *, max_seq_len: int | None = None,
                          hbm_expert_slots: int | None = None,
                          ram_bytes: int | None = None,
                          with_tokenizer: bool = True,
                          n_stage_threads: int = 8,
                          kv_quant: bool = False) -> TieredMoEModel:
    """Load an MoE GGUF with attention/router resident and experts
    streamed through an HBM LRU.

    hbm_expert_slots: LRU capacity in EXPERT SETS (default: 2 x the
    per-token working set, n_layers * n_experts_used * 2 — enough for the
    current token's experts plus the next token's prefetch).
    ram_bytes: host budget for whole-layer blobs (RAM tier); layers beyond
    it serve experts via per-expert O_DIRECT reads (disk tier).
    """
    import sys

    from ..core.gguf import GGUFReader
    from .loader import load_norm, load_qlinear_host, rope_freq_factors

    reader = GGUFReader(path)
    cfg = ModelConfig.from_gguf_metadata(reader.metadata, max_seq_len)
    arch = Arch.from_config(cfg)
    if not arch.n_experts:
        raise ValueError("not an MoE model — use load_model_tiered")

    pack = ensure_pack(reader, path)
    if not pack.n_experts(0):
        # pre-v5 pack of an MoE file: rebuild with per-expert sub-ranges
        raise RuntimeError("pack has no per-expert ranges — delete the "
                           f"stale .ntp next to {path} and reload")

    L = cfg.n_layers
    # resident: per-layer blobs give attention+router+norms; expert fields
    # stay None (the streamer owns them)
    layers = []
    for i in range(L):
        blob = pack.read_layer(i)
        lw = pack.layer_weights(i, blob)
        layers.append(jax.tree.map(jnp.asarray, lw))
    stacked = stack_layers(layers)

    embed = load_qlinear_host(reader, "token_embd.weight")

    def to_dev(q: QLinear) -> QLinear:
        return QLinear(q.dtype, q.k, q.n,
                       {nm: jnp.asarray(v) for nm, v in q.planes.items()})
    embed_dev = to_dev(embed)
    tied = "output.weight" not in reader
    lm_head = embed_dev if tied else to_dev(
        load_qlinear_host(reader, "output.weight"))
    output_norm = jnp.asarray(load_norm(reader, "output_norm.weight"))
    cos, sin = rope_table(cfg.max_seq_len, cfg.head_dim, cfg.rope_theta,
                          rope_freq_factors(reader))
    resident = ModelWeights(embed=embed_dev, layers=stacked,
                            output_norm=output_norm, lm_head=lm_head,
                            rope_cos=cos, rope_sin=sin)

    if hbm_expert_slots is None:
        hbm_expert_slots = 2 * L * arch.n_experts_used
    # RAM tier: whole-layer blobs until the budget runs out
    ram_layers = set()
    if ram_bytes is None:
        ram_layers = set(range(L))
    else:
        used = 0
        for i in range(L):
            used += pack.layer_nbytes(i)
            if used > ram_bytes:
                break
            ram_layers.add(i)
    est = ExpertStreamer(pack, range(L), hbm_slots=hbm_expert_slots,
                         ram_layers=ram_layers, n_threads=n_stage_threads)
    print(f"tiered-moe: {L} layers resident (attn+router), "
          f"E={arch.n_experts} k={arch.n_experts_used} experts streamed "
          f"({len(ram_layers)} layers' experts in RAM, LRU "
          f"{hbm_expert_slots} expert sets)", file=sys.stderr)
    tok = (Tokenizer.from_gguf_metadata(reader.metadata)
           if with_tokenizer else None)
    return TieredMoEModel(cfg, arch, resident, est, tok, pack)
