"""GGUF → device weights loader.

Equivalent in capability to the reference's Transformer::load resident path
(src/model/transformer.cpp:59-190): parses the GGUF, builds the model config
from metadata, re-layouts every tensor into TPU planar form (core/layout.py)
or dequantizes to bf16 ("slow but correct" mode), and places arrays on
device. Tied embeddings fall back to token_embd for the LM head
(transformer.cpp:92-99).

Streaming/tiered loading lives in memory/streamer.py; this module also
exposes per-layer host loading for it.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dequant import dequantize
from ..core.dtypes import DType
from ..core.gguf import GGUFReader
from ..core.layout import LAYOUTS, relayout
from ..inference.tokenizer import Tokenizer
from ..ops.layers import rope_table
from ..ops.linear import QLinear
from .config import ModelConfig
from .llama import Arch, LayerWeights, ModelWeights

LAYER_TENSORS = ("attn_q", "attn_k", "attn_v", "attn_output",
                 "ffn_gate", "ffn_up", "ffn_down")


def load_qlinear_host(reader: GGUFReader, name: str,
                      compute: str = "quant") -> QLinear:
    """Load one weight matrix as host-side planes (numpy)."""
    info = reader.info(name)
    n, k = info.shape  # file rows = out_features
    raw = reader.raw_bytes(name)
    if compute == "bf16" or info.dtype not in LAYOUTS:
        w = dequantize(raw, info.dtype, n, k)  # [N, K] f32
        wt = np.ascontiguousarray(w.T).astype(jnp.bfloat16)
        return QLinear(DType.BF16, k, n, {"w": wt})
    planes = relayout(raw, info.dtype, n, k)
    return QLinear(info.dtype, k, n, planes)


def _to_device(ql: QLinear, sharding=None) -> QLinear:
    planes = {nm: jax.device_put(v, sharding and sharding.get(nm))
              for nm, v in ql.planes.items()}
    return QLinear(ql.dtype, ql.k, ql.n, planes)


def load_norm(reader: GGUFReader, name: str) -> np.ndarray:
    info = reader.info(name)
    raw = reader.raw_bytes(name)
    n_elems = int(np.prod(info.shape))
    return dequantize(raw, info.dtype, 1, n_elems).reshape(-1)


def rope_freq_factors(reader: GGUFReader) -> np.ndarray | None:
    """Per-frequency rope divisors (`rope_freqs.weight`, Llama-3.1 style
    long-context scaling) when the file carries them."""
    if "rope_freqs.weight" not in reader:
        return None
    info = reader.info("rope_freqs.weight")
    n = int(np.prod(info.shape))
    return dequantize(reader.raw_bytes("rope_freqs.weight"),
                      info.dtype, 1, n).reshape(-1)


def load_qlinear_experts(reader: GGUFReader, name: str,
                         compute: str = "quant") -> QLinear:
    """A stacked expert matrix ([E, N, K] in the file — llama.cpp's
    ffn_*_exps layout) as planes with a LEADING EXPERT AXIS [E, rows, N]:
    each expert relayouts exactly like a 2-D matrix, and the stacked-
    select kernels index the flattened axis (models/llama.py moe_ffn)."""
    info = reader.info(name)
    e, n, k = info.shape
    raw = np.frombuffer(bytes(reader.raw_bytes(name)), np.uint8)
    per = raw.size // e
    if compute == "bf16" or info.dtype not in LAYOUTS:
        ws = [dequantize(raw[i * per:(i + 1) * per], info.dtype, n, k).T
              for i in range(e)]
        w = np.stack([np.ascontiguousarray(x) for x in ws]).astype(
            jnp.bfloat16)
        return QLinear(DType.BF16, k, n, {"w": w})
    parts = [relayout(raw[i * per:(i + 1) * per], info.dtype, n, k)
             for i in range(e)]
    planes = {nm: np.stack([p[nm] for p in parts]) for nm in parts[0]}
    return QLinear(info.dtype, k, n, planes)


def load_layer_host(reader: GGUFReader, i: int, compute: str = "quant") -> LayerWeights:
    """One layer's weights on host (used by both resident load and the
    tier-B/C staging path)."""
    pre = f"blk.{i}."

    def bias(name):
        # optional vectors: qwen2-family QKV biases, gemma2-family post
        # norms; absent in llama/mistral files
        full = pre + name
        return load_norm(reader, full) if full in reader else None

    moe = pre + "ffn_gate_inp.weight" in reader

    def dense(name):
        # pure-MoE layers (mixtral) carry no dense FFN matrices
        full = pre + name
        return (load_qlinear_host(reader, full, compute)
                if full in reader else None)

    return LayerWeights(
        attn_norm=load_norm(reader, pre + "attn_norm.weight"),
        wq=load_qlinear_host(reader, pre + "attn_q.weight", compute),
        wk=load_qlinear_host(reader, pre + "attn_k.weight", compute),
        wv=load_qlinear_host(reader, pre + "attn_v.weight", compute),
        wo=load_qlinear_host(reader, pre + "attn_output.weight", compute),
        ffn_norm=load_norm(reader, pre + "ffn_norm.weight"),
        w_gate=dense("ffn_gate.weight"),
        w_up=dense("ffn_up.weight"),
        w_down=dense("ffn_down.weight"),
        bq=bias("attn_q.bias"), bk=bias("attn_k.bias"),
        bv=bias("attn_v.bias"),
        attn_post_norm=bias("post_attention_norm.weight"),
        ffn_post_norm=bias("post_ffw_norm.weight"),
        q_norm=bias("attn_q_norm.weight"),
        k_norm=bias("attn_k_norm.weight"),
        ffn_gate_inp=(load_qlinear_host(reader, pre + "ffn_gate_inp.weight",
                                        compute) if moe else None),
        w_gate_exps=(load_qlinear_experts(reader, pre + "ffn_gate_exps.weight",
                                          compute) if moe else None),
        w_up_exps=(load_qlinear_experts(reader, pre + "ffn_up_exps.weight",
                                        compute) if moe else None),
        w_down_exps=(load_qlinear_experts(reader, pre + "ffn_down_exps.weight",
                                          compute) if moe else None),
    )


def convert_layer_w4a8(lw: LayerWeights) -> LayerWeights:
    """Requantize every eligible weight matrix of one layer to W4A8
    (core/w4a8.py; opt-in, changes numerics — priced by
    tools/quality_gate.py). Matrices whose shapes don't fit the format
    (K % 512, N % 128 — e.g. tiny MoE routers) keep their source dtype;
    qmatmul dispatches per-QLinear, so mixing is free."""
    import dataclasses

    from ..ops.linear import convert_qlinear_w4a8

    def conv(v):
        if not isinstance(v, QLinear) or v.dtype == DType.W4A8:
            return v
        if v.k % 512 or v.n % 128:
            return v
        return convert_qlinear_w4a8(v)

    return dataclasses.replace(lw, **{
        f: conv(getattr(lw, f)) for f in lw.__dataclass_fields__
        if isinstance(getattr(lw, f), QLinear)})


def convert_weights_w4a8(weights: ModelWeights) -> ModelWeights:
    """W4A8-convert a fully-built ModelWeights (synth/bench path; the GGUF
    load path converts per-layer on host before device placement). The
    embedding table keeps its source dtype — it is a gather, not a
    bandwidth-bound matmul; a tied LM head gets its own converted copy."""
    import dataclasses

    from ..ops.linear import convert_qlinear_w4a8
    layers = convert_layer_w4a8(weights.layers)
    lm_head = weights.lm_head
    if lm_head.k % 512 == 0 and lm_head.n % 128 == 0:
        lm_head = convert_qlinear_w4a8(lm_head)
    return dataclasses.replace(weights, layers=layers, lm_head=lm_head)


def convert_layer_w8a8(lw: LayerWeights) -> LayerWeights:
    """Requantize every eligible weight matrix of one layer to W8A8
    (core/w8a8.py: per-column int8 + column scales, one full-rate int8
    MXU dot at any row count; opt-in, changes numerics — priced by
    tools/quality_gate.py). Matrices whose N is not 128-divisible (tiny
    MoE routers) keep their source dtype; qmatmul dispatches
    per-QLinear, so mixing is free."""
    import dataclasses

    from ..ops.linear import convert_qlinear_w8a8

    def conv(v):
        if not isinstance(v, QLinear) or v.dtype == DType.W8A8:
            return v
        if v.n % 128:
            return v
        return convert_qlinear_w8a8(v)

    return dataclasses.replace(lw, **{
        f: conv(getattr(lw, f)) for f in lw.__dataclass_fields__
        if isinstance(getattr(lw, f), QLinear)})


def convert_weights_w8a8(weights: ModelWeights) -> ModelWeights:
    """W8A8-convert a fully-built ModelWeights (synth/bench path). Same
    embedding/tied-head policy as convert_weights_w4a8."""
    import dataclasses

    from ..ops.linear import convert_qlinear_w8a8
    layers = convert_layer_w8a8(weights.layers)
    lm_head = weights.lm_head
    if lm_head.n % 128 == 0:
        lm_head = convert_qlinear_w8a8(lm_head)
    return dataclasses.replace(weights, layers=layers, lm_head=lm_head)


@dataclass
class LoadedModel:
    config: ModelConfig
    arch: Arch
    weights: ModelWeights
    tokenizer: Tokenizer | None
    reader: GGUFReader

    @property
    def nbytes(self) -> int:
        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree.leaves(self.weights))


def load_model(path: str, *, max_seq_len: int | None = None,
               compute: str = "quant", n_layers: int | None = None,
               with_tokenizer: bool = True, device: bool = True,
               fuse: bool = False, w4a8: bool = False,
               w8a8: bool = False) -> LoadedModel:
    """Load a GGUF model fully resident in device memory.

    compute: "quant" keeps quantized planes (Pallas kernels dequant on the
    fly); "bf16" dequantizes at load (reference's resident-f16 analogue).
    n_layers limits the stack (debug / draft experiments).
    device=False keeps all weights as host numpy arrays — used by TPEngine
    so sharded device_put never coexists with a full unsharded device copy.
    fuse=True builds fused wqkv / w_gate_up matrices (single-chip resident
    decode; incompatible with TP column sharding).
    w4a8=True requantizes eligible matrices to the engine-native W4A8
    format on host before placement (int8-MXU decode kernel; CHANGES
    NUMERICS — price with tools/quality_gate.py). w8a8=True likewise for
    the W8A8 serving format (per-column int8, any-row int8 MXU dots —
    the batched/serving analogue). Mutually exclusive.
    """
    assert not (w4a8 and w8a8), "--w4a8 and --w8a8 are mutually exclusive"
    reader = GGUFReader(path)
    cfg = ModelConfig.from_gguf_metadata(reader.metadata, max_seq_len)
    if n_layers is not None:
        cfg.n_layers = n_layers
    arch = Arch.from_config(cfg)

    put_layer = ((lambda lw: jax.tree.map(jnp.asarray, lw)) if device
                 else (lambda lw: lw))
    stack = jnp.stack if device else np.stack

    embed = load_qlinear_host(reader, "token_embd.weight", compute)
    if device:
        embed = _to_device(embed)
    layers = []
    for i in range(cfg.n_layers):
        lw = load_layer_host(reader, i, compute)
        if w4a8:
            lw = convert_layer_w4a8(lw)  # on host, pre-placement
        elif w8a8:
            lw = convert_layer_w8a8(lw)
        layers.append(put_layer(lw))
    stacked = jax.tree.map(lambda *xs: stack(xs), *layers)
    if fuse:
        assert device, "fuse=True requires device placement (resident path)"
        from .llama import fuse_layer_weights
        stacked = fuse_layer_weights(stacked)
    output_norm = load_norm(reader, "output_norm.weight")
    if device:
        output_norm = jnp.asarray(output_norm)
    if "output.weight" in reader:
        lm_head = load_qlinear_host(reader, "output.weight", compute)
        if w4a8 and lm_head.k % 512 == 0 and lm_head.n % 128 == 0:
            from ..ops.linear import convert_qlinear_w4a8
            lm_head = convert_qlinear_w4a8(lm_head)
        elif w8a8 and lm_head.n % 128 == 0:
            from ..ops.linear import convert_qlinear_w8a8
            lm_head = convert_qlinear_w8a8(lm_head)
        if device:
            lm_head = _to_device(lm_head)
    else:
        lm_head = embed  # tied embeddings (transformer.cpp:92-99)
        if w4a8 and lm_head.k % 512 == 0 and lm_head.n % 128 == 0:
            # tied head: the HEAD gets a converted copy, the gather table
            # keeps its source dtype (embedding lookup is not a matmul)
            from ..ops.linear import convert_qlinear_w4a8
            lm_head = convert_qlinear_w4a8(lm_head)
        elif w8a8 and lm_head.n % 128 == 0:
            from ..ops.linear import convert_qlinear_w8a8
            lm_head = convert_qlinear_w8a8(lm_head)
    import os
    from ..core.dtypes import DType as _DT
    # default-on for K-quant heads: their superblock kernels lose ~2x on
    # the un-512-divisible 128256 vocab (tn=256 -> 501 grid steps); the
    # r3 on-chip A/B measured padding consistently positive for Q4_K/Q6_K
    # heads and neutral-to-noise elsewhere. NT_PAD_VOCAB=0 disables.
    kq_head = lm_head.dtype in (_DT.Q4_K, _DT.Q5_K, _DT.Q6_K)
    pad = int(os.environ.get("NT_PAD_VOCAB", "2048" if kq_head else "0"))
    if pad:
        # lane-pad so the LM-head matmul gets wider tn tiles; padded
        # columns dequant to exactly 0 and head_logits slices them off.
        # Tied case pads the SHARED table (gather ids stay < vocab, and
        # the single padded copy keeps memory flat).
        from ..ops.linear import pad_qlinear_lanes
        if lm_head is embed:
            embed = lm_head = pad_qlinear_lanes(embed, pad)
        else:
            lm_head = pad_qlinear_lanes(lm_head, pad)
    cos, sin = rope_table(cfg.max_seq_len, cfg.head_dim, cfg.rope_theta,
                          rope_freq_factors(reader))
    if cfg.rope_local_theta:
        # gemma3: SWA layers rotate with their own base — stack
        # [global, local] tables; layer_step selects by SWA parity
        lcos, lsin = rope_table(cfg.max_seq_len, cfg.head_dim,
                                cfg.rope_local_theta)
        cos = jnp.stack([cos, lcos])
        sin = jnp.stack([sin, lsin])

    weights = ModelWeights(embed=embed, layers=stacked,
                           output_norm=output_norm, lm_head=lm_head,
                           rope_cos=cos, rope_sin=sin)
    tok = Tokenizer.from_gguf_metadata(reader.metadata) if with_tokenizer else None
    return LoadedModel(cfg, arch, weights, tok, reader)
