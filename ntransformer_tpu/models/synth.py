"""Synthetic in-memory model builder (random weights, valid quant layouts).

Decode throughput is independent of weight values, so benchmarks build
full-size models directly as device planes — no multi-GB GGUF on disk, no
float quantization pass. qs planes are uninitialized bytes (free); scale
planes are a constant small f16 so dequantized magnitudes stay sane.

Layer weights are allocated pre-stacked ([L, rows, n] per plane) so peak
host/HBM usage is exactly the model size.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.dtypes import DType
from ..core.layout import LAYOUTS
from ..models.config import ModelConfig
from ..models.llama import Arch, LayerWeights, ModelWeights
from ..ops.layers import rope_table
from ..ops.linear import QLinear
from .presets import PRESETS, q4_k_m_policy

_F16_SMALL = np.float32(0.004).astype(np.float16).view(np.uint16)  # ~2^-8


def synth_qlinear(n: int, k: int, dtype: DType, lead: int | None = None) -> QLinear:
    """Planes for one matrix ([rows, n]) or a stacked set ([lead, rows, n]).

    Arrays are created ON DEVICE (jnp.full / jnp.zeros) — the host→device
    tunnel on this rig runs ~0.12 GB/s, so uploading a multi-GB synthetic
    model would dominate bench wall-time for no benefit (decode timing is
    weight-value-independent; zeros are opaque runtime values to XLA)."""
    planes = {}
    for spec in LAYOUTS[dtype]:
        rows = 1 if spec.rows_div == 0 else k // spec.rows_div
        shape = (rows, n) if lead is None else (lead, rows, n)
        if spec.np_dtype == "uint16":
            arr = jnp.full(shape, np.uint16(_F16_SMALL), dtype=jnp.uint16)
        elif spec.np_dtype == "float32":
            # w4a8 s/m planes: small positive so dequant magnitudes are sane
            arr = jnp.full(shape, 0.004, dtype=jnp.float32)
        elif spec.name.startswith(("sc", "mn")):
            arr = jnp.full(shape, 8, dtype=spec.np_dtype)
        else:
            arr = jnp.zeros(shape, dtype=spec.np_dtype)  # content irrelevant
        planes[spec.name] = arr
    return QLinear(dtype, k, n, planes)


def synth_model(preset: str, dtype: str, max_seq_len: int = 4096,
                fuse: bool = False):
    """Build (config, arch, weights) for a preset entirely in memory.
    fuse=True builds fused wqkv / w_gate_up (llama.fuse_layer_weights)."""
    p = PRESETS[preset]
    head_dim = p["hidden"] // p["heads"]
    kv_dim = p["kv_heads"] * head_dim
    cfg = ModelConfig(
        model_name=f"synth-{preset}-{dtype}",
        vocab_size=p["vocab"], hidden_size=p["hidden"],
        intermediate_size=p["inter"], n_layers=p["layers"],
        n_heads=p["heads"], n_kv_heads=p["kv_heads"], head_dim=head_dim,
        rope_theta=p["rope_theta"],
        max_seq_len=min(p["ctx"], max_seq_len),
    )
    arch = Arch.from_config(cfg)

    if dtype == "q4_k_m":
        policy = q4_k_m_policy
    else:
        fixed = DType(dtype)
        def policy(_name, _dt=fixed):
            return _dt

    h, it, v, L = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size, cfg.n_layers
    stacked = LayerWeights(
        attn_norm=jnp.ones((L, h), jnp.float32),
        wq=synth_qlinear(h, h, policy("attn_q"), L),
        wk=synth_qlinear(kv_dim, h, policy("attn_k"), L),
        wv=synth_qlinear(kv_dim, h, policy("attn_v"), L),
        wo=synth_qlinear(h, h, policy("attn_output"), L),
        ffn_norm=jnp.ones((L, h), jnp.float32),
        w_gate=synth_qlinear(it, h, policy("ffn_gate"), L),
        w_up=synth_qlinear(it, h, policy("ffn_up"), L),
        w_down=synth_qlinear(h, it, policy("ffn_down"), L),
    )
    if fuse:
        from .llama import fuse_layer_weights
        stacked = fuse_layer_weights(stacked)
    embed = synth_qlinear(v, h, policy("token_embd"))
    lm_head = synth_qlinear(v, h, policy("output."))
    import os
    # K-quant heads lane-pad by default (see loader.py: tn=256 -> 501
    # grid steps on the raw 128256 vocab; r3 A/B positive)
    kq_head = lm_head.dtype in (DType.Q4_K, DType.Q5_K, DType.Q6_K)
    pad = int(os.environ.get("NT_PAD_VOCAB", "2048" if kq_head else "0"))
    if pad:
        # lane-pad the LM head so its N hits wider tn tiles (the 128256
        # vocab is not 512-divisible); head_logits slices the zeros off
        from ..ops.linear import pad_qlinear_lanes
        lm_head = pad_qlinear_lanes(lm_head, pad)
    cos, sin = rope_table(cfg.max_seq_len, head_dim, cfg.rope_theta)
    weights = ModelWeights(embed=embed, layers=stacked,
                           output_norm=jnp.ones((h,), jnp.float32),
                           lm_head=lm_head, rope_cos=cos, rope_sin=sin)
    return cfg, arch, weights


def model_nbytes(weights: ModelWeights) -> int:
    return sum(int(x.size) * x.dtype.itemsize
               for x in jax.tree.leaves(weights))
