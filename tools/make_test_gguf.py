"""Synthesize Llama-family GGUF files with random weights.

Used by tests (tiny models) and bench.py (full-size models with random
weights — decode timing is weight-value-independent). The reference had no
such tool; its tests required real model files.

Usage:
    python tools/make_test_gguf.py out.gguf --preset tiny --dtype q8_0
    python tools/make_test_gguf.py out.gguf --preset 8b --dtype q4_k_m
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ntransformer_tpu.core import DType, GGUFWriter, quantize  # noqa: E402
from ntransformer_tpu.core.dtypes import GGUFValueType  # noqa: E402

from ntransformer_tpu.models.presets import PRESETS, q4_k_m_policy  # noqa: F401 (re-export)

_CHAT_SPECIALS = {
    # template-family name -> (control tokens, jinja fingerprint snippet)
    "llama3": (["<|start_header_id|>", "<|end_header_id|>", "<|eot_id|>"],
               "{{ '<|start_header_id|>' + message['role'] }}"),
    "chatml": (["<|im_start|>", "<|im_end|>"],
               "{{ '<|im_start|>' + message['role'] }}"),
    "gemma": (["<start_of_turn>", "<end_of_turn>"],
              "{{ '<start_of_turn>' + role }}"),
}


def make_vocab(n: int, gpt2: bool = False, chat: str | None = None):
    """Build a small synthetic vocab. SP-style with ▁-prefixed words and byte
    fallback tokens, or GPT-2-style with Ġ-prefixed words. chat adds that
    template family's control tokens."""
    space = "Ġ" if gpt2 else "▁"
    tokens = ["<unk>", "<s>", "</s>"]
    types = [2, 3, 3]
    scores = [0.0, 0.0, 0.0]
    if chat is not None:
        for t in _CHAT_SPECIALS[chat][0]:
            tokens.append(t)
            types.append(3)  # CONTROL
            scores.append(0.0)
    if not gpt2:
        for b in range(256):
            tokens.append(f"<0x{b:02X}>")
            types.append(6)
            scores.append(0.0)
    words = ["the", "cap", "ital", "of", "france", "is", "paris", "hello",
             "world", "capital", "a", "b", "c", "t", "h", "e", "o", "f",
             "i", "s", "p", "r", "n", "l", "d", "w", "u", "m", "g", "y"]
    for w in words:
        for pre in ("", space):
            if len(tokens) >= n:
                break
            tokens.append(pre + w)
            types.append(1)
            scores.append(-float(len(tokens)))  # longer-added = lower score
    i = 0
    while len(tokens) < n:
        tokens.append(f"tok{i}")
        types.append(1)
        scores.append(-1000.0 - i)
        i += 1
    return tokens[:n], scores[:n], types[:n]


def write_model(path: str, preset: str, dtype: str, seed: int = 0,
                gpt2_vocab: bool = False, scale: float = 0.02,
                arch: str = "llama", chat: str | None = None):
    """arch "qwen2" additionally emits attn_{q,k,v}.bias tensors (the
    qwen2-family QKV biases) and uses the qwen2.* metadata prefix.
    chat ("llama3"/"chatml") adds that family's control tokens to the
    vocab and a fingerprint-able tokenizer.chat_template."""
    p = PRESETS[preset]
    rng = np.random.default_rng(seed)
    head_dim = p["hidden"] // p["heads"]
    kv_dim = p["kv_heads"] * head_dim

    w = GGUFWriter(path)
    w.add_meta("general.architecture", arch)
    w.add_meta("general.name", f"synthetic-{preset}")
    # this writer emits q/k rows UNPERMUTED (HF half-split rope order)
    w.add_meta("ntransformer.rope_style", "half")
    w.add_meta(f"{arch}.vocab_size", p["vocab"])
    w.add_meta(f"{arch}.embedding_length", p["hidden"])
    w.add_meta(f"{arch}.feed_forward_length", p["inter"])
    w.add_meta(f"{arch}.block_count", p["layers"])
    w.add_meta(f"{arch}.attention.head_count", p["heads"])
    w.add_meta(f"{arch}.attention.head_count_kv", p["kv_heads"])
    w.add_meta(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_meta(f"{arch}.rope.freq_base", float(p["rope_theta"]))
    w.add_meta(f"{arch}.context_length", p["ctx"])
    if arch == "gemma2":
        # small window so tiny-model tests actually exercise the local
        # layers' masking (real gemma2 files carry 4096)
        w.add_meta("gemma2.attention.sliding_window", p.get("window", 16))
        w.add_meta("gemma2.attn_logit_softcapping", 50.0)
        w.add_meta("gemma2.final_logit_softcapping", 30.0)
    if arch == "gemma3":
        w.add_meta("gemma3.attention.sliding_window", p.get("window", 16))
        # a local base that DIFFERS from the preset's global one, so a
        # model that ignores the dual rope tables fails parity
        w.add_meta("gemma3.rope.local_freq_base", 1000.0)
    moe = p.get("experts", 0)
    if moe:
        # mixture-of-experts keys (mixtral: plain llama arch + these)
        w.add_meta(f"{arch}.expert_count", moe)
        w.add_meta(f"{arch}.expert_used_count", p.get("experts_used", 2))
        w.add_meta(f"{arch}.expert_feed_forward_length", p["inter"])
    tokens, scores, types = make_vocab(min(p["vocab"], 4096),
                                       gpt2=gpt2_vocab, chat=chat)
    if chat is not None:
        w.add_meta("tokenizer.chat_template", _CHAT_SPECIALS[chat][1])
    # vocab arrays may be shorter than vocab_size for synthetic models
    w.add_meta("tokenizer.ggml.tokens", tokens,
               vtype=GGUFValueType.ARRAY, elem_type=GGUFValueType.STRING)
    w.add_meta("tokenizer.ggml.scores", scores,
               vtype=GGUFValueType.ARRAY, elem_type=GGUFValueType.FLOAT32)
    w.add_meta("tokenizer.ggml.token_type", types,
               vtype=GGUFValueType.ARRAY, elem_type=GGUFValueType.INT32)
    w.add_meta("tokenizer.ggml.bos_token_id", 1)
    w.add_meta("tokenizer.ggml.eos_token_id", 2)

    if dtype == "q4_k_m":
        policy = q4_k_m_policy
    else:
        fixed = DType(dtype)
        def policy(_name, _dt=fixed):
            return _dt

    def emit(name: str, rows: int, cols: int, dt: DType | None = None,
             std: float = scale):
        dt = dt or policy(name)
        # random bytes for the quantized payload would break golden decode
        # paths (NaN f16 scales), so quantize small random weights instead.
        x = (rng.standard_normal((rows, cols)) * std).astype(np.float32)
        if dt in (DType.F32,):
            w.add_tensor(name, x)
        else:
            w.add_tensor(name, raw=quantize(x, dt), shape=(rows, cols), dtype=dt)

    def emit_experts(name: str, e: int, rows: int, cols: int):
        """Stacked expert matrix [E, rows, cols] (llama.cpp ffn_*_exps
        layout: E contiguous 2-D payloads)."""
        dt = policy(name)
        x = (rng.standard_normal((e, rows, cols)) * scale).astype(np.float32)
        if dt in (DType.F32,):
            w.add_tensor(name, x)
        else:
            raw = b"".join(bytes(quantize(x[i], dt)) for i in range(e))
            w.add_tensor(name, raw=raw, shape=(e, rows, cols), dtype=dt)

    emit("token_embd.weight", p["vocab"], p["hidden"])
    for i in range(p["layers"]):
        pre = f"blk.{i}."
        w.add_tensor(pre + "attn_norm.weight", np.ones(p["hidden"], np.float32))
        emit(pre + "attn_q.weight", p["hidden"], p["hidden"])
        emit(pre + "attn_k.weight", kv_dim, p["hidden"])
        emit(pre + "attn_v.weight", kv_dim, p["hidden"])
        if arch == "qwen2":
            # qwen2-family QKV biases (f32 vectors, one per projection)
            for nm, n in (("attn_q.bias", p["hidden"]),
                          ("attn_k.bias", kv_dim), ("attn_v.bias", kv_dim)):
                w.add_tensor(pre + nm, (rng.standard_normal(n)
                                        * scale).astype(np.float32))
        if arch in ("qwen3", "qwen3moe", "gemma3"):
            # per-head q/k norms, random so a missing application fails
            for nm in ("attn_q_norm", "attn_k_norm"):
                w.add_tensor(pre + nm + ".weight",
                             (rng.standard_normal(head_dim)
                              * 0.1).astype(np.float32))
        emit(pre + "attn_output.weight", p["hidden"], p["hidden"])
        if arch in ("gemma2", "gemma3"):
            # post norms get RANDOM weights so parity tests catch a
            # missing/misplaced (1+w) application, not just presence
            for nm in ("post_attention_norm", "post_ffw_norm"):
                w.add_tensor(pre + nm + ".weight",
                             (rng.standard_normal(p["hidden"])
                              * 0.1).astype(np.float32))
        w.add_tensor(pre + "ffn_norm.weight", np.ones(p["hidden"], np.float32))
        if moe:
            # router stays f32 (tiny; llama.cpp keeps ffn_gate_inp f32)
            w.add_tensor(pre + "ffn_gate_inp.weight",
                         (rng.standard_normal((moe, p["hidden"]))
                          * scale).astype(np.float32))
            emit_experts(pre + "ffn_gate_exps.weight", moe, p["inter"],
                         p["hidden"])
            emit_experts(pre + "ffn_up_exps.weight", moe, p["inter"],
                         p["hidden"])
            emit_experts(pre + "ffn_down_exps.weight", moe, p["hidden"],
                         p["inter"])
        else:
            emit(pre + "ffn_gate.weight", p["inter"], p["hidden"])
            emit(pre + "ffn_up.weight", p["inter"], p["hidden"])
            emit(pre + "ffn_down.weight", p["hidden"], p["inter"])
    w.add_tensor("output_norm.weight", np.ones(p["hidden"], np.float32))
    if arch not in ("gemma", "gemma2", "gemma3"):
        emit("output.weight", p["vocab"], p["hidden"])
    # the gemma family ties the LM head to the embedding (no output.weight
    # in real gemma GGUFs — the loader's tied fallback covers it)
    w.write()
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--preset", default="tiny", choices=sorted(PRESETS))
    ap.add_argument("--dtype", default="q8_0",
                    choices=["f32", "f16", "q8_0", "q4_0", "q4_k", "q5_k",
                             "q6_k", "q4_k_m"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--gpt2-vocab", action="store_true")
    args = ap.parse_args()
    write_model(args.out, args.preset, args.dtype, args.seed, args.gpt2_vocab)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
