"""Perplexity evaluation: the per-bit-width quality check.

The reference validates quantization quality via factual-prompt checks and
quantization round-trip error bounds (SURVEY §4); the north star requires
matching per-bit-width perplexity. This tool measures PPL of a GGUF model
over a text corpus with sliding non-overlapping windows and teacher
forcing — comparable across quantizations of the same model.

Usage: python tools/perplexity.py -m model.gguf -f corpus.txt [--ctx 512]
"""
from __future__ import annotations

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ntransformer_tpu.models.llama import KVCache, forward  # noqa: E402
from ntransformer_tpu.models.loader import load_model  # noqa: E402


from functools import partial


@partial(jax.jit, static_argnames=("arch",), donate_argnames=("kv",))
def _window_nll(arch, weights, kv, ids):
    """Summed NLL of one teacher-forced window, computed ON DEVICE — only
    one scalar crosses the wire per window (a [ctx, vocab] logits readback
    would cost minutes on this rig's tunnel)."""
    logits, kv, _ = forward.__wrapped__(arch, weights, kv, ids, 0,
                                        all_logits=True)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    t = ids.shape[0]
    tgt_logp = jnp.take_along_axis(logp[: t - 1], ids[1:, None],
                                   axis=-1)[:, 0]
    return -tgt_logp.sum()


@partial(jax.jit, static_argnames=("arch",), donate_argnames=("kv",))
def _window_nll_decode(arch, weights, kv, ids):
    """Summed NLL of one window stepped ONE TOKEN AT A TIME (T=1) — this
    exercises the DECODE-path numerics that all_logits prefill does not:
    the w4a8 format quantizes activations to int8 on its T=1 int8-MXU
    kernel but runs exact dequant at T>1, so pricing it honestly requires
    teacher-forcing through the same per-token path serving uses. The KV
    cache rides the scan carry (copied per step — fine at quality-tool
    scale; the serving loop never runs under a scan, see PERFORMANCE.md)."""
    t = ids.shape[0]

    def body(kv, i):
        tok = jax.lax.dynamic_index_in_dim(ids, i, keepdims=True)
        logits, kv, _ = forward.__wrapped__(arch, weights, kv, tok, i)
        logp = jax.nn.log_softmax(logits[0].astype(jnp.float32))
        nxt = jax.lax.dynamic_index_in_dim(ids, i + 1, keepdims=False)
        return kv, -logp[nxt]

    kv, nlls = jax.lax.scan(body, kv, jnp.arange(t - 1))
    return nlls.sum()


def perplexity(model, token_ids: list[int], ctx: int = 512,
               progress=None, mode: str = "prefill") -> dict:
    """PPL over non-overlapping windows. Window w predicts tokens
    [1..len) from teacher-forced positions [0..len-1).

    mode="prefill": one all-logits forward per window (fast; the exact
    T>1 compute path). mode="decode": per-token T=1 stepping — required
    to price decode-only numerics (w4a8 int8 activations)."""
    arch = model.arch
    ctx = min(ctx, arch.max_seq_len)
    total_nll = 0.0
    total_tok = 0
    n_windows = max(1, len(token_ids) // ctx)
    fn = _window_nll if mode == "prefill" else _window_nll_decode
    for w in range(n_windows):
        ids = token_ids[w * ctx: (w + 1) * ctx]
        if len(ids) < 2:
            break
        kv = KVCache.create(model.arch)
        nll = fn(arch, model.weights, kv, jnp.asarray(ids, jnp.int32))
        total_nll += float(nll)  # 4-byte D2H
        total_tok += len(ids) - 1
        if progress:
            progress(w + 1, n_windows, math.exp(total_nll / total_tok))
    ppl = math.exp(total_nll / max(1, total_tok))
    return {"ppl": ppl, "nll_per_token": total_nll / max(1, total_tok),
            "tokens": total_tok, "windows": n_windows, "mode": mode}


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="text corpus")
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--compute", default="quant", choices=["quant", "bf16"])
    ap.add_argument("--mode", default="prefill",
                    choices=["prefill", "decode"],
                    help="decode = per-token T=1 stepping (prices decode-"
                         "only numerics like w4a8 int8 activations)")
    ap.add_argument("--w4a8", action="store_true",
                    help="requantize weights to W4A8 at load")
    ap.add_argument("--windows", type=int, default=0,
                    help="cap the number of ctx windows (0 = all)")
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU backend (jnp fallback kernels) — "
                         "avoids uploading GBs of weights over a slow "
                         "host->TPU link; dequant is bit-identical, so "
                         "cross-dtype comparisons are unaffected")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        from ntransformer_tpu.ops import linear
        linear.KERNEL_MODE = "off"

    model = load_model(args.model, compute=args.compute, w4a8=args.w4a8)
    text = open(args.file, encoding="utf-8", errors="replace").read()
    ids = model.tokenizer.encode(text, add_bos=True)
    if args.windows:
        ids = ids[: args.windows * args.ctx]
    print(f"{len(ids)} tokens, ctx {args.ctx}", file=sys.stderr)

    def prog(w, n, ppl):
        print(f"window {w}/{n}: running ppl {ppl:.3f}", file=sys.stderr)

    r = perplexity(model, ids, args.ctx, prog, mode=args.mode)
    print(f"perplexity: {r['ppl']:.4f}  "
          f"(nll/token {r['nll_per_token']:.4f}, {r['tokens']} tokens)")


if __name__ == "__main__":
    main()
