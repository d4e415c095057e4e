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
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ntransformer_tpu.models.llama import KVCache, forward  # noqa: E402
from ntransformer_tpu.models.loader import load_model  # noqa: E402


def perplexity(model, token_ids: list[int], ctx: int = 512,
               progress=None) -> dict:
    """PPL over non-overlapping windows. Window w predicts tokens
    [1..len) from teacher-forced positions [0..len-1)."""
    arch = model.arch
    ctx = min(ctx, arch.max_seq_len)
    total_nll = 0.0
    total_tok = 0
    n_windows = max(1, len(token_ids) // ctx)
    for w in range(n_windows):
        ids = token_ids[w * ctx: (w + 1) * ctx]
        if len(ids) < 2:
            break
        kv = KVCache.create(model.arch)
        logits, _, _ = forward(arch, model.weights, kv,
                               jnp.asarray(ids, jnp.int32), 0,
                               all_logits=True)
        logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
        targets = np.asarray(ids[1:])
        nll = -logp[np.arange(len(ids) - 1), targets]
        total_nll += float(nll.sum())
        total_tok += len(ids) - 1
        if progress:
            progress(w + 1, n_windows, math.exp(total_nll / total_tok))
    ppl = math.exp(total_nll / max(1, total_tok))
    return {"ppl": ppl, "nll_per_token": total_nll / max(1, total_tok),
            "tokens": total_tok, "windows": n_windows}


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="text corpus")
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--compute", default="quant", choices=["quant", "bf16"])
    args = ap.parse_args()

    model = load_model(args.model, compute=args.compute)
    text = open(args.file, encoding="utf-8", errors="replace").read()
    ids = model.tokenizer.encode(text, add_bos=True)
    print(f"{len(ids)} tokens, ctx {args.ctx}", file=sys.stderr)

    def prog(w, n, ppl):
        print(f"window {w}/{n}: running ppl {ppl:.3f}", file=sys.stderr)

    r = perplexity(model, ids, args.ctx, prog)
    print(f"perplexity: {r['ppl']:.4f}  "
          f"(nll/token {r['nll_per_token']:.4f}, {r['tokens']} tokens)")


if __name__ == "__main__":
    main()
