"""Fused scan-over-tokens around the DEFERRED batched decode step.

r2 measured lax.scan around the OLD batched step 11x slow (the scan ys
duplicated the cache and defeated donation). The deferred-write step
mutates the cache in place via one aliased bulk append, so the cache can
ride the scan CARRY — if XLA keeps it in place, host dispatch leaves the
per-token cost entirely (the chained-dispatch B=1 number already beats
the single-seq fused loop: 11.98 ms vs 12.95).

Run: python experiments/batched_loop_probe.py [B...]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, __file__.rsplit("/", 2)[0])

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ntransformer_tpu.models.batched import BatchedKV, batched_decode_body
from ntransformer_tpu.models.synth import synth_model

CTX = 1024
N = 16


def stamp(m):
    print(f"# [{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


@partial(jax.jit, static_argnames=("arch", "n"), donate_argnames=("bkv",))
def fused_loop(arch, weights, bkv, tokens, pos0, n):
    active = jnp.ones(tokens.shape[0], bool)

    def step(carry, i):
        bkv, toks = carry
        # un-jitted body: this scan IS the enclosing transform (the
        # jitted wrapper lost __wrapped__ when the jit moved inward)
        logits, bkv = batched_decode_body(
            arch, weights, bkv, toks, pos0 + i, active)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        return (bkv, nxt), nxt[0]

    (bkv, _), first = jax.lax.scan(step, (bkv, tokens),
                                   jnp.arange(n, dtype=jnp.int32))
    return first, bkv


def bench(arch, weights, B):
    bkv = BatchedKV.create(arch, B)
    tokens = jnp.arange(B, dtype=jnp.int32) + 3

    def run(base):
        nonlocal bkv
        toks, bkv2 = fused_loop(arch, weights, bkv,
                                jnp.full(B, tokens[0], jnp.int32),
                                jnp.full(B, base, jnp.int32), N)
        bkv = bkv2
        np.asarray(toks)

    run(CTX // 2)
    t0 = time.perf_counter(); run(CTX // 2 + N); t1 = time.perf_counter()
    run(CTX // 2 + 2 * N); run(CTX // 2 + 3 * N)
    run(CTX // 2 + 4 * N)
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / (2 * N)
    stamp(f"B={B:3d} fused loop: {dt*1e3:7.2f} ms/step = "
          f"{B/dt:8.1f} tok/s aggregate")
    return dt


def main():
    batches = [int(a) for a in sys.argv[1:]] or [1, 8, 32]
    stamp("building synth 8b q8_0 (fused weights)")
    cfg, arch, weights = synth_model("8b", "q8_0", max_seq_len=CTX, fuse=True)
    import json
    out = []
    for B in batches:
        try:
            dt = bench(arch, weights, B)
            out.append({"B": B, "step_ms": round(dt * 1e3, 2),
                        "agg_tok_s": round(B / dt, 1)})
        except Exception as e:
            stamp(f"B={B}: failed {str(e)[:120]}")
    print(json.dumps({"metric": "batched_fused_loop", "ctx": CTX,
                      "points": out}), flush=True)


if __name__ == "__main__":
    main()
