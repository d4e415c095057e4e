"""Batched-decode scaling curve on the real chip (r1 verdict item 4): the
economic argument for batching on MXUs, measured — aggregate tok/s and
per-step latency for B in {1, 2, 4, 8, 16, 32}, bf16 KV vs int8 KV, on the
synthetic 8B Q8_0 model (decode timing is weight-value-independent).

Expected shape: decode is weight-bandwidth-bound, so per-step time should
be ~flat in B until attention/KV traffic (which scales with B) or MXU
compute catches up — aggregate tok/s then scales ~linearly until the
crossover. int8 KV halves the per-B KV traffic, pushing the crossover out.

Run: python experiments/batched_scaling.py [preset]
"""
import json
import os
import sys
import time

import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from ntransformer_tpu.models.batched import BatchedKV, batched_decode_step
from ntransformer_tpu.models.synth import synth_model

PRESET = sys.argv[1] if len(sys.argv) > 1 else "8b"
CTX = 1024
BATCHES = (1, 2, 4, 8, 16, 32)  # bf16 full curve
INT8_BATCHES = (8, 16, 32, 64)  # int8: bigger B (bf16 B>=32 KV no longer fits HBM)


def stamp(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def bench_batch(arch, weights, B: int, quant: bool, iters=24) -> float:
    """Per-step seconds, HOST-CHAINED exactly like the serving loop uses
    the step (a lax.scan wrapper measured ~4x SLOWER than reality — the
    scan carry defeats in-place donation of the multi-GB batched cache;
    the server never runs the step under a scan, so chained dispatch +
    one end fence is the honest harness). Two timed rounds of different
    lengths cancel the constant fence cost."""
    bkv = BatchedKV.create(arch, B, quant=quant)
    tokens = jnp.arange(B, dtype=jnp.int32) + 3
    active = jnp.ones(B, bool)
    # the server's s_live fill bucket (4-rung ladder, r5): mid-context
    # positions land in the 3/4 rung — the dispatch production serving
    # would use (NT_ATTN_BUCKETS=0 reverts to the r4 full-S methodology)
    sl = None
    if os.environ.get("NT_ATTN_BUCKETS", "4") != "0":
        need = CTX // 2 + 16 + 3 * iters + 1
        sl = next((b for b in (CTX // 4, CTX // 2, 3 * CTX // 4)
                   if b >= 256 and b >= need), None)

    def run(n, pos_base):
        nonlocal bkv, tokens
        for i in range(n):
            logits, bkv = batched_decode_step(
                arch, weights, bkv, tokens,
                jnp.full(B, pos_base + i, jnp.int32), active, s_live=sl)
            tokens = jnp.argmax(logits, -1).astype(jnp.int32)
        np.asarray(tokens)  # true fence

    n1, n2 = iters, 3 * iters
    run(n1, CTX // 2)                      # compile + warm
    t0 = time.perf_counter()
    run(n1, CTX // 2 + 8)
    t1 = time.perf_counter()
    run(n2, CTX // 2 + 16)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


def main():
    stamp(f"building synth {PRESET} q8_0 (ctx {CTX})")
    cfg, arch, weights = synth_model(PRESET, "q8_0", max_seq_len=CTX)
    w_bytes = sum(int(x.size) * x.dtype.itemsize
                  for x in jax.tree.leaves(weights))
    stamp(f"model {w_bytes/1e9:.2f} GB on device")
    results = []
    for quant in (False, True):
        kv_name = "int8" if quant else "bf16"
        batches = BATCHES if not quant else INT8_BATCHES
        for B in batches:
            try:
                dt = bench_batch(arch, weights, B, quant)
            except Exception as e:  # OOM at large B x ctx
                stamp(f"B={B} kv={kv_name}: failed {str(e)[:80]}")
                continue
            agg = B / dt
            eff_bw = w_bytes / dt / 1e9  # weight stream per step
            results.append({"B": B, "kv": kv_name,
                            "step_ms": round(dt * 1e3, 2),
                            "agg_tok_s": round(agg, 1),
                            "weight_bw_gbps": round(eff_bw, 1)})
            stamp(f"B={B:3d} kv={kv_name}: {dt*1e3:7.2f} ms/step = "
                  f"{agg:8.1f} tok/s aggregate ({eff_bw:.0f} GB/s weights)")
    print(json.dumps({"metric": "batched_decode_scaling", "preset": PRESET,
                      "ctx": CTX, "points": results}), flush=True)


if __name__ == "__main__":
    main()
