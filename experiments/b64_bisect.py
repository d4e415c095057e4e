"""Bisect the LARGE-batch serving step (r5 verdict item 6): where do the
23.1 ms at B=64 go?

The r3 bisect (batched_cost_bisect.py) measured the OLD jnp-scatter step;
this one ablates the PRODUCTION deferred-write kernel step component by
component, reusing the production helpers so every variant is the real
code minus exactly one term:

  full       — production batched_decode_step (kernel impl, int8 KV)
  no_attn    — flash kernel replaced by att=q (rows still quantized,
               bulk append still runs): full - attention read cost
  no_append  — attention runs, post-scan bulk append skipped:
               full - append cost
  no_head    — LM head matmul dropped: full - head cost
  matmul     — no_attn + no_append + no_head: the weights-bandwidth floor

Theory at B=64, ctx=1024, int8 KV, pos~512: weights 8.53 GB -> 10.4 ms
floor; attention reads B*L*2*Hkv*block_span*D int8 codes — with the
current 2 MB block target block_s==S==1024, so the per-sequence DMA
elision (index-map clamp) NEVER fires and every sequence reads the full
padded cache: 64*32*2.1 MB = 4.3 GB/step that should be ~2.2 GB at
mid-context. NT_ATTN_BLOCK_TARGET sweeps the block size in a second pass
(separate processes — the block choice latches at trace time).

Run: python experiments/b64_bisect.py [B] [pos]
"""
import json
import math
import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from ntransformer_tpu.models.batched import (BatchedKV, _qkv_rows, _ffn_tail,
                                             _quantize_rows,
                                             batched_decode_step)
from ntransformer_tpu.models.llama import layer_window, rms_norm
from ntransformer_tpu.models.synth import synth_model
from ntransformer_tpu.ops.linear import embed_lookup, qmatmul
from ntransformer_tpu.ops.pallas.batched_attention import flash_decode_batched
from ntransformer_tpu.ops.pallas.kv_update import append_rows_stacked

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
POS = int(sys.argv[2]) if len(sys.argv) > 2 else 512
CTX = int(os.environ.get("NT_BISECT_CTX", "1024"))


def stamp(m):
    print(f"# [{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


@partial(jax.jit, static_argnames=("arch", "mode"), donate_argnames=("kv",))
def step_variant(arch, weights, kv, tokens, pos, active, mode):
    x = embed_lookup(weights.embed, tokens, out_dtype=jnp.float32)
    d2 = arch.head_dim // 2

    def rope_rows(p):
        c = jax.lax.dynamic_slice(weights.rope_cos, (p, 0), (1, d2))
        s = jax.lax.dynamic_slice(weights.rope_sin, (p, 0), (1, d2))
        return c, s
    cos_t, sin_t = jax.vmap(rope_rows)(pos)
    Hq, D = arch.n_heads, arch.head_dim
    scale = 1.0 / math.sqrt(D)

    def body(carry, li):
        x = carry
        q, k_t, v_t = _qkv_rows(arch, x, weights.layers, cos_t, sin_t, li)
        kq, ks_new, vq, vs_new = _quantize_rows(k_t, v_t)
        if mode in ("no_attn", "matmul"):
            att = q.reshape(B, Hq, D).astype(jnp.float32)
        else:
            window, _ = layer_window(arch, li)
            att = flash_decode_batched(
                q.reshape(B, Hq, D), (kv.k, kv.ks), (kv.v, kv.vs),
                (kq, ks_new), (vq, vs_new), pos, scale, layer=li,
                active=active, window=window)
        x = _ffn_tail(arch, x, att, weights.layers, li, None)
        return x, (kq, ks_new, vq, vs_new)

    idx = jnp.arange(arch.n_layers, dtype=jnp.int32)
    x, rows = jax.lax.scan(body, x, idx)
    if mode in ("no_append", "matmul"):
        new = kv
    else:
        kc, ksc, vc, vsc = append_rows_stacked(
            (kv.k, kv.ks, kv.v, kv.vs),
            (rows[0], rows[1], rows[2], rows[3]), pos, active)
        new = BatchedKV(kc, vc, ksc, vsc)
    x = rms_norm(x, weights.output_norm, arch.norm_eps)
    if mode in ("no_head", "matmul"):
        logits = x[:, :128] * 1.0
    else:
        logits = qmatmul(x.astype(jnp.bfloat16), weights.lm_head)
    return logits, new


def bench(arch, weights, mode, iters=12):
    kv = BatchedKV.create(arch, B, quant=True)
    tokens = jnp.arange(B, dtype=jnp.int32) + 3
    active = jnp.ones(B, bool)

    s_live = os.environ.get("NT_BISECT_SLIVE")
    s_live = int(s_live) if s_live else None

    def run(n, base):
        nonlocal kv
        for i in range(n):
            if mode == "prod":
                logits, kv = batched_decode_step(
                    arch, weights, kv, tokens,
                    jnp.full(B, base + i, jnp.int32), active,
                    s_live=s_live)
            else:
                logits, kv = step_variant(
                    arch, weights, kv, tokens,
                    jnp.full(B, base + i, jnp.int32), active, mode)
        np.asarray(logits[:, 0])

    run(3, POS)
    t0 = time.perf_counter(); run(iters, POS + 4); t1 = time.perf_counter()
    run(3 * iters, POS + 8); t2 = time.perf_counter()
    del kv
    import gc
    gc.collect()
    return ((t2 - t1) - (t1 - t0)) / (2 * iters)


def main():
    tgt = os.environ.get("NT_ATTN_BLOCK_TARGET", "(default)")
    stamp(f"B={B} pos={POS} int8 KV, block target {tgt}: synth 8b q8_0")
    cfg, arch, weights = synth_model("8b", "q8_0", max_seq_len=CTX)
    modes = ("prod", "full", "no_attn", "no_append", "no_head")
    if os.environ.get("NT_BISECT_MODES"):
        modes = tuple(os.environ["NT_BISECT_MODES"].split(","))
    elif os.environ.get("NT_BISECT_PROD_ONLY"):
        modes = ("prod",)
    results = {}
    for mode in modes:
        dt = bench(arch, weights, mode)
        results[mode] = round(dt * 1e3, 2)
        stamp(f"{mode:10s}: {dt*1e3:7.2f} ms/step")
    if "full" in results:
        full = results["full"]
        stamp(f"attention ~{full - results['no_attn']:.2f} ms, "
              f"append ~{full - results['no_append']:.2f} ms, "
              f"head ~{full - results['no_head']:.2f} ms "
              f"(prod {results['prod']:.2f})")
    print(json.dumps({"metric": "b64_bisect", "B": B, "pos": POS,
                      "block_target": tgt, "ms": results}), flush=True)


if __name__ == "__main__":
    main()
