"""Where does the batched decode step's time go? Bisect by ablation.

NOTE: this prober uses the JNP (scatter) step structure — it measured the
original pathology (write = 2/3 of the step). The production step now
defers all writes into one bulk Pallas append (models/batched.py); compare
via experiments/batched_scaling.py with NT_BATCHED_FLASH=on/off.

B=32 int8 measured 59 ms/step where theory says ~17 (weights 13 + cache
3.3): something besides the matmuls and attention dominates. Build variant
steps that REMOVE one component at a time and difference the timings:

  full        — the real batched_decode_step
  no_attn     — attention replaced by a zero tensor (keeps KV writes)
  no_write    — KV writes skipped (cache passed through; keeps attention)
  no_kv       — both removed: pure matmul path (upper bound = weights bw)
  no_head     — full minus the LM head matmul (vocab cost)

Each variant is a separate jit of the same layer structure; chained
dispatch + end fence, delta-of-two-lengths timing (quirks: broken
block_until_ready, 27 ms readback floor).

Run: python experiments/batched_cost_bisect.py [B] [quant]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ntransformer_tpu.models.batched import (BatchedKV, batched_attention,
                                             _batched_layer_step)
from ntransformer_tpu.models.llama import rms_norm
from ntransformer_tpu.models.synth import synth_model
from ntransformer_tpu.ops.layers import apply_rope, swiglu
from ntransformer_tpu.ops.linear import embed_lookup, qmatmul

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
QUANT = (sys.argv[2] == "int8") if len(sys.argv) > 2 else True
CTX = 1024


def stamp(m):
    print(f"# [{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


@partial(jax.jit, static_argnames=("arch", "mode"), donate_argnames=("kv",))
def step_variant(arch, weights, kv, tokens, pos, active, mode="full"):
    x = embed_lookup(weights.embed, tokens, out_dtype=jnp.float32)
    d2 = arch.head_dim // 2

    def rope_rows(p):
        c = jax.lax.dynamic_slice(weights.rope_cos, (p, 0), (1, d2))
        s = jax.lax.dynamic_slice(weights.rope_sin, (p, 0), (1, d2))
        return c, s
    cos_t, sin_t = jax.vmap(rope_rows)(pos)
    Hq, Hkv, D = arch.n_heads, arch.n_kv_heads, arch.head_dim

    def layer(x, lw, kv_k, kv_v, li):
        def norm_w(w):
            return jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
        h = rms_norm(x, norm_w(lw.attn_norm), arch.norm_eps).astype(jnp.bfloat16)
        if lw.wqkv is not None:
            qkv = qmatmul(h, lw.wqkv, layer=li)
            nq, nkv = Hq * D, Hkv * D
            q = qkv[:, :nq].reshape(B, 1, Hq, D)
            k = qkv[:, nq:nq + nkv].reshape(B, 1, Hkv, D)
            v = qkv[:, nq + nkv:].reshape(B, 1, Hkv, D)
        else:
            q = qmatmul(h, lw.wq, layer=li).reshape(B, 1, Hq, D)
            k = qmatmul(h, lw.wk, layer=li).reshape(B, 1, Hkv, D)
            v = qmatmul(h, lw.wv, layer=li).reshape(B, 1, Hkv, D)
        q = jax.vmap(apply_rope, (0, 0, 0, None))(q, cos_t, sin_t, False)
        k = jax.vmap(apply_rope, (0, 0, 0, None))(k, cos_t, sin_t, False)
        k_t = jnp.swapaxes(k, 1, 2)
        v_t = jnp.swapaxes(v, 1, 2)

        def write(cache, new, p, act):
            dc = cache.shape[-1]
            cur = jax.lax.dynamic_slice(cache, (0, p, 0), (Hkv, 1, dc))
            return jax.lax.dynamic_update_slice(
                cache, jnp.where(act, new.astype(cache.dtype), cur), (0, p, 0))

        def append(caches, rows):
            return tuple(jax.vmap(write)(c, r, pos, active)
                         for c, r in zip(caches, rows))

        if mode != "no_write" and mode != "no_kv":
            if isinstance(kv_k, tuple):
                kc, ksc = kv_k
                vc, vsc = kv_v
                ks_new = jnp.max(jnp.abs(k_t), -1, keepdims=True) / 127.0 + 1e-9
                vs_new = jnp.max(jnp.abs(v_t), -1, keepdims=True) / 127.0 + 1e-9
                kq = jnp.round(k_t / ks_new).astype(jnp.int8)
                vq = jnp.round(v_t / vs_new).astype(jnp.int8)
                kc, ksc, vc, vsc = append((kc, ksc, vc, vsc),
                                          (kq, ks_new, vq, vs_new))
                kv_k, kv_v = (kc, ksc), (vc, vsc)
            else:
                kv_k, kv_v = append((kv_k, kv_v), (k_t, v_t))
        if mode in ("no_attn", "no_kv"):
            att = jnp.zeros((B, Hq, D), jnp.float32) + q.reshape(B, Hq, D)
        else:
            att = batched_attention(q.reshape(B, Hq, D), kv_k, kv_v, pos,
                                    1.0 / math.sqrt(D))
        o = qmatmul(att.reshape(B, Hq * D).astype(jnp.bfloat16), lw.wo,
                    layer=li)
        x = x + o
        hf = rms_norm(x, norm_w(lw.ffn_norm), arch.norm_eps).astype(jnp.bfloat16)
        if lw.w_gate_up is not None:
            gu = qmatmul(hf, lw.w_gate_up, layer=li)
            it = gu.shape[-1] // 2
            g, u = gu[:, :it], gu[:, it:]
        else:
            g = qmatmul(hf, lw.w_gate, layer=li)
            u = qmatmul(hf, lw.w_up, layer=li)
        dn = qmatmul(swiglu(g, u).astype(jnp.bfloat16), lw.w_down, layer=li)
        return x + dn, kv_k, kv_v

    def body(carry, inp):
        x = carry
        li, kk, vv = inp
        x, kk, vv = layer(x, weights.layers, kk, vv, li)
        return x, (kk, vv)

    idx = jnp.arange(arch.n_layers, dtype=jnp.int32)
    kv_k = (kv.k, kv.ks) if kv.quantized else kv.k
    kv_v = (kv.v, kv.vs) if kv.quantized else kv.v
    x, (nk, nv) = jax.lax.scan(body, x, (idx, kv_k, kv_v))
    x = rms_norm(x, weights.output_norm, arch.norm_eps)
    if mode == "no_head":
        logits = x[:, :1] * 1.0
    else:
        logits = qmatmul(x.astype(jnp.bfloat16), weights.lm_head)
    if kv.quantized:
        nbkv = BatchedKV(nk[0], nv[0], nk[1], nv[1])
    else:
        nbkv = BatchedKV(nk, nv)
    return logits, nbkv


def bench(arch, weights, mode, iters=16):
    kv = BatchedKV.create(arch, B, quant=QUANT)
    tokens = jnp.arange(B, dtype=jnp.int32) + 3
    active = jnp.ones(B, bool)

    def run(n, base):
        nonlocal kv
        for i in range(n):
            logits, kv = step_variant(arch, weights, kv, tokens,
                                      jnp.full(B, base + i, jnp.int32),
                                      active, mode=mode)
        np.asarray(logits[:, 0])

    run(3, CTX // 2)
    t0 = time.perf_counter(); run(iters, CTX // 2 + 4); t1 = time.perf_counter()
    run(3 * iters, CTX // 2 + 8); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (2 * iters)


def main():
    stamp(f"B={B} quant={QUANT}: building synth 8b q8_0")
    cfg, arch, weights = synth_model("8b", "q8_0", max_seq_len=CTX)
    results = {}
    for mode in ("full", "no_attn", "no_write", "no_kv", "no_head"):
        dt = bench(arch, weights, mode)
        results[mode] = round(dt * 1e3, 2)
        stamp(f"{mode:9s}: {dt*1e3:7.2f} ms/step")
    full = results["full"]
    stamp(f"attention cost ~{full - results['no_attn']:.2f} ms, "
          f"kv-write cost ~{full - results['no_write']:.2f} ms, "
          f"lm-head cost ~{full - results['no_head']:.2f} ms")
    import json
    print(json.dumps({"metric": "batched_cost_bisect", "B": B,
                      "quant": QUANT, "ms": results}), flush=True)


if __name__ == "__main__":
    main()
