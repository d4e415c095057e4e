"""Single-sequence decode cost bisect per weight dtype — where do the
sub-byte dtypes lose their kernel-level bandwidth in-model? (r2 weak #1:
Q4_K kernels hit 565 GB/s isolated but Q4_K_M decodes at ~425 GB/s.)

Modes ablate one component from the fused greedy decode loop:
  full     — the real per-layer step (matmuls + rope + kv write + attn + head)
  no_attn  — attention replaced by a pass-through of q
  no_kv    — no KV write and no attention
  no_head  — no LM-head matmul
  matmul   — ONLY the 7 matmuls back-to-back (no rope/norm even)

Timing: the whole loop is one jit (lax.scan over n tokens), delta of two
token counts cancels the fence.

Run: python experiments/decode_cost_bisect.py [dtype] [preset]
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

from ntransformer_tpu.models.llama import KVCache
from ntransformer_tpu.models.synth import model_nbytes, synth_model
from ntransformer_tpu.ops.layers import apply_rope, attention, rms_norm, swiglu
from ntransformer_tpu.ops.linear import embed_lookup, qmatmul

DTYPE = sys.argv[1] if len(sys.argv) > 1 else "q4_k_m"
PRESET = sys.argv[2] if len(sys.argv) > 2 else "8b"
CTX = 1024
N_TOK = 24


def stamp(m):
    print(f"# [{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


@partial(jax.jit, static_argnames=("arch", "mode", "n"),
         donate_argnames=("kv",))
def decode_loop(arch, weights, kv, token, pos0, mode="full", n=N_TOK):
    Hq, Hkv, D = arch.n_heads, arch.n_kv_heads, arch.head_dim
    d2 = D // 2

    def layer(x, lw, kk, vv, li, cos_t, sin_t):
        def norm_w(w):
            return jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
        if mode == "matmul":
            h = x.astype(jnp.bfloat16)
        else:
            h = rms_norm(x, norm_w(lw.attn_norm), arch.norm_eps).astype(jnp.bfloat16)
        if lw.wqkv is not None:
            qkv = qmatmul(h, lw.wqkv, layer=li)
            nq, nkv = Hq * D, Hkv * D
            q = qkv[:, :nq].reshape(1, Hq, D)
            k = qkv[:, nq:nq + nkv].reshape(1, Hkv, D)
            v = qkv[:, nq + nkv:].reshape(1, Hkv, D)
        elif lw.wqk is not None:
            qk = qmatmul(h, lw.wqk, layer=li)
            nq = Hq * D
            q = qk[:, :nq].reshape(1, Hq, D)
            k = qk[:, nq:].reshape(1, Hkv, D)
            v = qmatmul(h, lw.wv, layer=li).reshape(1, Hkv, D)
        else:
            q = qmatmul(h, lw.wq, layer=li).reshape(1, Hq, D)
            k = qmatmul(h, lw.wk, layer=li).reshape(1, Hkv, D)
            v = qmatmul(h, lw.wv, layer=li).reshape(1, Hkv, D)
        if mode in ("full", "no_head"):
            q = apply_rope(q, cos_t, sin_t, arch.rope_interleaved)
            k = apply_rope(k, cos_t, sin_t, arch.rope_interleaved)
            kk = jax.lax.dynamic_update_slice(
                kk, jnp.swapaxes(k, 0, 1).astype(kk.dtype), (0, pos0, 0))
            vv = jax.lax.dynamic_update_slice(
                vv, jnp.swapaxes(v, 0, 1).astype(vv.dtype), (0, pos0, 0))
            att = attention(q, kk, vv, pos0, 1, 1.0 / math.sqrt(D))
        elif mode == "no_attn":
            kk = jax.lax.dynamic_update_slice(
                kk, jnp.swapaxes(k, 0, 1).astype(kk.dtype), (0, pos0, 0))
            vv = jax.lax.dynamic_update_slice(
                vv, jnp.swapaxes(v, 0, 1).astype(vv.dtype), (0, pos0, 0))
            att = q * 1.0 + v.sum() * 0  # keep k/v alive
        else:  # no_kv / matmul
            att = q * 1.0 + (k.sum() + v.sum()) * 0
        o = qmatmul(att.reshape(1, Hq * D).astype(jnp.bfloat16), lw.wo,
                    layer=li)
        x = x + o
        if mode == "matmul":
            hf = x.astype(jnp.bfloat16)
        else:
            hf = rms_norm(x, norm_w(lw.ffn_norm), arch.norm_eps).astype(jnp.bfloat16)
        if lw.w_gate_up is not None:
            gu = qmatmul(hf, lw.w_gate_up, layer=li)
            it = gu.shape[-1] // 2
            g, u = gu[:, :it], gu[:, it:]
        else:
            g = qmatmul(hf, lw.w_gate, layer=li)
            u = qmatmul(hf, lw.w_up, layer=li)
        dn = qmatmul(swiglu(g, u).astype(jnp.bfloat16), lw.w_down, layer=li)
        return x + dn, kk, vv

    def step(carry, i):
        kv, tok = carry
        x = embed_lookup(weights.embed, tok[None], out_dtype=jnp.float32)
        cos_t = jax.lax.dynamic_slice(weights.rope_cos, (pos0 + i, 0), (1, d2))
        sin_t = jax.lax.dynamic_slice(weights.rope_sin, (pos0 + i, 0), (1, d2))

        def body(carry, inp):
            x = carry
            li, kk, vv = inp
            x, kk, vv = layer(x, weights.layers, kk, vv, li, cos_t, sin_t)
            return x, (kk, vv)
        idx = jnp.arange(arch.n_layers, dtype=jnp.int32)
        x, (nk, nv) = jax.lax.scan(body, x, (idx, kv.k, kv.v))
        x = rms_norm(x, weights.output_norm, arch.norm_eps)
        if mode == "no_head":
            nxt = jnp.argmax(x[0, :64]).astype(jnp.int32)
        else:
            logits = qmatmul(x.astype(jnp.bfloat16), weights.lm_head)
            nxt = jnp.argmax(logits[0]).astype(jnp.int32)
        return (KVCache(nk, nv), nxt), nxt

    (kv, _), toks = jax.lax.scan(step, (kv, token),
                                 jnp.arange(n, dtype=jnp.int32))
    return toks, kv


def bench(arch, weights, mode):
    kv = KVCache.create(arch)
    tok = jnp.int32(3)

    def run(n, base):
        nonlocal kv
        toks, kv2 = decode_loop(arch, weights, kv, tok, jnp.int32(base),
                                mode=mode, n=n)
        kv = kv2
        np.asarray(toks)

    # warm up BOTH program lengths — n is a STATIC jit arg, so each count
    # is its own compile; an unwarmed 3N run lands the compile inside the
    # timed window (+C/(2N) per token — the first version of this prober
    # reported 125 ms/tok that way)
    run(N_TOK, CTX // 4)
    run(3 * N_TOK, CTX // 4 + 2)
    t0 = time.perf_counter(); run(N_TOK, CTX // 4 + 6); t1 = time.perf_counter()
    run(3 * N_TOK, CTX // 4 + 8); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (2 * N_TOK)


def main():
    stamp(f"building synth {PRESET} {DTYPE} (fused)")
    cfg, arch, weights = synth_model(PRESET, DTYPE, max_seq_len=CTX, fuse=True)
    nbytes = model_nbytes(weights)
    stamp(f"model {nbytes/1e9:.2f} GB")
    results = {}
    for mode in ("full", "no_attn", "no_kv", "no_head", "matmul"):
        dt = bench(arch, weights, mode)
        results[mode] = round(dt * 1e3, 3)
        stamp(f"{mode:8s}: {dt*1e3:7.3f} ms/tok = {1/dt:6.1f} tok/s "
              f"({nbytes/dt/1e9:.0f} GB/s)")
    import json
    print(json.dumps({"metric": "decode_cost_bisect", "dtype": DTYPE,
                      "preset": PRESET, "bytes": nbytes, "ms": results}),
          flush=True)


if __name__ == "__main__":
    main()
