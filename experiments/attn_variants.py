"""Standalone batched flash-decode kernel shootout at serving shapes
(r5 verdict item 6): time ONLY the attention term — a scan over L layers
of flash_decode_batched against the stacked int8 cache — across dot_impl
variants, B in {32, 64}, block targets.

The full-step bisect (b64_bisect.py) measured attention at 7.4 ms of the
22.8 ms B=64 step. Theory: DMA floor = B*L*(K+V tile) = 4.3 GB -> 5.3 ms
at peak; per-grid-step fixed cost ~1.5 us * 2048 steps = 3.1 ms; VPU
int8->f32 tile casts = 134M elements/call... which of these binds, and
which dot variant (f32 exact, bf16 casts, int8 MXU codes — score side,
v side, both) moves it?

Run: python experiments/attn_variants.py [B] [pos]
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from functools import partial

from ntransformer_tpu.ops.pallas.batched_attention import flash_decode_batched

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
POS = int(sys.argv[2]) if len(sys.argv) > 2 else 512
L, HKV, HQ, S, D = 32, 8, 32, 1024, 128


def stamp(m):
    print(f"# [{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


@partial(jax.jit, static_argnames=("dot_impl",))
def attn_scan(q, kc, ks, vc, vs, kn, kns, vn, vns, pos, dot_impl):
    def body(acc, li):
        o = flash_decode_batched(
            q, (kc, ks), (vc, vs), (kn, kns), (vn, vns), pos,
            0.088388, layer=li, dot_impl=dot_impl)
        return acc + o, None
    acc, _ = jax.lax.scan(body, jnp.zeros((B, HQ, D), jnp.float32),
                          jnp.arange(L, dtype=jnp.int32))
    return acc


def main():
    key = jax.random.PRNGKey(0)
    kc = jax.random.randint(key, (L, B, HKV, S, D), -127, 128, jnp.int8)
    vc = jax.random.randint(key, (L, B, HKV, S, D), -127, 128, jnp.int8)
    ks = jnp.full((L, B, HKV, S), 0.01, jnp.float32)
    vs = jnp.full((L, B, HKV, S), 0.01, jnp.float32)
    q = jax.random.normal(key, (B, HQ, D), jnp.float32)
    kn = jax.random.randint(key, (B, HKV, D), -127, 128, jnp.int8)
    vn = jax.random.randint(key, (B, HKV, D), -127, 128, jnp.int8)
    kns = jnp.full((B, HKV, 1), 0.01, jnp.float32)
    vns = jnp.full((B, HKV, 1), 0.01, jnp.float32)
    pos = jnp.full((B,), POS, jnp.int32)
    gb = (kc.nbytes + vc.nbytes + ks.nbytes + vs.nbytes) / 1e9
    stamp(f"B={B} pos={POS}: stacked cache {gb:.1f} GB, "
          f"target {os.environ.get('NT_ATTN_BLOCK_TARGET', '(default)')}")

    variants = os.environ.get(
        "NT_ATTN_VARIANTS", "f32,bf16,int8,int8_s,int8_v").split(",")
    results = {}
    for dv in variants:
        def run(n):
            o = None
            for _ in range(n):
                o = attn_scan(q, kc, ks, vc, vs, kn, kns, vn, vns, pos, dv)
            np.asarray(o[:1, :1, :1])
        run(2)
        iters = 8
        t0 = time.perf_counter(); run(iters); t1 = time.perf_counter()
        run(3 * iters); t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / (2 * iters)
        results[dv] = round(dt * 1e3, 2)
        eff = 2 * min(POS, S) / S * gb / dt  # live-bytes effective rate
        stamp(f"{dv:8s}: {dt*1e3:6.2f} ms/scan "
              f"({gb/dt:.0f} GB/s padded, {eff:.0f} GB/s live)")
    print(json.dumps({"metric": "attn_variants", "B": B, "pos": POS,
                      "cache_gb": round(gb, 2),
                      "block_target": os.environ.get(
                          "NT_ATTN_BLOCK_TARGET", "default"),
                      "ms": results}), flush=True)


if __name__ == "__main__":
    main()
