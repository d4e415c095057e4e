"""(historical r3 probe; the kernel now lives behind the deferred
batched_decode_step — see tests/test_batched_flash.py) On-TPU probe for
the batched flash-decode kernel: Mosaic compile + parity vs the jnp
reference at 8B-like shapes, bf16 and int8 caches, plus isolated
per-call timing (delta-iteration method is overkill here; chained
dispatch + end fence matches the serving loop's usage).

Semantics note: the kernel attends cache rows [0, pos-1] plus the
current token's k/v passed as a virtual block; the jnp reference attends
[0, pos] of a fully-written cache. For parity the virtual block is fed
the cache's own row at pos.

Run: python experiments/batched_flash_probe.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import math
import numpy as np
import jax
import jax.numpy as jnp

from ntransformer_tpu.models.batched import batched_attention
from ntransformer_tpu.ops.pallas.batched_attention import flash_decode_batched


def stamp(m):
    print(f"# [{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def run(B, Hq, Hkv, S, D, quant, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    k = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    pos = rng.integers(0, S, B).astype(np.int32)
    scale = 1.0 / math.sqrt(D)
    bidx = np.arange(B)
    if quant:
        ks = np.abs(k).max(-1, keepdims=True) / 127.0 + 1e-9
        vs = np.abs(v).max(-1, keepdims=True) / 127.0 + 1e-9
        kc = np.round(k / ks).astype(np.int8)
        vc = np.round(v / vs).astype(np.int8)
        kv_k = (jnp.asarray(kc), jnp.asarray(ks.astype(np.float32)))
        kv_v = (jnp.asarray(vc), jnp.asarray(vs.astype(np.float32)))
        # virtual block = the cache's own row at pos (see module docstring)
        k_new = (jnp.asarray(kc[bidx, :, pos]),
                 jnp.asarray(ks[bidx, :, pos].astype(np.float32)))
        v_new = (jnp.asarray(vc[bidx, :, pos]),
                 jnp.asarray(vs[bidx, :, pos].astype(np.float32)))
    else:
        kv_k = jnp.asarray(k, jnp.bfloat16)
        kv_v = jnp.asarray(v, jnp.bfloat16)
        k_new = jnp.asarray(k[bidx, :, pos], jnp.bfloat16)
        v_new = jnp.asarray(v[bidx, :, pos], jnp.bfloat16)
    posj = jnp.asarray(pos)

    def call_kernel(qq):
        return flash_decode_batched(qq, kv_k, kv_v, k_new, v_new, posj, scale)

    def call_jnp(qq):
        return batched_attention(qq, kv_k, kv_v, posj, scale)

    t0 = time.perf_counter()
    a_np = np.asarray(call_kernel(q))
    stamp(f"kernel compile+run {time.perf_counter()-t0:.1f}s")
    b = np.asarray(call_jnp(q))
    err = np.max(np.abs(a_np - b)) / (np.max(np.abs(b)) + 1e-9)
    tag = "int8" if quant else "bf16"
    stamp(f"B={B} S={S} {tag}: rel err {err:.2e}")
    assert err < 2e-2, err

    # chained timing, two lengths to cancel the fence
    def loop(f, n):
        x = q
        for _ in range(n):
            x = f(x)
        np.asarray(x)

    for f, name in ((call_kernel, "kernel"), (call_jnp, "jnp")):
        loop(f, 2)
        t0 = time.perf_counter(); loop(f, 8); t1 = time.perf_counter()
        loop(f, 24); t2 = time.perf_counter()
        dt = ((t2 - t1) - (t1 - t0)) / 16
        stamp(f"  {name}: {dt*1e6:.0f} us/call")


if __name__ == "__main__":
    stamp(f"device: {jax.devices()[0].device_kind}")
    run(8, 32, 8, 1024, 128, quant=False)
    run(8, 32, 8, 4096, 128, quant=False)
    run(32, 32, 8, 1024, 128, quant=True)
    run(32, 32, 8, 4096, 128, quant=True)
    print("OK")
