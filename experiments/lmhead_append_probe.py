"""Two targeted probes for the r3 decode-cost residue (decode_cost_bisect):

1. LM-HEAD SHAPE: the [K=4096 -> N=128256] matmul costs ~1.5 ms/tok for
   Q4_K_M (Q6_K head) in-model (~280 GB/s vs the 603 GB/s square-shape
   kernel rate). V=128256 is not 512-divisible, so _pick_tiles drops to
   tn=256 -> 501 grid steps. Variants: default, smaller tk, and N padded
   to the next 512/2048 multiple (pad columns dequant to 0; logits get
   masked outside).

2. KV APPEND: the bulk in-place append (append_rows_stacked) costs
   ~0.7-1.4 ms/tok at B=1 (the [L,1,Hkv,tile,Dc] block is 2*L*Hkv strided
   4 KB chunks — latency-bound). Variants: the kernel, plain XLA
   dynamic_update_slice on the stacked cache (scalar pos at B=1 /
   unrolled per-b at B=8), and a transposed PENDING-window design
   ([T,B,L,Hkv,Dc] row write is one contiguous DMA; flush every T steps).

Run: python experiments/lmhead_append_probe.py [lmhead|append|all]
"""
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import json
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from ntransformer_tpu.core.dtypes import DType
from ntransformer_tpu.models.synth import synth_qlinear
from ntransformer_tpu.ops.pallas import matmul as mm
from ntransformer_tpu.ops.pallas.kv_update import append_rows_stacked

K = 4096
V = 128256
COPIES = 4
STEPS = 64
RESULTS = []


def stamp(m):
    print(f"# [{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def record(**kw):
    RESULTS.append(kw)
    print(json.dumps(kw), flush=True)


# --- probe 1: LM-head shape ---------------------------------------------------

def chain(step, x0):
    @jax.jit
    def run(x0):
        def body(x, i):
            y = jax.lax.switch(i % COPIES,
                               [lambda x, c=c: step(x, c)
                                for c in range(COPIES)], x)
            x = (x0 + y[:, :K] * 1e-9).astype(x0.dtype)
            return x, None
        x, _ = jax.lax.scan(body, x0, jnp.arange(STEPS))
        return x.sum()
    return run


def lmhead_case(dtype: str, n: int, tiles=None):
    dt = DType(dtype)
    if tiles is not None:
        # the tiling is a STATIC jit arg of _quant_matmul_impl, so the
        # override is honored on the next call (clear_cache was never
        # enough — jax's global trace cache ignores it, so earlier runs
        # of the override rows re-timed the default tiling)
        mm.TILE_OVERRIDE[(dt, K, n)] = tiles
    try:
        qls = [synth_qlinear(n, K, dt) for _ in range(COPIES)]
        nbytes = qls[0].nbytes
        x0 = jnp.ones((1, K), jnp.bfloat16)

        def step(x, ci):
            return mm.quant_matmul_pallas(x, qls[ci], out_dtype=jnp.float32)
        run = chain(step, x0)
        float(run(x0))  # compile + warm
        t0 = time.perf_counter()
        float(run(x0))
        dt_call = (time.perf_counter() - t0) / STEPS
        tag = f"{dtype} n={n} tiles={tiles or 'default'}"
        stamp(f"lmhead {tag:<40} {dt_call*1e6:8.1f} us  "
              f"{nbytes/dt_call/1e9:6.1f} GB/s")
        record(metric="lmhead_shape", dtype=dtype, n=n,
               tiles=list(tiles) if tiles else None,
               us=round(dt_call * 1e6, 1),
               gb_s=round(nbytes / dt_call / 1e9, 1))
    finally:
        if tiles is not None:
            del mm.TILE_OVERRIDE[(dt, K, n)]


def probe_lmhead():
    for dtype, n, tiles in [
        ("q6_k", V, None),            # shipped: tn=256, tk=4096
        ("q6_k", V, (256, 2048)),
        ("q6_k", V, (128, 4096)),
        ("q6_k", 128512, None),       # pad -> tn=512 default
        ("q6_k", 129024, (512, 4096)),
        ("q4_k", V, None),
        ("q4_k", 128512, None),
        ("q8_0", V, None),            # the near-full-rate reference point
        ("q8_0", 128512, None),
    ]:
        lmhead_case(dtype, n, tiles)


# --- probe 2: KV append -------------------------------------------------------

L, HKV, S, D = 32, 8, 1024, 128


def timed_chain(name, fn, state, iters=64, **meta):
    """Host-chained donated calls; delta of two counts cancels the fence."""
    def run(n, st):
        for _ in range(n):
            st = fn(st)
        np.asarray(jax.tree.leaves(st)[0][0])  # D2H fence (tiny slice)
        return st
    state = run(8, state)          # compile + warm
    t0 = time.perf_counter()
    state = run(iters, state)
    t1 = time.perf_counter()
    state = run(3 * iters, state)
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / (2 * iters)
    stamp(f"append {name:<36} {dt*1e6:8.1f} us/step")
    record(metric="kv_append", variant=name, us=round(dt * 1e6, 1), **meta)
    return state


def mk_caches(b, dtype):
    shape = (L, b, HKV, S, D)
    if dtype == "int8":
        sshape = shape[:-1] + (1,)
        return (jnp.zeros(shape, jnp.int8), jnp.zeros(sshape, jnp.float32),
                jnp.zeros(shape, jnp.int8), jnp.zeros(sshape, jnp.float32))
    return (jnp.zeros(shape, jnp.bfloat16), jnp.zeros(shape, jnp.bfloat16))


def mk_rows(b, dtype):
    if dtype == "int8":
        return (jnp.ones((L, b, HKV, D), jnp.int8),
                jnp.ones((L, b, HKV, 1), jnp.float32),
                jnp.ones((L, b, HKV, D), jnp.int8),
                jnp.ones((L, b, HKV, 1), jnp.float32))
    return (jnp.ones((L, b, HKV, D), jnp.bfloat16),
            jnp.ones((L, b, HKV, D), jnp.bfloat16))


def probe_append():
    for b, cdt in [(1, "bf16"), (8, "bf16"), (8, "int8")]:
        rows = mk_rows(b, cdt)
        active = jnp.ones(b, bool)

        # A: the shipped Pallas bulk append
        def step_kernel(st, _rows=rows, _act=active, _b=b):
            caches, pos = st
            out = append_rows_stacked(caches, _rows, pos, _act)
            return (out, pos + 1)
        st = (mk_caches(b, cdt), jnp.full(b, 64, jnp.int32))
        timed_chain(f"kernel b={b} {cdt}", step_kernel, st, B=b, cache=cdt,
                    variant_kind="pallas_bulk")

        # B: plain XLA dynamic_update_slice (scalar pos at B=1; unrolled
        # per-sequence at B>1 — each slot's row is a scalar-index DUS)
        @partial(jax.jit, donate_argnums=(0,))
        def dus_step(st, _rows=rows, _b=b):
            caches, pos = st
            out = []
            for c, r in zip(caches, _rows):
                dc = c.shape[-1]
                r5 = r.reshape(L, _b, HKV, 1, dc).astype(c.dtype)
                for bb in range(_b):
                    c = jax.lax.dynamic_update_slice(
                        c, r5[:, bb:bb + 1],
                        (0, bb, 0, pos[bb], 0))
                out.append(c)
            return (tuple(out), pos + 1)
        st = (mk_caches(b, cdt), jnp.full(b, 64, jnp.int32))
        timed_chain(f"dus b={b} {cdt}", dus_step, st, B=b, cache=cdt,
                    variant_kind="xla_dus")

        # C: transposed pending-window write ([T,B,L,Hkv,Dc] — the row
        # write is ONE contiguous DMA) + amortized flush every T steps
        if cdt == "bf16":
            # measured as its two pieces: the per-step pending write and
            # the per-T-steps flush
            T = 16
            pend_shape = (T, b, L, HKV, D)
            pend = jnp.zeros(pend_shape, jnp.bfloat16)

            @partial(jax.jit, donate_argnums=(0,))
            def pend_write(st, _rows=rows, _b=b):
                pend, pos = st
                t = pos % T
                row = _rows[0].transpose(1, 0, 2, 3).reshape(
                    1, _b, L, HKV, D).astype(pend.dtype)
                return (jax.lax.dynamic_update_slice(
                    pend, row, (t, 0, 0, 0, 0)), pos + 1)
            st = (pend, jnp.int32(0))
            timed_chain(f"pend-write b={b} {cdt}", pend_write, st, B=b,
                        cache=cdt, variant_kind="pending_write")

            # flush: [T,B,L,H,D] -> [L,B,H,T,D] transpose + aligned DUS
            @partial(jax.jit, donate_argnums=(0,))
            def flush(st, _b=b):
                caches, pend, base = st
                slab = pend.transpose(2, 1, 3, 0, 4)  # [L,B,H,T,D]
                c0 = jax.lax.dynamic_update_slice(
                    caches[0], slab.astype(caches[0].dtype),
                    (0, 0, 0, base, 0))
                return ((c0,) + caches[1:], pend, base + T)
            st = ((mk_caches(b, cdt)[0],), jnp.zeros(pend_shape, jnp.bfloat16),
                  jnp.int32(0))
            timed_chain(f"pend-flush1 b={b} {cdt}", flush, st, B=b,
                        cache=cdt, variant_kind="pending_flush_one_cache",
                        note="per-T-steps cost for ONE cache; /T amortized")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("lmhead", "all"):
        probe_lmhead()
    if which in ("append", "all"):
        probe_append()
    stamp("done")


if __name__ == "__main__":
    main()
