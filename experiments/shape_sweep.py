"""Per-shape tile sweep of the SHIPPED fused dequant+matmul kernels
(r1 verdict item 1c): the in-model decode runs seven shapes, but the
variant shootout only tuned gate/up — measure every 8B shape × (tn, tk)
candidate through the real quant_matmul_pallas and report the best.

Shapes (K → N), 8B: q/o 4096→4096, k/v 4096→1024, fused qkv 4096→6144,
gate/up 4096→14336, fused gate|up 4096→28672, down 14336→4096.

Run: python experiments/shape_sweep.py [q4_k|q6_k|q8_0|all]
"""
import itertools
import json
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

from ntransformer_tpu.core.dtypes import DType
from ntransformer_tpu.core.layout import LAYOUTS
from ntransformer_tpu.ops.linear import QLinear
from ntransformer_tpu.ops.pallas import matmul as mm

SHAPES = [  # (k, n, label)
    (4096, 4096, "q/o"),
    (4096, 1024, "k/v"),
    (4096, 6144, "qkv-fused"),
    (4096, 14336, "gate/up"),
    (4096, 28672, "gateup-fused"),
    (14336, 4096, "down"),
]
ITERS = 100


def stamp(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def synth_planes(dtype: DType, k: int, n: int, seed=0):
    key = jax.random.PRNGKey(seed)
    planes = {}
    for spec in LAYOUTS[dtype]:
        rows = k // spec.rows_div
        key, sub = jax.random.split(key)
        if spec.np_dtype == "uint16":
            planes[spec.name] = jnp.full((rows, n), 0x1C00, jnp.uint16)
        elif spec.np_dtype == "int8":
            planes[spec.name] = jax.random.randint(sub, (rows, n), -16, 16,
                                                   jnp.int8)
        else:
            planes[spec.name] = jax.random.randint(sub, (rows, n), 0, 256,
                                                   jnp.uint8)
    return planes


def time_shape(dtype: DType, k: int, n: int, tn: int, tk: int,
               x, ql) -> float:
    mm.TILE_OVERRIDE[(dtype, k, n)] = (tn, tk)
    # the tiling is a static jit arg resolved per call — each override is
    # a distinct cache entry (clear_cache never forced a retrace; r3 fix)

    import functools

    m = min(k, n)
    # small shapes run in ~5-25 us — scale the iteration count so the
    # timed delta is ≥~50 ms, well above tunnel/readback jitter
    iters = max(ITERS, int(200 * (4096 * 14336) / (k * n)))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(x, iters):
        def body(i, x):
            y = mm.quant_matmul_pallas(x, ql, interpret=False)
            return x.at[:, :m].add(1e-30 * y[:, :m])
        return jax.lax.fori_loop(0, iters, body, x)

    n1, n2 = iters, 5 * iters
    np.asarray(loop(x, n1))
    np.asarray(loop(x, n2))
    t0 = time.perf_counter()
    np.asarray(loop(x, n1))
    t1 = time.perf_counter()
    np.asarray(loop(x, n2))
    t2 = time.perf_counter()
    del mm.TILE_OVERRIDE[(dtype, k, n)]
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    dtypes = ([DType.Q4_K, DType.Q6_K, DType.Q8_0] if which == "all"
              else [DType[which.upper()]])
    best = {}
    for dtype in dtypes:
        for k, n, label in SHAPES:
            planes = synth_planes(dtype, k, n)
            ql = QLinear(dtype, k, n, planes)
            nbytes = ql.nbytes
            x = jax.random.normal(jax.random.PRNGKey(1), (1, k),
                                  jnp.float32) * 0.5
            default = mm._pick_tiles(dtype, k, n)
            # candidate grids: tk must keep every plane's rows %8==0 or
            # whole; stick to 2048-multiples + whole-K (and 1024 for Q8_0)
            tks = [t for t in (k, 8192, 6144, 4096, 2048) if k % t == 0]
            if dtype == DType.Q8_0:
                tks += [t for t in (1024,) if k % t == 0]
            # large-N shapes: tn=512 only (256 never won there; halves
            # the sweep's compile count on the minutes-slow remote path)
            tns = [512] if n >= 14336 else [t for t in (512, 256) if n % t == 0]
            results = []
            for tn, tk in itertools.product(tns, dict.fromkeys(tks)):
                try:
                    dt = time_shape(dtype, k, n, tn, tk, x, ql)
                except Exception as e:
                    stamp(f"{dtype.name} {label} tn={tn} tk={tk}: "
                          f"FAIL {str(e)[:60]}")
                    continue
                results.append((dt, tn, tk))
                mark = " <-default" if (tn, tk) == default else ""
                stamp(f"{dtype.name:5s} {label:13s} tn={tn:3d} tk={tk:5d}: "
                      f"{dt*1e6:7.1f} us  {nbytes/dt/1e9:5.0f} GB/s{mark}")
            if results:
                results.sort()
                dt, tn, tk = results[0]
                ddt = dict(((tn_, tk_), dt_) for dt_, tn_, tk_ in results)
                dflt = ddt.get(default, float("inf"))
                best[f"{dtype.name}:{k}x{n}"] = {
                    "tn": tn, "tk": tk, "us": round(dt * 1e6, 1),
                    "default_us": round(dflt * 1e6, 1),
                    "gain_pct": round(100 * (dflt - dt) / dflt, 1)}
    print(json.dumps(best, indent=1), flush=True)


if __name__ == "__main__":
    main()
