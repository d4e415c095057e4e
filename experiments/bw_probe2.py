import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, K = 14336, 4096
qs = jax.device_put(np.random.default_rng(0).integers(-128, 127, (K, N), dtype=np.int8))
nbytes = K*N

def k_sum(a_ref, o_ref):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
    o_ref[0, 0] += jnp.sum(a_ref[:].astype(jnp.int32))

def bench(tk, tn, iters=100):
    def one(c):
        s = pl.pallas_call(
            k_sum,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            grid=(K//tk, N//tn),
            in_specs=[pl.BlockSpec((tk, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        )(qs + c.astype(jnp.int8))  # data-dep on c
        return s[0, 0]
    @jax.jit
    def loop():
        def body(i, c):
            return (one(c) & 1).astype(jnp.int32)
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))
    r = loop(); r.block_until_ready()
    t0 = time.perf_counter(); loop().block_until_ready()
    dt = (time.perf_counter()-t0)/iters
    print(f"pallas sum {tk}x{tn}: {dt*1e6:7.1f} us {nbytes/dt/1e9:6.0f} GB/s", flush=True)

bench(512, 512)
bench(2048, 1024)
