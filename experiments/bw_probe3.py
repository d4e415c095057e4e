import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KK, N = 4096, 14336
arr = jax.device_put(np.random.default_rng(0).standard_normal((KK, N)).astype(np.float32))
nbytes = KK*N*4

def bench(nstreams, tk, tn, iters=30, dimsem=None):
    def k_sum(c_ref, *rest):
        a_refs, o_ref = rest[:-1], rest[-1]
        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _():
            o_ref[:] = jnp.zeros_like(o_ref) + c_ref[0, 0].astype(jnp.float32)
        acc = jnp.zeros((1, 128), jnp.float32)
        for a in a_refs:
            acc += jnp.sum(a[:], axis=0, keepdims=True)[:, :128]
        o_ref[:] += acc
    grid = (KK // (tk * nstreams), N // tn)
    specs = [pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)]
    for r in range(nstreams):
        specs.append(pl.BlockSpec((tk, tn),
                     lambda i, j, r=r: (i * nstreams + r, j),
                     memory_space=pltpu.VMEM))
    kwargs = {}
    if dimsem:
        kwargs["compiler_params"] = pltpu.CompilerParams(dimension_semantics=dimsem)
    def one(c):
        s = pl.pallas_call(
            k_sum,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            grid=grid,
            in_specs=specs,
            out_specs=pl.BlockSpec((1, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            **kwargs,
        )(c.reshape(1, 1), *([arr] * nstreams))
        return s[0, 0]
    @jax.jit
    def loop():
        def body(i, c):
            return (one(c).astype(jnp.int32) & 1).astype(jnp.int32)
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))
    r = loop(); r.block_until_ready()
    t0 = time.perf_counter(); loop().block_until_ready()
    dt = (time.perf_counter()-t0)/iters
    print(f"streams={nstreams} tile {tk}x{tn} dimsem={dimsem}: {dt*1e6:7.1f} us {nbytes/dt/1e9:6.0f} GB/s", flush=True)

bench(1, 512, 1024)
bench(2, 512, 1024)
bench(4, 512, 1024)
bench(8, 256, 1024)
bench(1, 512, 1024, dimsem=("parallel", "arbitrary"))
