"""Decode GEMV bandwidth: how fast can each variant stream a Q8_0 plane?

Method: dependent-chain scan over 4 weight copies (defeats VMEM residency),
timed with a D2H readback fence. Reports effective GB/s of quantized bytes.
"""
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from ntransformer_tpu.core.dtypes import DType
from ntransformer_tpu.ops.linear import QLinear, qmatmul
from ntransformer_tpu.ops.pallas.matmul import quant_matmul_pallas
from ntransformer_tpu.models.synth import synth_qlinear

K, N = 4096, 14336
COPIES = 4
STEPS = 64


def timed(name, fn, nbytes):
    r = fn()
    float(r)  # compile + warm
    t0 = time.perf_counter()
    float(fn())
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:<28} {dt*1e6:8.1f} us/call  {nbytes/dt/1e9:7.1f} GB/s")


def chain(step):
    """scan a dependent chain cycling over COPIES weight sets (lax.switch
    with per-copy closures — a traced gather would copy the matrix)."""
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


def main():
    qls = [synth_qlinear(N, K, DType.Q8_0) for _ in range(COPIES)]
    nbytes = qls[0].nbytes
    print(f"plane bytes/matrix: {nbytes/1e6:.1f} MB")
    x0 = jnp.ones((1, K), jnp.bfloat16)

    # A: current pallas kernel
    def step_kernel(x, ci):
        return quant_matmul_pallas(x, qls[ci], out_dtype=jnp.float32)
    run_a = chain(step_kernel)
    timed("pallas current", lambda: run_a(x0), nbytes)

    # D: XLA jnp dequant+dot
    def step_jnp(x, ci):
        return qmatmul(x, qls[ci], use_kernel=False)
    run_d = chain(step_jnp)
    timed("xla dequant+dot", lambda: run_d(x0), nbytes)

    # B: DMA ceiling — pallas kernel that only reduces the int8 plane
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def sum_kernel(q_ref, o_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += q_ref[:].astype(jnp.float32).sum(axis=0, keepdims=True)[:, :128]

    def plane_sum(qsi):
        tk = 2048
        return pl.pallas_call(
            sum_kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            grid=(K // tk,),
            in_specs=[pl.BlockSpec((tk, N), lambda j: (j, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 128), lambda j: (0, 0),
                                   memory_space=pltpu.VMEM),
        )(qsi)

    def step_sum(x, ci):
        s = plane_sum(qls[ci].planes["qs"])
        return jnp.pad(s, ((0, 0), (0, N - 128))) + x[:, :1]
    run_b = chain(step_sum)
    timed("pallas sum-only (DMA cap)", lambda: run_b(x0), nbytes)

    # C: bf16-convert variant of the dequant tile
    def bf16_kernel(x_ref, q_ref, d_ref, o_ref, *, tkh, tn):
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        from ntransformer_tpu.ops.f16bits import f16_bits_to_f32
        dd = f16_bits_to_f32(d_ref[:])
        g = dd.reshape(tkh // 32, 1, tn)
        g = jnp.broadcast_to(g, (tkh // 32, 32, tn)).reshape(tkh, tn)
        w = q_ref[:].astype(jnp.bfloat16) * g.astype(jnp.bfloat16)
        o_ref[:] += jax.lax.dot_general(
            x_ref[:], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def bf16_matmul(x, qsi, di):
        import functools
        tk, tn = 2048, 512
        kern = functools.partial(bf16_kernel, tkh=tk, tn=tn)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            grid=(1, N // tn, K // tk),
            in_specs=[
                pl.BlockSpec((1, tk), lambda t, i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tk, tn), lambda t, i, j: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tk // 32, tn), lambda t, i, j: (j, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tn), lambda t, i, j: (0, i),
                                   memory_space=pltpu.VMEM),
        )(x, qsi, di)

    def step_bf16(x, ci):
        return bf16_matmul(x, qls[ci].planes["qs"], qls[ci].planes["d"])
    run_c = chain(step_bf16)
    timed("pallas bf16-convert", lambda: run_c(x0), nbytes)


if __name__ == "__main__":
    main()
