"""Kernel design experiments for the decode GEMV (not shipped; findings feed
ops/pallas/matmul.py). Run on the real TPU."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntransformer_tpu.core import DType, quantize
from ntransformer_tpu.core.layout import relayout
from ntransformer_tpu.ops.f16bits import f16_bits_to_f32

F32 = jnp.float32
N, K = 14336, 4096


def timed(name, fn, x, nbytes, iters=100):
    @jax.jit
    def loop(x):
        def body(i, x):
            y = fn(x)
            return x + 1e-20 * y[0, :K].sum()
        return jax.lax.fori_loop(0, iters, body, x)
    r = loop(x); r.block_until_ready()
    t0 = time.perf_counter()
    loop(x).block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s}: {dt*1e6:7.1f} us  {nbytes/dt/1e9:6.0f} GB/s")


def make_q8(n, k):
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    raw = quantize(w, DType.Q8_0)
    planes = {nm: jax.device_put(v) for nm, v in relayout(raw, DType.Q8_0, n, k).items()}
    nbytes = sum(int(v.size) * v.dtype.itemsize for v in planes.values())
    return planes, nbytes


planes, nbytes = make_q8(N, K)
x = jnp.asarray(np.random.default_rng(1).standard_normal((1, K)).astype(np.float32) * 0.5)


def variant(tn, tk, body):
    grid = (N // tn, K // tk)

    def kern(x_ref, qs_ref, d_ref, out_ref):
        @pl.when(pl.program_id(1) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[:] += body(x_ref, qs_ref, d_ref, tk, tn)

    def run(xx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, N), F32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((tk, tn), lambda i, j: (j, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((tk // 32, tn), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        )(xx, planes["qs"], planes["d"])
    return run


def v0_f32(x_ref, qs_ref, d_ref, tk, tn):
    d = f16_bits_to_f32(d_ref[:])
    g = d.reshape(tk // 32, 1, tn)
    g = jnp.broadcast_to(g, (tk // 32, 32, tn)).reshape(tk, tn)
    w = qs_ref[:].astype(jnp.int32).astype(F32) * g
    return jnp.dot(x_ref[:], w, preferred_element_type=F32)


def v1_3d(x_ref, qs_ref, d_ref, tk, tn):
    d = f16_bits_to_f32(d_ref[:])  # [tk/32, tn]
    q3 = qs_ref[:].astype(jnp.int32).astype(F32).reshape(tk // 32, 32, tn)
    w = (q3 * d[:, None, :]).reshape(tk, tn)
    return jnp.dot(x_ref[:], w, preferred_element_type=F32)


def v2_bf16(x_ref, qs_ref, d_ref, tk, tn):
    d = f16_bits_to_f32(d_ref[:]).astype(jnp.bfloat16)
    q3 = qs_ref[:].astype(jnp.bfloat16).reshape(tk // 32, 32, tn)
    w = (q3 * d[:, None, :]).reshape(tk, tn)
    return jnp.dot(x_ref[:].astype(jnp.bfloat16), w,
                   preferred_element_type=F32)


def v3_int8mxu(x_ref, qs_ref, d_ref, tk, tn):
    # quantize x per 32-group to int8, block-diagonal int8 MXU matmul,
    # then scale fixup on the [tk/32, tn] partials (VPU work /32)
    g = tk // 32
    xv = x_ref[:].reshape(g, 32)
    sx = jnp.max(jnp.abs(xv), axis=1, keepdims=True) / 127.0  # [g, 1]
    xq = jnp.round(xv / sx).astype(jnp.int8)  # [g, 32]
    # block-diagonal M [g, tk]
    row = jax.lax.broadcasted_iota(jnp.int32, (g, tk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (g, tk), 1)
    xq_b = jnp.broadcast_to(xq.reshape(1, tk), (g, tk)).astype(jnp.int8)
    m = jnp.where(col // 32 == row, xq_b, jnp.int8(0))
    p = jax.lax.dot_general(m, qs_ref[:],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)  # [g, tn]
    d = f16_bits_to_f32(d_ref[:])
    y = jnp.sum(p.astype(F32) * (d * sx), axis=0, keepdims=True)
    return y


for name, tn, tk, body in [
    ("v0 f32 bcast 512x512", 512, 512, v0_f32),
    ("v1 f32 3d 512x512", 512, 512, v1_3d),
    ("v2 bf16 512x512", 512, 512, v2_bf16),
    ("v2 bf16 512x1024", 512, 1024, v2_bf16),
    ("v2 bf16 1024x512", 1024, 512, v2_bf16),
    ("v3 int8mxu 512x512", 512, 512, v3_int8mxu),
    ("v3 int8mxu 512x1024", 512, 1024, v3_int8mxu),
    ("v3 int8mxu 1024x1024", 1024, 1024, v3_int8mxu),
    ("v3 int8mxu 2048x1024", 2048, 1024, v3_int8mxu),
]:
    try:
        timed(name, variant(tn, tk, body), x, nbytes)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:120]}")
