"""w8a8 int8-MXU serving matmul (r5) — one full-rate int8 dot, any rows.

y = x @ W^T with W requantized at load to per-COLUMN symmetric int8
(core/w8a8.py) and x quantized per ROW to int8 outside the kernel
(XLA-fused jnp ops). The kernel is a 1D grid over N tiles with whole-K
blocks: per grid step ONE [T, K]i8 x [K, tn]i8 -> i32 MXU dot (natural
layout — no transposes, no casts of the weight tile at all) and a rank-1
f32 fixup (am[T, 1] * s[1, tn]), exact given the quantized operands.

This attacks the r5 bisect's batched-matmul gap (docs/PERFORMANCE.md
"the B>=32 serving step"): at B=64 the bf16 MXU time (~5.5 ms) + VPU
dequant casts (~4.3 ms) stopped hiding under the 10.4 ms weight DMA;
int8 dots run at 2x the bf16 MXU rate, there is no weight cast, and the
stream itself drops to 8.03 bits/weight.

Rows are capped at the serving range (decode batches, verify windows);
prefill falls through to the exact-dequant tile path in ops/linear.py —
the same split W4A8 uses (its kernel is T=1 only; this one is T<=256).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
I32 = jnp.int32

# row cap: the [T, K] activation block must fit VMEM next to the weight
# tile (T=2048, K=14336 -> ~29 MB int8 + 7 MB weights + out, inside the
# 100 MB scoped budget). Engine prefill chunks at 512; the bench's single
# T=2048 forward is the extreme. Larger T falls back to the jnp dequant
# path in ops/linear.py.
MAX_ROWS = 2048


def _largest_tile(dim: int, candidates) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    raise ValueError(f"dim {dim} not tileable by {candidates}")


@functools.partial(jax.jit, static_argnames=("k", "n", "tn", "stacked",
                                             "interpret"))
def _w8a8_impl(a_i8, am, q, s, k: int, n: int, tn: int, stacked: bool,
               layer, interpret: bool):
    t = a_i8.shape[0]
    grid = (n // tn,)

    if stacked:
        def amap(i, L):
            return (0, 0)

        def qmap(i, L):
            return (L[0], 0, i)
        a_spec = pl.BlockSpec((t, k), amap, memory_space=pltpu.VMEM)
        am_spec = pl.BlockSpec((t, 1), amap, memory_space=pltpu.VMEM)
        q_spec = pl.BlockSpec((1, k, tn), qmap, memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((1, 1, tn), qmap, memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((t, tn), lambda i, L: (0, i),
                                memory_space=pltpu.VMEM)
    else:
        def amap(i):
            return (0, 0)

        def qmap(i):
            return (0, i)
        a_spec = pl.BlockSpec((t, k), amap, memory_space=pltpu.VMEM)
        am_spec = pl.BlockSpec((t, 1), amap, memory_space=pltpu.VMEM)
        q_spec = pl.BlockSpec((k, tn), qmap, memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((1, tn), qmap, memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((t, tn), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

    def kernel(*args):
        if stacked:
            args = args[1:]  # scalar-prefetch ref unused in the body
        a_r, am_r, q_r, s_r, out = args
        qt = q_r[0] if stacked else q_r[:]
        st = s_r[0] if stacked else s_r[:]
        p = jax.lax.dot_general(a_r[:], qt, (((1,), (0,)), ((), ())),
                                preferred_element_type=I32).astype(F32)
        out[:] = p * am_r[:] * st.astype(F32)

    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    in_specs = [a_spec, am_spec, q_spec, s_spec]
    if stacked:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=in_specs, out_specs=out_spec)
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((t, n), F32),
            grid_spec=grid_spec, interpret=interpret,
            compiler_params=cparams,
        )(jnp.asarray(layer, I32).reshape(1), a_i8, am, q, s)
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((t, n), F32),
        grid=grid, in_specs=in_specs, out_specs=out_spec,
        interpret=interpret, compiler_params=cparams,
    )(a_i8, am, q, s)


def w8a8_matmul_pallas(x: jnp.ndarray, ql, *, out_dtype=jnp.float32,
                       interpret: bool | None = None,
                       layer=None) -> jnp.ndarray:
    """y [T, N] = x [T, K] @ dequant(W)^T via the int8-MXU serving kernel.

    Row quantization (per-row symmetric int8) runs outside the kernel as
    XLA-fused jnp ops; parity target: core/w8a8.w8a8_matmul_golden."""
    from ...core.w8a8 import quantize_rows
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert x.shape[0] <= MAX_ROWS, "w8a8 kernel is a serving-rows path"
    stacked = layer is not None
    q = ql.planes["q"]
    s = ql.planes["s"]
    k, n = q.shape[-2], q.shape[-1]
    a_i8, am = quantize_rows(x.astype(F32), jnp)
    tn = n if (n % 128 == 0 and n <= 512) else _largest_tile(
        n, (512, 256, 128))
    out = _w8a8_impl(a_i8, am, q, s, k, n, tn, stacked, layer, interpret)
    return out.astype(out_dtype)
