"""w4a8 int8-MXU decode matmul (r5) — the measured escape from the exact
K-quant VPU ceiling (docs/PERFORMANCE.md "the K-quant decode ceiling").

Per-(256-group, column) affine 4-bit codes dot int8-quantized activations
ON THE MXU: the activation vector expands into a block-diagonal [G, K/2]
int8 matrix per half (one row per 256-group), ONE int8 dot against the
unpacked nibble codes yields per-group partials P[g, n], and the scale/min
fixup runs at [G, N] granularity — 256x fewer elements than the weights.
Per-element VPU work drops from ~3.5 ops (exact dequant) to the nibble
unpack (~2.5 ops on this Mosaic: u8 widen, mask/shift, i32->i8 narrow —
int4 planes and int8 shifts do not lower, experiments/w4a8_probe.py), and
the measured kernel runs at 613-645 GB/s effective vs 565 for the best
exact Q4_K kernel (experiments/w4a8_variants.py).

Whole-K tiles only (1D grid over N): every K-dim input is a full-dim
block, which is what the shapes of all supported decode matmuls allow
(K in {4096..28672}); the [K/2, tn] qs tile is 2-15 MB — well inside the
scoped-VMEM budget, still double-buffered by the Pallas pipeline.

The fixup dot runs at Precision.HIGHEST: DEFAULT's one-pass bf16 rounds
the [G,N] s*P operand to ~4e-3 relative (measured), HIGHEST keeps the
fixup exact-in-f32 given the quantized inputs, so the kernel parity-tests
tight (2e-5) against core/w4a8.w4a8_matmul_golden.

Reference contrast: the reference's GEMV family is exact dequant on CUDA
cores (gemm.cu:24-804) and has no quantized-activation path; this kernel
is the TPU-native trade (idle MXU at batch 1, VPU-bound dequant).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.dtypes import DType
from ...core.w4a8 import GRP, UNIT, quantize_activations

F32 = jnp.float32
I32 = jnp.int32
I8 = jnp.int8


def _largest_tile(dim: int, candidates) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    raise ValueError(f"dim {dim} not tileable by {candidates}")


def _blockdiag_i8(a_i32, g, grp):
    """[1, tkh] int32 activation codes -> [g, tkh] int8 block-diagonal."""
    tkh = a_i32.shape[1]
    rows = jax.lax.broadcasted_iota(I32, (g, tkh), 0)
    cols = jax.lax.broadcasted_iota(I32, (g, tkh), 1) // grp
    return jnp.where(rows == cols, jnp.broadcast_to(a_i32, (g, tkh)),
                     0).astype(I8)


def _idot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=I32)


@functools.partial(jax.jit, static_argnames=("k", "n", "interpret",
                                             "stacked", "tn"))
def _w4a8_decode_impl(a_lo, a_hi, fix_lhs, planes_tuple, k: int, n: int,
                      interpret: bool, stacked: bool, layer, tn: int):
    """y [1, n] f32. planes_tuple = (qs, s_lo, s_hi, m_lo, m_hi), each with
    a leading [L] dim when stacked (layer scalar-prefetched)."""
    qs, s_lo, s_hi, m_lo, m_hi = planes_tuple
    kh = k // 2
    g2 = k // UNIT          # groups per half (= fixup-plane rows)
    grid = (n // tn,)

    if stacked:
        def amap(i, L):
            return (0, 0)

        def pmap(i, L):
            return (L[0], 0, i)
        a_spec = pl.BlockSpec((1, kh), amap, memory_space=pltpu.VMEM)
        f_spec = pl.BlockSpec((1, g2), amap, memory_space=pltpu.VMEM)
        qs_spec = pl.BlockSpec((1, kh, tn), pmap, memory_space=pltpu.VMEM)
        sm_spec = pl.BlockSpec((1, g2, tn), pmap, memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, tn), lambda i, L: (0, i),
                                memory_space=pltpu.VMEM)
    else:
        def amap(i):
            return (0, 0)

        def pmap(i):
            return (0, i)
        a_spec = pl.BlockSpec((1, kh), amap, memory_space=pltpu.VMEM)
        f_spec = pl.BlockSpec((1, g2), amap, memory_space=pltpu.VMEM)
        qs_spec = pl.BlockSpec((kh, tn), pmap, memory_space=pltpu.VMEM)
        sm_spec = pl.BlockSpec((g2, tn), pmap, memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, tn), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

    def kernel(*args):
        if stacked:
            args = args[1:]  # scalar-prefetch ref unused in the body
        al, ah, alf, ahf, xlf, xhf, q_r, sl_r, sh_r, ml_r, mh_r, out = args
        if stacked:
            q, sl, sh, ml, mh = q_r[0], sl_r[0], sh_r[0], ml_r[0], mh_r[0]
        else:
            q, sl, sh, ml, mh = q_r[:], sl_r[:], sh_r[:], ml_r[:], mh_r[:]
        g = kh // GRP
        qi = q.astype(I32)
        lo = (qi & 0x0F).astype(I8)
        hi = (qi >> 4).astype(I8)
        p_lo = _idot(_blockdiag_i8(al[:], g, GRP), lo).astype(F32)
        p_hi = _idot(_blockdiag_i8(ah[:], g, GRP), hi).astype(F32)

        # four SEPARATE fixup dots measured faster than one concatenated
        # [1,4G]x[4G,tn] dot (46.3 vs 57.4 us — the in-kernel concat
        # materializes). HIGHEST keeps the fixup exact-in-f32; the xsum
        # operands arrive NEGATED so everything accumulates with +.
        def hdot(a, b):
            return jnp.dot(a, b, preferred_element_type=F32,
                           precision=jax.lax.Precision.HIGHEST)
        out[:] = (hdot(alf[:], p_lo * sl) + hdot(ahf[:], p_hi * sh)
                  + hdot(xlf[:], ml) + hdot(xhf[:], mh))

    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    in_specs = [a_spec, a_spec, f_spec, f_spec, f_spec, f_spec,
                qs_spec, sm_spec, sm_spec, sm_spec, sm_spec]
    alf, ahf, xlf, xhf = fix_lhs
    if stacked:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=in_specs, out_specs=out_spec)
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, n), F32),
            grid_spec=grid_spec, interpret=interpret,
            compiler_params=cparams,
        )(jnp.asarray(layer, I32).reshape(1), a_lo, a_hi, alf, ahf, xlf, xhf,
          qs, s_lo, s_hi, m_lo, m_hi)
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((1, n), F32),
        grid=grid, in_specs=in_specs, out_specs=out_spec,
        interpret=interpret, compiler_params=cparams,
    )(a_lo, a_hi, alf, ahf, xlf, xhf, qs, s_lo, s_hi, m_lo, m_hi)


def w4a8_decode_pallas(x: jnp.ndarray, ql, *, out_dtype=jnp.float32,
                       interpret: bool | None = None,
                       layer=None) -> jnp.ndarray:
    """y [1, N] = x [1, K] @ dequant(W)^T via the int8-MXU decode kernel.

    Activation quantization (per-256-group int8 + exact group sums for the
    min term) runs outside the kernel as XLA-fused jnp ops."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert x.shape[0] == 1, "w4a8 decode kernel is T=1 only"
    stacked = layer is not None
    ref = ql.planes["qs"]
    kh, n = (ref.shape[-2], ref.shape[-1])
    k = kh * 2
    acts = quantize_activations(x.astype(F32), jnp)
    fix_lhs = (acts["alpha_lo"], acts["alpha_hi"],
               -acts["xsum_lo"], -acts["xsum_hi"])
    planes_tuple = tuple(ql.planes[nm]
                         for nm in ("qs", "s_lo", "s_hi", "m_lo", "m_hi"))
    tn = n if n % 128 else _largest_tile(n, (512, 256, 128))
    out = _w4a8_decode_impl(acts["a_lo"], acts["a_hi"], fix_lhs,
                            planes_tuple, k, n, interpret, stacked,
                            layer, tn)
    return out.astype(out_dtype)
