"""W8A8: the engine-native int8-MXU SERVING format (r5).

The r5 B>=32 bisect (docs/PERFORMANCE.md "the B>=32 serving step")
measured the batched matmul term at 12.93 ms/step at B=64 against a 10.4
ms weights-DMA floor: at large B the MXU time (~5.5 ms bf16) plus the
in-kernel dequant casts (~4.3 ms VPU) no longer hide under the weight
stream. W8A8 removes both: weights requantized ONCE at load to
per-COLUMN symmetric int8 codes, activations quantized per ROW to int8
at runtime, and every matmul becomes ONE natural-layout int8 MXU dot —
  y[t, n] = (a_i8[t, :] . q[:, n]) * (amax[t]/127) * s[n]
with the scale fixup a rank-1 outer product OUTSIDE the contraction
(exact given the quantized operands). int8 dots run at 2x the MXU's bf16
rate and there is no weight cast at all; the weight stream itself is
8.03 bits/weight vs Q8_0's 8.5 (per-column scales amortize to nothing),
so the DMA floor DROPS too.

Unlike W4A8 (a T=1 decode-only kernel with group-diagonal activation
expansion), the single-dot structure works for EVERY row count — decode
at any batch size, speculative verify windows, prefill.

This CHANGES NUMERICS vs the source dtype (per-column weight requant +
int8 activations); it is opt-in (--w8a8 / NT_W8A8) and priced by
tools/quality_gate.py. The reference has no analogue (its GEMV is exact
dequant on CUDA cores, gemm.cu:24-804).

Format:
  q  int8 [K, N]   w = q * s  (symmetric, q in [-127, 127])
  s  f32  [1, N]   per-column scale = absmax(col)/127
"""
from __future__ import annotations

import numpy as np


def _xp(a):
    if isinstance(a, np.ndarray):
        return np
    import jax.numpy as jnp
    return jnp


def requant_w8a8(w_t, xp=None):
    """[K, N] f32 dequantized W^T -> w8a8 planes dict (numpy or jnp)."""
    xp = xp or _xp(w_t)
    w = w_t.astype(xp.float32)
    s = xp.max(xp.abs(w), axis=0, keepdims=True) / 127.0  # [1, N]
    s = xp.where(s > 0, s, xp.ones_like(s))
    q = xp.clip(xp.round(w / s), -127, 127).astype(
        xp.int8 if xp is not np else np.int8)
    return {"q": q, "s": s.astype(xp.float32)}


def dequant_w8a8(planes, k: int, n: int, xp=None):
    """Planes -> W^T [K, N] f32."""
    xp = xp or _xp(planes["q"])
    return planes["q"].astype(xp.float32) * planes["s"].astype(xp.float32)


def quantize_rows(x, xp=None):
    """Per-row symmetric int8 activation quant: (codes int8 [T, K],
    scale f32 [T, 1]) with x ~= codes * scale."""
    xp = xp or _xp(x)
    am = xp.max(xp.abs(x), axis=-1, keepdims=True) / 127.0  # [T, 1]
    am = xp.where(am > 0, am, xp.ones_like(am))
    codes = xp.clip(xp.round(x / am), -127, 127).astype(
        xp.int8 if xp is not np else np.int8)
    return codes, am.astype(xp.float32)


def w8a8_matmul_golden(x, planes, k: int, n: int, xp=None):
    """Reference semantics of the kernel: quantize rows, int32 dot, rank-1
    fixup. The Pallas kernel (ops/pallas/w8a8.py) must match this to f32
    rounding (parity tests)."""
    xp = xp or _xp(x)
    a, am = quantize_rows(x.astype(xp.float32), xp)
    if xp is np:
        p = a.astype(np.int32) @ planes["q"].astype(np.int32)
        p = p.astype(np.float32)
    else:
        import jax
        p = jax.lax.dot_general(a, planes["q"], (((1,), (0,)), ((), ())),
                                preferred_element_type=xp.int32
                                ).astype(xp.float32)
    return p * am * planes["s"].astype(xp.float32)
