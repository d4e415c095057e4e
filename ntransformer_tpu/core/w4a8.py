"""W4A8: the engine-native inexact decode format (r5).

The r4 measurements proved exact K-quant dequant is VPU-bound (~3.5 VPU
ops/element; matmuls-only floor 10.79 ms/tok for 8B Q4_K_M — see
docs/PERFORMANCE.md "the K-quant decode ceiling"). W4A8 is the measured
escape: weights requantized ONCE at load to 4-bit affine codes with
per-(256-element, output-column) f32 scale/min planes, activations
quantized per-256-group to int8 at runtime, and the decode matmul done as
an int8 MXU dot with the scale fixup applied at group granularity (256x
fewer elements than the weights). experiments/w4a8_variants.py measured
the kernel at 613-645 GB/s effective on the 8B shapes — within ~7% of the
chip's Q8_0 DMA record — vs 565 for the best exact Q4_K kernel.

This CHANGES NUMERICS vs the source dtype (requant error + int8
activations); it is opt-in (--w4a8 / NT_W4A8) and priced by
tools/quality_gate.py. The reference has no analogue (its GEMV is exact
dequant, gemm.cu:24-804); this is a TPU-native trade: the MXU is idle at
batch 1, the VPU is the bottleneck, so the dot moves to the MXU.

Format (split unit 512; lo half = EVEN 256-groups, hi half = ODD):
  qs    uint8 [K/2, N]  row 256c+j packs (elem 512c+j) | (elem 512c+256+j)<<4
  s_lo  f32 [K/512, N]  scale of group 2c   (w = s*q - m, q in [0,15])
  s_hi  f32 [K/512, N]  scale of group 2c+1
  m_lo  f32 [K/512, N]  -min of group 2c
  m_hi  f32 [K/512, N]  -min of group 2c+1

4.25 bits/weight total (vs Q4_K's 4.625): codes 4.0 + four f32 planes/512.

K must be a multiple of 512 (true for every supported architecture's
hidden/intermediate sizes).
"""
from __future__ import annotations

import numpy as np

GRP = 256     # quant group along K
UNIT = 512    # lo/hi split unit (2 groups)


def _xp(a):
    if isinstance(a, np.ndarray):
        return np
    import jax.numpy as jnp
    return jnp


def requant_w4a8(w_t, xp=None):
    """[K, N] f32 dequantized W^T -> w4a8 planes dict (numpy or jnp in/out).

    Per (256-group, column) affine: scale = (max-min)/15, q = round((w-min)/
    scale) in [0,15], so dequant is s*q - m with m = -min. Degenerate groups
    (max == min) store q = 0, s = 1, m = -min.
    """
    xp = xp or _xp(w_t)
    k, n = w_t.shape
    if k % UNIT:
        raise ValueError(f"w4a8 needs K % {UNIT} == 0, got K={k}")
    g_all = k // GRP
    wg = w_t.reshape(g_all, GRP, n).astype(xp.float32)
    mx = wg.max(axis=1)
    mn = wg.min(axis=1)
    scale = (mx - mn) / 15.0
    scale = xp.where(scale > 0, scale, xp.ones_like(scale))
    q = xp.clip(xp.round((wg - mn[:, None, :]) / scale[:, None, :]),
                0, 15).astype(xp.uint8 if xp is np else "uint8")
    lo = q.reshape(g_all // 2, 2, GRP, n)[:, 0].reshape(k // 2, n)
    hi = q.reshape(g_all // 2, 2, GRP, n)[:, 1].reshape(k // 2, n)
    qs = (lo | (hi << 4)).astype("uint8")
    s2 = scale.reshape(g_all // 2, 2, n)
    m2 = (-mn).reshape(g_all // 2, 2, n)
    return {
        "qs": qs,
        "s_lo": s2[:, 0].astype(xp.float32),
        "s_hi": s2[:, 1].astype(xp.float32),
        "m_lo": m2[:, 0].astype(xp.float32),
        "m_hi": m2[:, 1].astype(xp.float32),
    }


def dequant_w4a8(planes, k: int, n: int, xp=None):
    """Planes -> [K, N] f32 W^T in original element order (the golden path;
    parity-tests the pack and both kernel paths)."""
    xp = xp or _xp(planes["qs"])
    qs = planes["qs"].astype(xp.int32)
    lo = (qs & 0x0F).astype(xp.float32)           # [K/2, N] even groups
    hi = (qs >> 4).astype(xp.float32)             # odd groups
    g2 = k // UNIT

    def half(codes, s, m):
        c3 = codes.reshape(g2, GRP, n)
        return c3 * s[:, None, :] - m[:, None, :]

    wlo = half(lo, planes["s_lo"], planes["m_lo"])   # [g2, GRP, n]
    whi = half(hi, planes["s_hi"], planes["m_hi"])
    w = xp.stack([wlo, whi], axis=1)                 # [g2, 2, GRP, n]
    return w.reshape(k, n)


def quantize_activations(x, xp=None):
    """x [T, K] float -> dict for the w4a8 decode kernel (jnp or numpy):
    ahat int32 codes split lo/hi [T, K/2], per-group alpha = amax/127 and
    EXACT group sums of x (the min term pays no activation-quant error),
    each split [T, K/512]."""
    xp = xp or _xp(x)
    t, k = x.shape
    g_all = k // GRP
    xg = x.astype(xp.float32).reshape(t, g_all, GRP)
    alpha = xp.abs(xg).max(axis=2) / 127.0
    alpha = xp.maximum(alpha, 1e-30)
    ahat = xp.round(xg / alpha[:, :, None]).astype(xp.int32)
    xsum = xg.sum(axis=2)
    a2 = ahat.reshape(t, g_all // 2, 2, GRP)

    def ev(v):
        return v.reshape(t, g_all // 2, 2)[:, :, 0]

    def od(v):
        return v.reshape(t, g_all // 2, 2)[:, :, 1]

    return dict(
        a_lo=a2[:, :, 0].reshape(t, k // 2),
        a_hi=a2[:, :, 1].reshape(t, k // 2),
        alpha_lo=ev(alpha), alpha_hi=od(alpha),
        xsum_lo=ev(xsum), xsum_hi=od(xsum),
    )


def w4a8_matmul_golden(x, planes, k: int, n: int, xp=None):
    """The decode path's INTENDED math in f32 (exact given the quantized
    inputs): y = sum_g alpha_g * (ahat_g . s_g q_g) - sum_g xsum_g m_g.
    Used as the parity target for the Pallas kernel and the jnp fallback."""
    xp = xp or _xp(x)
    acts = quantize_activations(x, xp)
    qs = planes["qs"].astype(xp.int32)
    t = x.shape[0]
    g2 = k // UNIT

    def half(codes, s, m, a, alpha, xsum):
        w = (codes.reshape(g2, GRP, n).astype(xp.float32)
             * s[:, None, :]).reshape(k // 2, n)
        af = (a.reshape(t, g2, GRP).astype(xp.float32)
              * alpha[:, :, None]).reshape(t, k // 2)
        return af @ w - xsum @ m

    return (half(qs & 0x0F, planes["s_lo"], planes["m_lo"],
                 acts["a_lo"], acts["alpha_lo"], acts["xsum_lo"])
            + half(qs >> 4, planes["s_hi"], planes["m_hi"],
                   acts["a_hi"], acts["alpha_hi"], acts["xsum_hi"]))
