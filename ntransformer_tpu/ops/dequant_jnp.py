"""jnp mirror of core/layout.dequant_planes — runs under jit on any backend.

Used by (a) the fallback quantized matmul (tiny models / CPU tests), and
(b) embedding-column dequant after gathering token columns from the
transposed planes. Semantics are identical to the numpy golden path; parity
is asserted in tests/test_ops.py.
"""
from __future__ import annotations

import jax.numpy as jnp

from .f16bits import f16_bits_to_f32

from ..core.dtypes import DType


def _rep(a, n, axis=0):
    return jnp.repeat(a, n, axis=axis)


def dequant_planes_jnp(planes: dict, dtype: DType, k: int, n: int,
                       out_dtype=jnp.float32) -> jnp.ndarray:
    """Reconstruct W^T [k, n] in original element order from planes."""
    if dtype in (DType.F16, DType.BF16, DType.F32):
        return planes["w"].astype(out_dtype)

    if dtype == DType.Q8_0:
        d = f16_bits_to_f32(planes["d"])
        qs = planes["qs"].astype(jnp.float32)
        return (qs * _rep(d, 32)).astype(out_dtype)

    if dtype == DType.Q4_0:
        d = _rep(f16_bits_to_f32(planes["d"]), 16)
        qs = planes["qs"]
        lo = (qs & 0x0F).astype(jnp.int8).astype(jnp.float32) - 8.0
        hi = (qs >> 4).astype(jnp.int8).astype(jnp.float32) - 8.0
        w_lo = (lo * d).reshape(k // 32, 16, n)
        w_hi = (hi * d).reshape(k // 32, 16, n)
        return jnp.concatenate([w_lo, w_hi], axis=1).reshape(k, n).astype(out_dtype)

    if dtype in (DType.Q4_K, DType.Q5_K):
        qs = planes["qs"]
        lo = (qs & 0x0F).astype(jnp.float32)
        hi = (qs >> 4).astype(jnp.float32)
        if dtype == DType.Q5_K:
            qh = planes["qh"].astype(jnp.int32).reshape(k // 256, 32, n)
            lo_b = jnp.concatenate(
                [(qh >> (2 * c)) & 1 for c in range(4)], axis=1
            ).reshape(k // 2, n).astype(jnp.float32)
            hi_b = jnp.concatenate(
                [(qh >> (2 * c + 1)) & 1 for c in range(4)], axis=1
            ).reshape(k // 2, n).astype(jnp.float32)
            lo = lo + 16.0 * lo_b
            hi = hi + 16.0 * hi_b
        d = _rep(f16_bits_to_f32(planes["d"]), 128)
        dmin = _rep(f16_bits_to_f32(planes["dmin"]), 128)
        w_lo = lo * (d * _rep(planes["sc_lo"].astype(jnp.float32), 32)) \
            - dmin * _rep(planes["mn_lo"].astype(jnp.float32), 32)
        w_hi = hi * (d * _rep(planes["sc_hi"].astype(jnp.float32), 32)) \
            - dmin * _rep(planes["mn_hi"].astype(jnp.float32), 32)
        # interleave lo/hi back at unit 64: lo row 32c+j → elem 64c+j
        w = jnp.stack([w_lo.reshape(k // 64, 32, n),
                       w_hi.reshape(k // 64, 32, n)], axis=1)
        return w.reshape(k, n).astype(out_dtype)

    if dtype == DType.Q6_K:
        ql = planes["ql"]
        qh = planes["qh"].astype(jnp.int32).reshape(k // 128, 32, n)
        hb_lo = jnp.concatenate([(qh >> 0) & 3, (qh >> 2) & 3],
                                axis=1).reshape(k // 2, n)
        hb_hi = jnp.concatenate([(qh >> 4) & 3, (qh >> 6) & 3],
                                axis=1).reshape(k // 2, n)
        lo = ((ql & 0x0F).astype(jnp.int32) | (hb_lo << 4)) - 32
        hi = ((ql >> 4).astype(jnp.int32) | (hb_hi << 4)) - 32
        d = _rep(f16_bits_to_f32(planes["d"]), 128)
        w_lo = lo.astype(jnp.float32) * (
            d * _rep(planes["sc_lo"].astype(jnp.float32), 16))
        w_hi = hi.astype(jnp.float32) * (
            d * _rep(planes["sc_hi"].astype(jnp.float32), 16))
        w = jnp.stack([w_lo.reshape(k // 128, 64, n),
                       w_hi.reshape(k // 128, 64, n)], axis=1)
        return w.reshape(k, n).astype(out_dtype)

    if dtype == DType.W4A8:
        from ..core.w4a8 import dequant_w4a8
        return dequant_w4a8(planes, k, n, xp=jnp).astype(out_dtype)

    if dtype == DType.W8A8:
        from ..core.w8a8 import dequant_w8a8
        return dequant_w8a8(planes, k, n, xp=jnp).astype(out_dtype)

    raise ValueError(f"no jnp plane dequant for {dtype}")
