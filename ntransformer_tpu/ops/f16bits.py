"""Manual f16-bits → f32 decode (jnp ops only — works inside Pallas).

Mosaic has no f16 type, but GGUF block scales are f16 and must decode
bit-exactly. Scale planes are therefore stored as uint16 (the raw f16 bits)
and decoded with integer ops. Handles signed zeros and subnormals; scale
values are finite in valid files, so inf/NaN decode is not special-cased
(they would decode to large-but-wrong finite values, never poison).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def f16_bits_to_f32(u: jnp.ndarray) -> jnp.ndarray:
    """Decode an array of uint16 (IEEE f16 bit patterns) to f32 exactly.

    Pure int32 arithmetic — Mosaic supports neither f16 nor uint32→f32
    casts, so everything is built from int32 bit ops + one bitcast.
    """
    u32 = u.astype(jnp.int32) & 0xFFFF
    neg = (u32 & 0x8000) != 0
    e = (u32 >> 10) & 0x1F
    m = u32 & 0x3FF
    normal_bits = (jnp.where(neg, jnp.int32(-0x80000000), jnp.int32(0))
                   | ((e + 112) << 23) | (m << 13))
    f_normal = jax.lax.bitcast_convert_type(normal_bits, jnp.float32)
    # subnormal: ±m * 2^-24
    f_sub = jnp.where(neg, -1.0, 1.0) * m.astype(jnp.float32) \
        * jnp.float32(5.960464477539063e-08)
    return jnp.where(e == 0, f_sub, f_normal)
