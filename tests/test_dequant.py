"""Golden-block and round-trip tests for the GGML quant formats.

Ports the hand-built-block testing trick from the reference
(tests/test_gemm.cpp:66-162, 258-397): construct packed blocks with known
dequantized values and assert exact decode; plus quantize→dequantize
round-trip error bounds (reference measured 2% rel err for Q6_K,
docs/research/R1_delta_streaming.md:153-157).
"""
import numpy as np
import pytest

from ntransformer_tpu.core import DType, dequantize, quantize, row_nbytes
from ntransformer_tpu.core.dequant import (
    pack_kquant_scales,
    unpack_kquant_scales,
)


def test_q4_0_golden_block():
    # scale d=0.5 (f16), all nibbles = 10 → (10-8)*0.5 = 1.0  (test_gemm.cpp trick)
    d = np.array([0.5], dtype=np.float16).view(np.uint8)
    block = np.concatenate([d, np.full(16, 10 | (10 << 4), dtype=np.uint8)])
    out = dequantize(block.tobytes(), DType.Q4_0, 1, 32)
    np.testing.assert_allclose(out, np.full((1, 32), 1.0, np.float32))


def test_q4_0_nibble_order():
    # nibble j low → element j, high → element j+16
    d = np.array([1.0], dtype=np.float16).view(np.uint8)
    qs = np.zeros(16, dtype=np.uint8)
    qs[0] = (8 + 3) | ((8 - 2) << 4)  # elem0 = +3, elem16 = -2
    block = np.concatenate([d, qs])
    out = dequantize(block.tobytes(), DType.Q4_0, 1, 32)[0]
    assert out[0] == 3.0 and out[16] == -2.0 and out[1] == -8.0


def test_q8_0_golden_block():
    d = np.array([0.25], dtype=np.float16).view(np.uint8)
    qs = np.arange(-16, 16, dtype=np.int8)
    block = np.concatenate([d, qs.view(np.uint8)])
    out = dequantize(block.tobytes(), DType.Q8_0, 1, 32)[0]
    np.testing.assert_allclose(out, qs.astype(np.float32) * 0.25)


def test_kquant_scale_pack_roundtrip():
    rng = np.random.default_rng(0)
    sc = rng.integers(0, 64, size=(17, 8), dtype=np.uint8)
    m = rng.integers(0, 64, size=(17, 8), dtype=np.uint8)
    packed = pack_kquant_scales(sc, m)
    sc2, m2 = unpack_kquant_scales(packed)
    np.testing.assert_array_equal(sc, sc2)
    np.testing.assert_array_equal(m, m2)


def test_q6_k_golden_block():
    # All-ones encoding: q=33 → (33-32)=1, scales=1, d=1 → y=1 (test_gemm.cpp:266-292)
    nb = 1
    ql = np.full(128, (1 | (1 << 4)), dtype=np.uint8)   # low nibbles = 1
    qh = np.full(64, 0b10101010, dtype=np.uint8)        # 2-bit fields = 2,2,2,2
    # q = (1 | (2<<4)) - 32 = 33-32 = 1 for q1/q3? check: fields (qh>>0)&3=2,
    # (qh>>2)&3=2, ... so q = 1 | (2<<4) = 33 → 1 after -32. Good for all four.
    scales = np.full(16, 1, dtype=np.int8)
    d = np.array([1.0], dtype=np.float16).view(np.uint8)
    block = np.concatenate([ql, qh, scales.view(np.uint8), d])
    assert block.nbytes == 210
    out = dequantize(block.tobytes(), DType.Q6_K, nb, 256)
    np.testing.assert_allclose(out, np.ones((1, 256), np.float32))


def test_q4_k_golden_block():
    # d=1, dmin=1, all scales=2, all mins=1, all nibbles=3 → y = 2*3 - 1 = 5
    d = np.array([1.0, 1.0], dtype=np.float16).view(np.uint8)
    scales = pack_kquant_scales(
        np.full((1, 8), 2, np.uint8), np.full((1, 8), 1, np.uint8))[0]
    qs = np.full(128, 3 | (3 << 4), dtype=np.uint8)
    block = np.concatenate([d, scales, qs])
    assert block.nbytes == 144
    out = dequantize(block.tobytes(), DType.Q4_K, 1, 256)
    np.testing.assert_allclose(out, np.full((1, 256), 5.0, np.float32))


def test_q5_k_high_bit():
    # With qh bit set, value gains +16: y = d*sc*(lo+16) - dmin*m
    d = np.array([1.0, 0.0], dtype=np.float16).view(np.uint8)  # dmin=0
    scales = pack_kquant_scales(
        np.full((1, 8), 1, np.uint8), np.zeros((1, 8), np.uint8))[0]
    qh = np.full(32, 0xFF, dtype=np.uint8)  # all high bits set
    ql = np.full(128, 2 | (2 << 4), dtype=np.uint8)
    block = np.concatenate([d, scales, qh, ql])
    assert block.nbytes == 176
    out = dequantize(block.tobytes(), DType.Q5_K, 1, 256)
    np.testing.assert_allclose(out, np.full((1, 256), 18.0, np.float32))


@pytest.mark.parametrize("dt,rel_tol", [
    (DType.Q8_0, 0.008),
    (DType.Q4_0, 0.10),
    (DType.Q4_K, 0.09),
    (DType.Q5_K, 0.05),
    (DType.Q6_K, 0.025),
])
def test_quant_roundtrip_error(dt, rel_tol):
    rng = np.random.default_rng(42)
    x = rng.standard_normal((8, 512)).astype(np.float32)
    raw = quantize(x, dt)
    assert len(raw) == row_nbytes(dt, x.size)
    y = dequantize(raw, dt, 8, 512)
    rms_err = np.sqrt(np.mean((x - y) ** 2)) / np.sqrt(np.mean(x**2))
    assert rms_err < rel_tol, f"{dt}: relative RMS error {rms_err:.4f}"


@pytest.mark.parametrize("dt", [DType.Q8_0, DType.Q4_0, DType.Q4_K, DType.Q5_K, DType.Q6_K])
def test_quant_idempotent(dt):
    """quant(dequant(quant(x))) == quant(x) — decode must invert encode exactly."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((4, 256)).astype(np.float32)
    raw1 = quantize(x, dt)
    y = dequantize(raw1, dt, 4, 256)
    raw2 = quantize(y, dt)
    y2 = dequantize(raw2, dt, 4, 256)
    np.testing.assert_allclose(y, y2, rtol=0, atol=1e-6)


def test_f16_bf16_decode():
    x = np.array([[1.5, -2.25, 0.0, 3.0]], dtype=np.float32)
    np.testing.assert_array_equal(
        dequantize(x.astype(np.float16).tobytes(), DType.F16, 1, 4), x)
    bf = (x.view(np.uint32) >> 16).astype(np.uint16)
    np.testing.assert_array_equal(dequantize(bf.tobytes(), DType.BF16, 1, 4), x)
