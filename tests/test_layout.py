"""Parity tests: planar re-layout must reproduce the golden dequant exactly,
and split-activation dot products must equal dense dot products."""
import numpy as np
import pytest

from ntransformer_tpu.core import DType, dequantize, quantize
from ntransformer_tpu.core.layout import (
    SPLIT_UNIT,
    _split_index,
    dequant_planes,
    relayout,
    split_x,
)

QDTYPES = [DType.Q8_0, DType.Q4_0, DType.Q4_K, DType.Q5_K, DType.Q6_K]


@pytest.mark.parametrize("dt", QDTYPES)
def test_planes_match_golden_dequant(dt):
    rng = np.random.default_rng(3)
    n, k = 48, 512  # out, in
    w = rng.standard_normal((n, k)).astype(np.float32)
    raw = quantize(w, dt)
    golden = dequantize(raw, dt, n, k)  # [N, K]
    planes = relayout(raw, dt, n, k)
    wt = dequant_planes(planes, dt, k, n)  # [K, N]
    np.testing.assert_allclose(wt, golden.T, rtol=0, atol=1e-6)


@pytest.mark.parametrize("dt", QDTYPES)
def test_plane_shapes(dt):
    from ntransformer_tpu.core.layout import LAYOUTS
    n, k = 32, 512
    raw = quantize(np.ones((n, k), np.float32), dt)
    planes = relayout(raw, dt, n, k)
    specs = {s.name: s for s in LAYOUTS[dt]}
    assert set(planes) == set(specs)
    for name, arr in planes.items():
        s = specs[name]
        assert arr.shape == (k // s.rows_div, n), (name, arr.shape)
        assert arr.dtype == np.dtype(s.np_dtype)


@pytest.mark.parametrize("dt", [DType.Q4_0, DType.Q4_K, DType.Q5_K, DType.Q6_K])
def test_split_x_consistency(dt):
    """x_lo·w_lo + x_hi·w_hi == x·w for the split index mapping."""
    rng = np.random.default_rng(5)
    k = 512
    x = rng.standard_normal((3, k)).astype(np.float32)
    x_lo, x_hi = split_x(x, dt)
    lo_idx, hi_idx = _split_index(k, SPLIT_UNIT[dt])
    np.testing.assert_array_equal(x_lo, x[:, lo_idx])
    np.testing.assert_array_equal(x_hi, x[:, hi_idx])


@pytest.mark.parametrize("dt", QDTYPES)
def test_plane_matmul_equals_dense(dt):
    """Full pipeline: quantize → relayout → split-dot == dense dequant dot."""
    rng = np.random.default_rng(9)
    n, k = 64, 768
    w = rng.standard_normal((n, k)).astype(np.float32)
    raw = quantize(w, dt)
    dense = dequantize(raw, dt, n, k)  # [N, K]
    x = rng.standard_normal((2, k)).astype(np.float32)
    want = x @ dense.T

    planes = relayout(raw, dt, n, k)
    wt = dequant_planes(planes, dt, k, n)  # [K, N] original element order
    got = x @ wt
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
