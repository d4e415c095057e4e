"""Pallas fused dequant-matmul parity vs the golden numpy path.

Runs in interpreter mode on CPU; the same kernels compile for real on TPU
(exercised by bench.py / __graft_entry__.py on hardware).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ntransformer_tpu.core import DType, dequantize, quantize
from ntransformer_tpu.core.layout import relayout
from ntransformer_tpu.ops.linear import QLinear
from ntransformer_tpu.ops.pallas.matmul import quant_matmul_pallas

QDTYPES = [DType.Q8_0, DType.Q4_0, DType.Q4_K, DType.Q5_K, DType.Q6_K]


def _make(dt, n, k, seed=0):
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    raw = quantize(w, dt)
    dense = dequantize(raw, dt, n, k)  # [N, K]
    planes = {nm: jnp.asarray(v) for nm, v in relayout(raw, dt, n, k).items()}
    return QLinear(dt, k, n, planes), dense


@pytest.mark.parametrize("dt", QDTYPES)
@pytest.mark.parametrize("t", [1, 4])
def test_kernel_matches_golden(dt, t):
    n, k = 256, 512
    ql, dense = _make(dt, n, k)
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((t, k)) * 0.5).astype(np.float32)
    want = x @ dense.T
    got = np.asarray(quant_matmul_pallas(jnp.asarray(x), ql, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_kernel_multi_tile_n_and_k():
    """Shapes spanning several N and K tiles, incl. non-pow2 K multiples."""
    dt = DType.Q4_K
    n, k = 640, 1280  # 5 N-tiles of 128, K tiles of 256
    ql, dense = _make(dt, n, k, seed=2)
    x = (np.random.default_rng(3).standard_normal((2, k)) * 0.3).astype(np.float32)
    got = np.asarray(quant_matmul_pallas(jnp.asarray(x), ql, interpret=True))
    np.testing.assert_allclose(got, x @ dense.T, rtol=1e-4, atol=1e-4)


def test_kernel_q8_large_k_tail():
    dt = DType.Q8_0
    n, k = 128, 11008 // 8  # 1376: not a multiple of 256 → TK=32 path
    ql, dense = _make(dt, n, k, seed=4)
    x = (np.random.default_rng(5).standard_normal((1, k)) * 0.3).astype(np.float32)
    got = np.asarray(quant_matmul_pallas(jnp.asarray(x), ql, interpret=True))
    np.testing.assert_allclose(got, x @ dense.T, rtol=1e-4, atol=1e-4)


def test_tile_override_changes_program_and_preserves_result():
    """TILE_OVERRIDE must take effect on the NEXT call (the tiling is a
    static jit argument): a new override means a new cache entry — no
    clear_cache() needed, which never forced a retrace anyway (jax 0.9's
    global trace cache ignores it; advisor r3 found the override A/B
    sweeps timing the first-traced tiling under every label). And any
    tiling must produce identical results."""
    from ntransformer_tpu.ops.pallas import matmul as mm
    dt = DType.Q8_0
    n, k = 256, 512
    ql, dense = _make(dt, n, k, seed=7)
    x = (np.random.default_rng(8).standard_normal((1, k)) * 0.3).astype(np.float32)
    base = np.asarray(quant_matmul_pallas(jnp.asarray(x), ql, interpret=True))
    size0 = mm._quant_matmul_impl._cache_size()
    mm.TILE_OVERRIDE[(dt, k, n)] = (128, 128)
    try:
        got = np.asarray(quant_matmul_pallas(jnp.asarray(x), ql,
                                             interpret=True))
    finally:
        del mm.TILE_OVERRIDE[(dt, k, n)]
    assert mm._quant_matmul_impl._cache_size() > size0, \
        "override did not produce a new compiled program"
    np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-5)
