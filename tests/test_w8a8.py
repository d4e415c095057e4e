"""W8A8 format + kernel tests (r5).

The w8a8 serving format deliberately CHANGES NUMERICS (per-column weight
requant + per-row int8 activations); these tests pin its layers:
  1. the format round-trip (requant error bounded by the symmetric step),
  2. kernel/fallback parity against the golden math
     (core/w8a8.w8a8_matmul_golden) — interpret-mode Pallas on CPU,
     compiled-Mosaic parity runs in tests/test_tpu_kernels.py,
  3. multi-row semantics (the whole point vs W4A8: decode batches, verify
     windows and prefill chunks all take the ONE-dot path),
  4. model-level: a synth model converted to w8a8 still decodes; a real
     (repolm) model's w8a8 outputs agree with exact compute closely.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ntransformer_tpu.core.dtypes import DType
from ntransformer_tpu.core.w8a8 import (
    dequant_w8a8, quantize_rows, requant_w8a8, w8a8_matmul_golden)
from ntransformer_tpu.ops.linear import (
    QLinear, convert_qlinear_w8a8, qmatmul)
from ntransformer_tpu.ops.pallas.w8a8 import w8a8_matmul_pallas

K, N = 512, 256


@pytest.fixture(scope="module")
def wplanes():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.02
    return w, requant_w8a8(w)


def test_requant_roundtrip_error_bound(wplanes):
    w, planes = wplanes
    wd = dequant_w8a8(planes, K, N)
    step = np.abs(w).max(axis=0) / 127.0  # per-column scale
    assert np.all(np.abs(wd - w) <= step[None, :] * 0.5 + 1e-9)


def test_row_quant_semantics():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(5, K)).astype(np.float32)
    codes, am = quantize_rows(x)
    assert codes.dtype == np.int8 and am.shape == (5, 1)
    assert np.all(np.abs(codes.astype(np.float32) * am - x)
                  <= am * 0.5 + 1e-9)


@pytest.mark.parametrize("t", [1, 4, 64])
def test_interpret_kernel_matches_golden(wplanes, t):
    w, planes = wplanes
    rng = np.random.default_rng(3)
    x = rng.normal(size=(t, K)).astype(np.float32)
    ql = QLinear(DType.W8A8, K, N,
                 {k: jnp.asarray(v) for k, v in planes.items()})
    got = np.asarray(w8a8_matmul_pallas(jnp.asarray(x), ql,
                                        interpret=True))
    want = w8a8_matmul_golden(x, planes, K, N)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_interpret_kernel_stacked_layer_select(wplanes):
    w, planes = wplanes
    rng = np.random.default_rng(4)
    x = rng.normal(size=(3, K)).astype(np.float32)
    L = 3
    stacked = {k: jnp.asarray(np.stack([v * (i + 1) for i in range(L)]))
               for k, v in planes.items()}
    ql = QLinear(DType.W8A8, K, N, stacked)
    for li in range(L):
        got = np.asarray(w8a8_matmul_pallas(
            jnp.asarray(x), ql, interpret=True, layer=jnp.int32(li)))
        want = w8a8_matmul_golden(
            x, {k: np.asarray(v[li]) for k, v in stacked.items()}, K, N)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_qmatmul_dispatch_matches_golden(wplanes):
    w, planes = wplanes
    rng = np.random.default_rng(5)
    x = rng.normal(size=(7, K)).astype(np.float32)
    ql = QLinear(DType.W8A8, K, N,
                 {k: jnp.asarray(v) for k, v in planes.items()})
    got = np.asarray(qmatmul(jnp.asarray(x), ql))
    want = w8a8_matmul_golden(x, planes, K, N)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_convert_from_q8_0():
    """Q8_0 -> W8A8 conversion: the converted matmul approximates the
    exact Q8_0 matmul within combined quant error."""
    from ntransformer_tpu.core.layout import relayout
    from ntransformer_tpu.core.quant import quantize

    rng = np.random.default_rng(6)
    w_file = rng.normal(size=(N, K)).astype(np.float32) * 0.02  # [N, K]
    raw = quantize(w_file, DType.Q8_0)
    planes = relayout(raw, DType.Q8_0, N, K)
    ql = QLinear(DType.Q8_0, K, N, planes)
    ql8 = convert_qlinear_w8a8(ql)
    assert ql8.dtype == DType.W8A8
    assert ql8.planes["q"].shape == (K, N)
    assert ql8.planes["s"].shape == (1, N)
    x = rng.normal(size=(2, K)).astype(np.float32)
    y_exact = np.asarray(qmatmul(jnp.asarray(x), ql))
    y_w8 = np.asarray(qmatmul(jnp.asarray(x), ql8))
    rel = np.abs(y_w8 - y_exact).max() / (np.abs(y_exact).max() + 1e-9)
    assert rel < 0.05, rel
    # idempotent
    assert convert_qlinear_w8a8(ql8) is ql8


def test_convert_stacked_lead_dims():
    rng = np.random.default_rng(7)
    w = rng.normal(size=(4, K, N)).astype(np.float32) * 0.02
    ql = QLinear(DType.F32, K, N, {"w": np.ascontiguousarray(w)})
    ql8 = convert_qlinear_w8a8(ql)
    assert ql8.planes["q"].shape == (4, K, N)
    assert ql8.planes["s"].shape == (4, 1, N)
    for i in range(4):
        wd = dequant_w8a8({"q": ql8.planes["q"][i],
                           "s": ql8.planes["s"][i]}, K, N)
        step = np.abs(w[i]).max(axis=0) / 127.0
        assert np.all(np.abs(wd - w[i]) <= step[None, :] * 0.5 + 1e-9)


def test_w8a8_synth_model_decodes():
    """A w8a8 synth model runs the batched decode step end to end (jnp
    fallback path on CPU) and produces finite logits."""
    from ntransformer_tpu.models.batched import BatchedKV, batched_decode_step
    from ntransformer_tpu.models.synth import synth_model

    cfg, arch, weights = synth_model("tiny", "w8a8", max_seq_len=64)
    bkv = BatchedKV.create(arch, 2)
    toks = jnp.asarray([3, 5], jnp.int32)
    logits, bkv = batched_decode_step(
        arch, weights, bkv, toks, jnp.zeros(2, jnp.int32),
        jnp.ones(2, bool))
    assert np.all(np.isfinite(np.asarray(logits)))


def test_repolm_w8a8_close_to_exact():
    """Real learned weights: w8a8 greedy decode stays close to exact —
    same first tokens on an in-distribution prompt (the full PPL pricing
    runs in tools/quality_gate.py)."""
    import os
    from ntransformer_tpu.inference.engine import Engine, GenerateConfig

    path = os.path.join(os.path.dirname(__file__), "..", "models",
                        "repolm512_q8.gguf")
    if not os.path.exists(path):
        pytest.skip("no repolm fixture")
    cfg = GenerateConfig(max_tokens=8, temperature=0.0, repeat_penalty=1.0)
    e0 = Engine.load(path)
    t0, _ = e0.generate("def forward(", cfg)
    del e0
    e8 = Engine.load(path, w8a8=True)
    t8, _ = e8.generate("def forward(", cfg)
    # int8 activations can flip a late token; the head must agree
    assert t0[:10] == t8[:10], (t0, t8)
