"""W4A8 format + kernel tests (r5).

The w4a8 path deliberately CHANGES NUMERICS (requant + int8 activations);
these tests pin its three layers:
  1. the format round-trip (requant error bounded by the affine step),
  2. kernel/fallback parity against the golden math
     (core/w4a8.w4a8_matmul_golden) — interpret-mode Pallas on CPU,
     compiled-Mosaic parity runs in tests/test_tpu_kernels.py,
  3. model-level: a synth model converted to w4a8 still decodes coherently
     (argmax agreement is quality-gated on real weights, not asserted here).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ntransformer_tpu.core.dtypes import DType
from ntransformer_tpu.core.layout import relayout
from ntransformer_tpu.core.quant import quantize
from ntransformer_tpu.core.w4a8 import (
    dequant_w4a8, quantize_activations, requant_w4a8, w4a8_matmul_golden)
from ntransformer_tpu.ops.linear import (
    QLinear, convert_qlinear_w4a8, qmatmul)
from ntransformer_tpu.ops.pallas.w4a8 import w4a8_decode_pallas

K, N = 1024, 256


@pytest.fixture(scope="module")
def wplanes():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.02
    return w, requant_w4a8(w)


def test_requant_roundtrip_error_bound(wplanes):
    w, planes = wplanes
    wd = dequant_w4a8(planes, K, N)
    # error per element <= scale/2; scale = (max-min)/15 per 256-group
    g = K // 256
    step = (w.reshape(g, 256, N).max(1) - w.reshape(g, 256, N).min(1)) / 15.0
    err = np.abs(wd - w).reshape(g, 256, N)
    assert (err <= step[:, None, :] / 2 + 1e-7).all()


def test_requant_exact_on_grid(wplanes):
    # weights already on a 16-level per-group grid survive exactly
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 16, size=(K, N)).astype(np.float32)
    scale = 0.013
    w = codes * scale - 0.07
    planes = requant_w4a8(w)
    wd = dequant_w4a8(planes, K, N)
    assert np.abs(wd - w).max() < 1e-5


def test_activation_quant_semantics():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, K)).astype(np.float32)
    acts = quantize_activations(x)
    # codes within int8, alpha reconstructs within half a step
    assert acts["a_lo"].min() >= -127 and acts["a_lo"].max() <= 127
    g2 = K // 512
    rec_lo = (acts["a_lo"].reshape(1, g2, 256).astype(np.float32)
              * acts["alpha_lo"][:, :, None]).reshape(1, K // 2)
    x_lo = x.reshape(1, g2, 2, 256)[:, :, 0].reshape(1, K // 2)
    assert np.abs(rec_lo - x_lo).max() <= np.abs(x).max() / 254 + 1e-7
    # xsum is EXACT (float sums, not quantized)
    assert np.allclose(acts["xsum_lo"].sum() + acts["xsum_hi"].sum(),
                       x.sum(), rtol=1e-5)


def test_interpret_kernel_matches_golden(wplanes):
    w, planes = wplanes
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, K)).astype(np.float32)
    gold = w4a8_matmul_golden(x, planes, K, N)
    ql = QLinear(DType.W4A8, K, N,
                 {k: jnp.asarray(v) for k, v in planes.items()})
    got = np.asarray(w4a8_decode_pallas(jnp.asarray(x), ql, interpret=True))
    assert np.abs(got - gold).max() / np.abs(gold).max() < 2e-5


def test_interpret_kernel_stacked_layer_select(wplanes):
    w, planes = wplanes
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, K)).astype(np.float32)
    w1 = rng.normal(size=(K, N)).astype(np.float32) * 0.02
    planes1 = requant_w4a8(w1)
    stacked = {k: jnp.asarray(np.stack([planes[k], planes1[k]]))
               for k in planes}
    ql = QLinear(DType.W4A8, K, N, stacked)
    gold1 = w4a8_matmul_golden(x, planes1, K, N)
    got1 = np.asarray(w4a8_decode_pallas(jnp.asarray(x), ql, interpret=True,
                                         layer=jnp.int32(1)))
    assert np.abs(got1 - gold1).max() / np.abs(gold1).max() < 2e-5


def test_qmatmul_fallback_matches_golden(wplanes):
    w, planes = wplanes
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, K)).astype(np.float32)
    gold = w4a8_matmul_golden(x, planes, K, N)
    ql = QLinear(DType.W4A8, K, N,
                 {k: jnp.asarray(v) for k, v in planes.items()})
    got = np.asarray(qmatmul(jnp.asarray(x), ql, use_kernel=False))
    assert np.abs(got - gold).max() / np.abs(gold).max() < 2e-5


def test_t_gt_1_exact_dequant_path(wplanes):
    """T>1 (prefill/verify) runs the exact-dequant tile: y = x @ wd."""
    w, planes = wplanes
    rng = np.random.default_rng(6)
    x = rng.normal(size=(4, K)).astype(np.float32)
    wd = dequant_w4a8(planes, K, N)
    ql = QLinear(DType.W4A8, K, N,
                 {k: jnp.asarray(v) for k, v in planes.items()})
    # interpret Pallas tile path
    from ntransformer_tpu.ops.pallas.matmul import quant_matmul_pallas
    got = np.asarray(quant_matmul_pallas(jnp.asarray(x), ql, interpret=True))
    ref = x @ wd
    assert np.abs(got - ref).max() / np.abs(ref).max() < 5e-3  # bf16 dot
    # jnp fallback
    got2 = np.asarray(qmatmul(jnp.asarray(x), ql, use_kernel=False))
    assert np.abs(got2 - ref).max() / np.abs(ref).max() < 5e-3


def test_convert_from_q8_0(wplanes):
    w, _ = wplanes
    raw = quantize(np.ascontiguousarray(w.T), DType.Q8_0)
    q8 = relayout(raw, DType.Q8_0, N, K)
    ql8 = QLinear(DType.Q8_0, K, N, q8)
    qlw = convert_qlinear_w4a8(ql8)
    assert qlw.dtype == DType.W4A8
    wd = dequant_w4a8(qlw.planes, K, N)
    # bounded by q8 error + w4a8 step
    assert np.abs(wd - w).max() / np.abs(w).max() < 0.08


def test_convert_stacked_and_idempotent(wplanes):
    w, planes = wplanes
    raw = quantize(np.ascontiguousarray(w.T), DType.Q8_0)
    q8 = relayout(raw, DType.Q8_0, N, K)
    ql8s = QLinear(DType.Q8_0, K, N,
                   {k: np.stack([v, v]) for k, v in q8.items()})
    qlws = convert_qlinear_w4a8(ql8s)
    assert qlws.planes["qs"].shape == (2, K // 2, N)
    assert qlws.planes["s_lo"].shape == (2, K // 512, N)
    # idempotent
    again = convert_qlinear_w4a8(qlws)
    assert again is qlws


def test_convert_float_source():
    rng = np.random.default_rng(7)
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.02
    qlf = QLinear(DType.BF16, K, N, {"w": w.astype(jnp.bfloat16)})
    qlw = convert_qlinear_w4a8(qlf)
    wd = dequant_w4a8({k: np.asarray(v) for k, v in qlw.planes.items()},
                      K, N)
    assert np.abs(wd - w).max() / np.abs(w).max() < 0.08


def test_w4a8_synth_model_decodes():
    """End-to-end: a tiny synth model converted to w4a8 produces finite
    logits through both the prefill (T>1 exact tile) and decode (T=1
    quantized-activation) paths, and its logits track the source model's."""
    from ntransformer_tpu.models.llama import KVCache, forward
    from ntransformer_tpu.models.loader import convert_weights_w4a8
    from ntransformer_tpu.models.synth import synth_model
    _, arch, weights = synth_model("tiny512", "q8_0", max_seq_len=64)
    # give the synth planes real content so the comparison is meaningful
    rng = np.random.default_rng(0)

    def fill(ql):
        if not isinstance(ql, QLinear) or ql.dtype != DType.Q8_0:
            return ql
        qs = ql.planes["qs"]
        return QLinear(ql.dtype, ql.k, ql.n, {
            "qs": jnp.asarray(rng.integers(-100, 100, qs.shape), jnp.int8),
            "d": ql.planes["d"]})
    weights = jax.tree.map(
        fill, weights,
        is_leaf=lambda x: isinstance(x, QLinear))
    w4 = convert_weights_w4a8(weights)
    assert w4.layers.wq.dtype == DType.W4A8
    assert w4.embed.dtype == DType.Q8_0  # gather table keeps source dtype
    toks = jnp.asarray([1, 2, 3], jnp.int32)
    kv0 = KVCache.create(arch)
    ref_logits, kv_ref, _ = forward(arch, weights, kv0, toks, 0)
    kv1 = KVCache.create(arch)
    logits, kv, _ = forward(arch, w4, kv1, toks, 0)
    assert np.isfinite(np.asarray(logits)).all()
    # w4a8 logits track the source: random synth weights are a worst case
    # (~11% RMS weight error from the 4-bit grid), so assert direction via
    # cosine; real-weight quality is priced by tools/quality_gate.py
    ref = np.asarray(ref_logits).ravel()
    got = np.asarray(logits).ravel()
    cos = (ref @ got) / (np.linalg.norm(ref) * np.linalg.norm(got) + 1e-9)
    assert cos > 0.9, cos
    # decode step exercises the T=1 int8-MXU (interpret on CPU) path
    t1 = jnp.argmax(logits[-1]).astype(jnp.int32)
    logits2, kv, _ = forward(arch, w4, kv, t1[None], 3)
    assert np.isfinite(np.asarray(logits2)).all()
