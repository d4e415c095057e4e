"""End-to-end model tests on a synthesized tiny GGUF.

Covers the reference's manual validation strategy (SURVEY.md §4) with real
asserts: quant-vs-bf16 logit parity, prefill-vs-incremental-decode
consistency (the "bit-identical streaming vs resident" check,
docs/DEVELOPMENT.md:185), verify-mode all-position logits, and draft-prefix
subsets.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ntransformer_tpu.models.llama import KVCache, forward
from ntransformer_tpu.models.loader import load_model
from tools.make_test_gguf import write_model


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny_q8.gguf"
    write_model(str(path), "tiny", "q8_0", seed=1)
    return str(path)


@pytest.fixture(scope="module")
def model_quant(tiny_gguf):
    return load_model(tiny_gguf, compute="quant")


@pytest.fixture(scope="module")
def model_bf16(tiny_gguf):
    return load_model(tiny_gguf, compute="bf16")


def test_config_from_metadata(model_quant):
    cfg = model_quant.config
    assert cfg.hidden_size == 256
    assert cfg.n_layers == 4
    assert cfg.n_heads == 4 and cfg.n_kv_heads == 2
    assert cfg.group_size == 2 and cfg.is_gqa


def test_forward_shapes(model_quant):
    m = model_quant
    kv = KVCache.create(m.arch)
    tokens = jnp.array([1, 5, 9], dtype=jnp.int32)
    logits, kv2, _ = forward(m.arch, m.weights, kv, tokens, 0)
    assert logits.shape == (1, m.config.vocab_size)
    assert kv2.k.shape == kv.k.shape
    logits_all, _, _ = forward(m.arch, m.weights, KVCache.create(m.arch),
                               tokens, 0, all_logits=True)
    assert logits_all.shape == (3, m.config.vocab_size)
    # last row of verify logits == decode logits
    np.testing.assert_allclose(np.asarray(logits_all[-1]),
                               np.asarray(logits[0]), rtol=2e-3, atol=2e-3)


def test_quant_matches_bf16(model_quant, model_bf16):
    tokens = jnp.array([1, 7, 12, 3], dtype=jnp.int32)
    lq, _, _ = forward(model_quant.arch, model_quant.weights,
                       KVCache.create(model_quant.arch), tokens, 0)
    lb, _, _ = forward(model_bf16.arch, model_bf16.weights,
                       KVCache.create(model_bf16.arch), tokens, 0)
    # bf16 rounding of dequantized weights is the only difference
    np.testing.assert_allclose(np.asarray(lq), np.asarray(lb),
                               rtol=0.05, atol=0.05)


def test_prefill_vs_incremental(model_quant):
    """Feeding tokens one-by-one must produce the same final logits as a
    single prefill (KV cache correctness)."""
    m = model_quant
    tokens = [1, 5, 9, 14, 21]
    lp, _, _ = forward(m.arch, m.weights, KVCache.create(m.arch),
                       jnp.asarray(tokens, dtype=jnp.int32), 0)
    kv = KVCache.create(m.arch)
    for i, t in enumerate(tokens):
        li, kv, _ = forward(m.arch, m.weights, kv,
                            jnp.asarray([t], dtype=jnp.int32), i)
    np.testing.assert_allclose(np.asarray(lp[0]), np.asarray(li[0]),
                               rtol=2e-3, atol=2e-3)


def test_layer_subset_draft(model_quant):
    """layer_sel with a prefix = forward_draft (tier-A draft)."""
    m = model_quant
    tokens = jnp.array([2, 4], dtype=jnp.int32)
    sel = jnp.array([0, 1], dtype=jnp.int32)
    logits, kv2, _ = forward(m.arch, m.weights, KVCache.create(m.arch),
                             tokens, 0, layer_sel=sel)
    assert logits.shape == (1, m.config.vocab_size)
    # only the selected layers' caches were written
    assert np.abs(np.asarray(kv2.k[2])).max() == 0
    assert np.abs(np.asarray(kv2.k[0])).max() > 0


def test_cosine_calibration_output(model_quant):
    m = model_quant
    tokens = jnp.array([3], dtype=jnp.int32)
    _, _, cos = forward(m.arch, m.weights, KVCache.create(m.arch), tokens, 0,
                        with_cosine=True)
    cos = np.asarray(cos)
    assert cos.shape == (m.config.n_layers,)
    assert np.all(cos > -1.0001) and np.all(cos < 1.0001)


def test_q4_k_m_mixed_model(tmp_path):
    path = tmp_path / "tiny_q4km.gguf"
    write_model(str(path), "tiny", "q4_k_m", seed=2)
    m = load_model(str(path), compute="quant")
    # mixed per-tensor dtypes: ffn_down should be Q6_K, attn Q4_K
    from ntransformer_tpu.core import DType
    assert m.reader.info("blk.0.ffn_down.weight").dtype == DType.Q6_K
    assert m.reader.info("blk.0.attn_q.weight").dtype == DType.Q4_K
    tokens = jnp.array([1, 8], dtype=jnp.int32)
    logits, _, _ = forward(m.arch, m.weights, KVCache.create(m.arch), tokens, 0)
    assert np.isfinite(np.asarray(logits)).all()


def test_rope_freq_factors(tmp_path):
    """A GGUF carrying rope_freqs.weight (Llama-3.1 long-context scaling)
    changes the rope tables accordingly — the reference ignores this
    tensor; real 3.1 models need it."""
    import numpy as np
    from ntransformer_tpu.core.gguf import GGUFReader, GGUFWriter
    from ntransformer_tpu.models.loader import rope_freq_factors
    from ntransformer_tpu.ops.layers import rope_table

    src = str(tmp_path / "rf.gguf")
    write_model(src, "tiny", "q8_0", seed=10)
    # rewrite with an extra rope_freqs tensor
    r = GGUFReader(src)
    w = GGUFWriter(str(tmp_path / "rf2.gguf"))
    for k, v in r.metadata.items():
        try:
            w.add_meta(k, v)
        except TypeError:
            pass
    factors = np.linspace(1.0, 8.0, 32).astype(np.float32)  # head_dim 64
    w.add_tensor("rope_freqs.weight", factors)
    for name in r.tensors:
        info = r.info(name)
        w.add_tensor(name, raw=bytes(r.raw_bytes(name)), shape=info.shape,
                     dtype=info.dtype)
    w.write()

    r2 = GGUFReader(str(tmp_path / "rf2.gguf"))
    got = rope_freq_factors(r2)
    np.testing.assert_allclose(got, factors)
    cos0, _ = rope_table(16, 64, 10000.0)
    cos1, _ = rope_table(16, 64, 10000.0, got)
    assert not np.allclose(np.asarray(cos0), np.asarray(cos1))
    m = load_model(str(tmp_path / "rf2.gguf"))
    logits, _, _ = forward(m.arch, m.weights, KVCache.create(m.arch),
                           jnp.asarray([1, 2, 3], jnp.int32), 0)
    assert bool(jnp.isfinite(logits).all())


def test_int8_kv_cache(model_quant):
    """int8 KV with per-position scales: half the cache memory, logits
    within quantization tolerance of the bf16 cache, greedy tokens equal
    (the reference planned KV quantization but never built it)."""
    m = model_quant
    tokens = jnp.asarray([1, 5, 9, 2], jnp.int32)
    kv_b = KVCache.create(m.arch)
    kv_q = KVCache.create(m.arch, quant=True)
    assert kv_q.quantized and kv_q.k.dtype == jnp.int8
    assert kv_q.k.nbytes == kv_b.k.nbytes // 2

    lb, kv_b, _ = forward(m.arch, m.weights, kv_b, tokens, 0)
    lq, kv_q, _ = forward(m.arch, m.weights, kv_q, tokens, 0)
    import numpy as np
    np.testing.assert_allclose(np.asarray(lq), np.asarray(lb), atol=0.06)
    # teacher-forced continuation: per-step logits stay within quant error
    # (random-weight logits cluster tightly, so exact argmax agreement is
    # not a meaningful bar — real models have far larger logit margins)
    for step, t in enumerate([7, 123, 9, 400]):
        lb, kv_b, _ = forward(m.arch, m.weights, kv_b,
                              jnp.asarray([t], jnp.int32), 4 + step)
        lq, kv_q, _ = forward(m.arch, m.weights, kv_q,
                              jnp.asarray([t], jnp.int32), 4 + step)
        np.testing.assert_allclose(np.asarray(lq), np.asarray(lb), atol=0.08)


def test_int8_kv_with_layer_sel_and_nvalid(model_quant):
    m = model_quant
    import numpy as np
    padded = np.zeros(8, np.int32)
    padded[:3] = [1, 5, 9]
    kv_q = KVCache.create(m.arch, quant=True)
    lq, kv_q, _ = forward(m.arch, m.weights, kv_q, jnp.asarray(padded), 0,
                          n_valid=3, layer_sel=jnp.asarray([0, 1, 3], jnp.int32))
    kv_b = KVCache.create(m.arch)
    lb, _, _ = forward(m.arch, m.weights, kv_b, jnp.asarray(padded), 0,
                       n_valid=3, layer_sel=jnp.asarray([0, 1, 3], jnp.int32))
    np.testing.assert_allclose(np.asarray(lq), np.asarray(lb), atol=0.06)


def test_fused_qkv_gateup_parity(model_quant):
    """Fused wqkv / w_gate_up (one kernel call for QKV, one for gate|up)
    must reproduce the unfused forward exactly — same dots over the same
    planes, just concatenated lanes."""
    import jax.numpy as jnp
    import numpy as np
    from ntransformer_tpu.models.llama import (KVCache, forward,
                                               fuse_layer_weights)
    import dataclasses
    arch, w = model_quant.arch, model_quant.weights
    fused_layers = fuse_layer_weights(w.layers)
    assert fused_layers.wqkv is not None and fused_layers.w_gate_up is not None
    assert fused_layers.wq is None and fused_layers.w_gate is None
    wf = dataclasses.replace(w, layers=fused_layers)
    toks = jnp.asarray([1, 5, 9], jnp.int32)
    l0, kv0, _ = forward(arch, w, KVCache.create(arch), toks, 0)
    l1, kv1, _ = forward(arch, wf, KVCache.create(arch), toks, 0)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                               rtol=1e-5, atol=1e-5)
    # decode step on top
    nxt = jnp.asarray([int(jnp.argmax(l0[0]))], jnp.int32)
    l0b, _, _ = forward(arch, w, kv0, nxt, 3)
    l1b, _, _ = forward(arch, wf, kv1, nxt, 3)
    np.testing.assert_allclose(np.asarray(l0b), np.asarray(l1b),
                               rtol=1e-5, atol=1e-5)


def test_fused_wqk_mixed_dtype_parity(tmp_path, monkeypatch):
    """A file whose attn_v dtype differs from q/k (llama.cpp's real
    Q4_K_M puts Q6_K on attn_v in some layers) can't fuse the full QKV,
    but q|k fuse on their own (r2 weak #1b) — and the forward still
    matches the unfused one exactly."""
    import dataclasses
    import jax.numpy as jnp
    import numpy as np
    import tools.make_test_gguf as mtg
    from ntransformer_tpu.core.dtypes import DType
    from ntransformer_tpu.models.llama import (KVCache, forward,
                                               fuse_layer_weights)
    from ntransformer_tpu.models.loader import load_model

    def mixed_policy(name):
        return DType.Q6_K if ("attn_v" in name or "ffn_down" in name
                              or "token_embd" in name) else DType.Q4_K
    monkeypatch.setattr(mtg, "q4_k_m_policy", mixed_policy)
    path = str(tmp_path / "mix.gguf")
    write_model(path, "tiny", "q4_k_m", seed=44)
    m = load_model(path)
    arch, w = m.arch, m.weights
    fused = fuse_layer_weights(w.layers)
    assert fused.wqkv is None          # mixed dtype: full fuse impossible
    assert fused.wqk is not None       # ...but q|k fused
    assert fused.wq is None and fused.wk is None and fused.wv is not None
    wf = dataclasses.replace(w, layers=fused)
    toks = jnp.asarray([1, 5, 9, 2], jnp.int32)
    l0, kv0, _ = forward(arch, w, KVCache.create(arch), toks, 0)
    l1, kv1, _ = forward(arch, wf, KVCache.create(arch), toks, 0)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                               rtol=1e-5, atol=1e-5)


def test_padded_lm_head_logits_match(tmp_path, monkeypatch):
    """NT_PAD_VOCAB lane-pads the LM head (and the tied table); logits must
    equal the unpadded model's over the real vocab, both model paths."""
    import os
    import jax.numpy as jnp
    from ntransformer_tpu.models.llama import KVCache, forward
    from ntransformer_tpu.models.loader import load_model
    from tools.make_test_gguf import write_model
    path = str(tmp_path / "pad.gguf")
    write_model(path, "tiny", "q8_0", seed=29)
    ref = load_model(path)
    monkeypatch.setenv("NT_PAD_VOCAB", "300")  # 512 -> 600 (88 zero lanes)
    padded = load_model(path)
    assert padded.weights.lm_head.n == 600
    toks = jnp.asarray([1, 5, 9], jnp.int32)
    lr, _, _ = forward(ref.arch, ref.weights, KVCache.create(ref.arch),
                       toks, 0)
    lp, _, _ = forward(padded.arch, padded.weights,
                       KVCache.create(padded.arch), toks, 0)
    assert lp.shape == lr.shape  # sliced back to vocab_size
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lr),
                               rtol=1e-5, atol=1e-5)

    # batched step path
    from ntransformer_tpu.models.batched import BatchedKV, batched_decode_step
    lb, _ = batched_decode_step(ref.arch, padded.weights,
                                BatchedKV.create(ref.arch, 2),
                                jnp.asarray([3, 7], jnp.int32),
                                jnp.zeros(2, jnp.int32),
                                jnp.ones(2, bool))
    lb_ref, _ = batched_decode_step(ref.arch, ref.weights,
                                    BatchedKV.create(ref.arch, 2),
                                    jnp.asarray([3, 7], jnp.int32),
                                    jnp.zeros(2, jnp.int32),
                                    jnp.ones(2, bool))
    np.testing.assert_allclose(np.asarray(lb), np.asarray(lb_ref),
                               rtol=1e-5, atol=1e-5)
