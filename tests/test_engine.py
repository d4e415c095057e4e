"""Engine tests: greedy determinism, bucketed prefill, speculative decoding
equivalence, layer-skip calibration."""
import jax.numpy as jnp
import numpy as np
import pytest

from ntransformer_tpu.inference.engine import Engine, GenerateConfig
from ntransformer_tpu.models.llama import KVCache, forward
from ntransformer_tpu.models.loader import load_model
from tools.make_test_gguf import write_model


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "tiny.gguf"
    write_model(str(path), "tiny", "q8_0", seed=3)
    return Engine(load_model(str(path)))


GREEDY = GenerateConfig(max_tokens=12, temperature=0.0, repeat_penalty=1.0)


def test_greedy_deterministic(engine):
    t1, s1 = engine.generate("hello world", GREEDY)
    t2, s2 = engine.generate("hello world", GREEDY)
    assert t1 == t2
    assert s1.decode_tokens == s2.decode_tokens > 0
    assert s1.prefill_tokens > 0


def test_bucketed_prefill_matches_exact(engine):
    """Padding the prefill must not change the first sampled token."""
    m = engine.model
    ids = engine.tokenizer.encode("the capital of france is", add_bos=True)
    t = len(ids)
    # exact-length forward
    le, _, _ = forward(m.arch, m.weights, KVCache.create(m.arch),
                       jnp.asarray(ids, dtype=jnp.int32), 0)
    # bucketed via engine._prefill
    lp, _, _ = engine._prefill(KVCache.create(m.arch), ids)
    np.testing.assert_allclose(np.asarray(le), np.asarray(lp),
                               rtol=2e-3, atol=2e-3)


def test_padding_does_not_corrupt_cache(engine):
    """Decode after a bucketed prefill must match decode after exact prefill."""
    m = engine.model
    ids = engine.tokenizer.encode("hello", add_bos=True)
    t = len(ids)
    # exact
    kv1 = KVCache.create(m.arch)
    _, kv1, _ = forward(m.arch, m.weights, kv1,
                        jnp.asarray(ids, dtype=jnp.int32), 0)
    l1, _, _ = forward(m.arch, m.weights, kv1, jnp.asarray([9]), t)
    # bucketed
    kv2 = KVCache.create(m.arch)
    _, kv2, _ = engine._prefill(kv2, ids)
    l2, _, _ = forward(m.arch, m.weights, kv2, jnp.asarray([9]), t)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=2e-3, atol=2e-3)


def test_self_speculative_matches_greedy(engine):
    cfg = GenerateConfig(max_tokens=12, temperature=0.0, repeat_penalty=1.0,
                         draft_k=3)
    plain, _ = engine.generate("hello world", GREEDY)
    spec, stats = engine.generate_self_speculative("hello world", cfg,
                                                   draft_layers=2)
    assert spec.startswith(plain[: min(len(plain), len(spec))]) or plain.startswith(spec)
    assert stats.drafted > 0


def test_speculative_with_draft_model(tmp_path):
    p = tmp_path / "m.gguf"
    write_model(str(p), "tiny", "q8_0", seed=3)
    main = load_model(str(p))
    draft = load_model(str(p))  # identical draft → near-100% acceptance
    eng = Engine(main, draft)
    cfg = GenerateConfig(max_tokens=10, temperature=0.0, repeat_penalty=1.0,
                         draft_k=3)
    plain, _ = eng.generate("hello", GREEDY)
    spec, stats = eng.generate_speculative("hello", cfg)
    assert stats.drafted > 0
    # identical draft/target: acceptance should be (near-)total
    assert stats.accepted >= stats.drafted * 0.8
    assert spec.startswith(plain[: min(len(plain), len(spec))]) or plain.startswith(spec)


def test_layer_skip_calibration(engine):
    engine.layer_sel = None
    # threshold just above 0: any positive cosine in the middle band skips
    cfg = GenerateConfig(max_tokens=4, temperature=0.0, repeat_penalty=1.0,
                         skip_threshold=1e-6)
    _, stats = engine.generate("hello", cfg)
    # middle 50% band of 4 layers = layers 1, 2 (residual streams keep
    # cosine similarity well above 0 on every layer)
    assert stats.skipped_layers == [1, 2]
    assert list(engine.layer_sel) == [0, 3]
    engine.layer_sel = None  # restore for other tests


def test_sampled_generation_runs(engine):
    cfg = GenerateConfig(max_tokens=8, temperature=0.9, top_k=20, top_p=0.9,
                         repeat_penalty=1.2, seed=7)
    text, stats = engine.generate("hello", cfg)
    assert stats.decode_tokens > 0


def test_benchmark_on_device_loop(engine):
    stats = engine.benchmark("hello world", n_tokens=6)
    assert stats.decode_tokens == 6
    assert stats.decode_ms > 0


def test_fused_self_spec_matches_greedy(engine):
    """The fused on-device speculative iteration must reproduce plain
    greedy generation exactly (accept rule preserves argmax)."""
    from ntransformer_tpu.inference.engine import GenerateConfig
    cfg = GenerateConfig(max_tokens=12, temperature=0.0, repeat_penalty=1.0,
                         draft_k=3)
    ref, _ = engine.generate("one two three", cfg)
    out, stats = engine.generate_self_speculative_fused("one two three", cfg)
    assert out == ref
    assert stats.drafted > 0


def test_chunked_prefill_matches_single(engine, monkeypatch):
    """Prompts beyond the chunk size prefill in chunks with identical
    results to one whole-prompt forward."""
    m = engine.model
    monkeypatch.setattr(type(engine), "PREFILL_CHUNK", 128)
    ids = list((np.arange(300) % 400 + 5).tolist())
    lc, kvc, _ = engine._prefill(KVCache.create(m.arch), ids)  # 3 chunks
    lr, kvr, _ = forward(m.arch, m.weights, KVCache.create(m.arch),
                         jnp.asarray(ids, jnp.int32), 0)
    # different dot shapes accumulate in different orders -> fp-level drift
    np.testing.assert_allclose(np.asarray(lc), np.asarray(lr), atol=1e-2)
    # caches agree on the valid region
    np.testing.assert_allclose(
        np.asarray(kvc.k[:, :, :300]).astype(np.float32),
        np.asarray(kvr.k[:, :, :300]).astype(np.float32), atol=1e-2)


def test_overlong_prompt_clamped(engine):
    """A prompt longer than the context window is clamped to its tail
    instead of scattering KV past the cache end."""
    long_prompt = "a " * 2000  # tiny model ctx = 512
    text, stats = engine.generate(long_prompt, GenerateConfig(
        max_tokens=2, temperature=0.0, repeat_penalty=1.0))
    assert stats.prefill_tokens <= engine.arch.max_seq_len - 2
    assert stats.decode_tokens >= 1


def test_chat_session_delta_prefill(engine):
    """Turn 2 with a ChatSession prefills only the new tokens and produces
    the same text as a fresh full-history generate."""
    from ntransformer_tpu.inference.engine import ChatSession
    sess = ChatSession()
    ids1 = engine.tokenizer.encode("one two three", add_bos=True)
    out1, s1 = engine.generate("", GREEDY, prompt_ids=ids1, session=sess)
    assert s1.prefill_tokens == len(ids1)
    assert sess.kv is not None
    assert sess.ids_in_kv[: len(ids1)] == ids1

    # turn 2 extends the cached prefix (chat history is append-only)
    extra = engine.tokenizer.encode("four five six seven", add_bos=False)
    ids2 = list(sess.ids_in_kv) + extra
    out2, s2 = engine.generate("", GREEDY, prompt_ids=ids2, session=sess)
    # only the delta (extra minus nothing; last cached token still counts
    # as cached) prefills
    assert s2.prefill_tokens <= len(extra) + 1
    # parity with a stateless full-history generate
    ref, sref = engine.generate("", GREEDY, prompt_ids=ids2)
    assert sref.prefill_tokens == len(ids2)
    assert out2 == ref


def test_chat_session_divergence_safe(engine):
    """A session whose cached ids diverge from the new prompt re-prefills
    from the first mismatch and still matches stateless output."""
    from ntransformer_tpu.inference.engine import ChatSession
    sess = ChatSession()
    ids1 = engine.tokenizer.encode("alpha beta gamma delta", add_bos=True)
    engine.generate("", GREEDY, prompt_ids=ids1, session=sess)
    # new prompt shares only the first 2 tokens with the cache
    ids2 = ids1[:2] + engine.tokenizer.encode("zebra yak xylophone",
                                              add_bos=False)
    out, s = engine.generate("", GREEDY, prompt_ids=ids2, session=sess)
    ref, _ = engine.generate("", GREEDY, prompt_ids=ids2)
    assert out == ref
    assert s.prefill_tokens == len(ids2) - 2


def test_chat_session_reset(engine):
    from ntransformer_tpu.inference.engine import ChatSession
    sess = ChatSession()
    engine.generate("hello", GREEDY, session=sess)
    sess.reset()
    assert sess.kv is None and sess.ids_in_kv == []
