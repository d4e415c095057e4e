"""RoPE pairing correctness for llama.cpp-ecosystem GGUF files.

llama.cpp's converter PERMUTES llama q/k projection rows into
adjacent-pair order (convert_hf_to_gguf.py LlamaModel.permute), and ggml
applies ROPE_TYPE_NORM (adjacent (2i, 2i+1) pairs) to llama files;
qwen2/neox-family files stay in HF half-split order under ROPE_TYPE_NEOX.
The reference applies half-split to EVERY file (rotary.cu:25-60;
config.h:36's rope_interleaved default is never overridden) — mismatched
pairing on real llama GGUFs. This repo keys the pairing on architecture
(llama/mistral → adjacent) with an explicit `ntransformer.rope_style`
override that this repo's own writers stamp ("half": they emit q/k rows
unpermuted).

The decisive test: the SAME model written both ways — our half-split
order, and llama.cpp's permuted adjacent order without the override key —
must produce the same logits through the full engine.
"""
import numpy as np
import pytest

from ntransformer_tpu.core.gguf import GGUFReader, GGUFWriter
from ntransformer_tpu.models.config import ModelConfig
from ntransformer_tpu.models.llama import KVCache, forward
from ntransformer_tpu.models.loader import load_model
from tools.make_test_gguf import write_model


def _cfg(md):
    return ModelConfig.from_gguf_metadata(md)


def test_rope_style_defaults():
    assert _cfg({"general.architecture": "llama"}).rope_interleaved
    assert _cfg({"general.architecture": "mistral"}).rope_interleaved
    assert not _cfg({"general.architecture": "qwen2"}).rope_interleaved
    # explicit key wins (this repo's writers stamp "half")
    assert not _cfg({"general.architecture": "llama",
                     "ntransformer.rope_style": "half"}).rope_interleaved
    assert _cfg({"general.architecture": "qwen2",
                 "ntransformer.rope_style": "adjacent"}).rope_interleaved
    with pytest.raises(ValueError):
        _cfg({"general.architecture": "llama",
              "ntransformer.rope_style": "neox"})


def test_own_writer_stamps_half(tmp_path):
    path = str(tmp_path / "own.gguf")
    write_model(path, "tiny", "q8_0", seed=5)
    r = GGUFReader(path)
    assert r.metadata["ntransformer.rope_style"] == "half"
    assert not ModelConfig.from_gguf_metadata(r.metadata).rope_interleaved
    r.close()


def _llamacpp_permute(w: np.ndarray, n_head: int) -> np.ndarray:
    """convert_hf_to_gguf.py LlamaModel.permute: HF half-split row order →
    ggml NORM adjacent-pair row order. w is [n, k] with n = n_head * D."""
    n, k = w.shape
    return (w.reshape(n_head, 2, n // n_head // 2, k)
            .swapaxes(1, 2).reshape(n, k))


def test_permuted_adjacent_matches_half_split(tmp_path):
    """The same weights written (a) in this repo's half-split order with
    the override key and (b) llama.cpp-permuted WITHOUT the key (a real
    ecosystem file) must generate identical logits — proving the
    adjacent-rope path decodes real llama GGUFs correctly."""
    own = str(tmp_path / "own_f32.gguf")
    write_model(own, "tiny", "f32", seed=7)
    r = GGUFReader(own)
    cfg = ModelConfig.from_gguf_metadata(r.metadata)
    assert not cfg.rope_interleaved

    eco = str(tmp_path / "ecosystem_f32.gguf")
    w = GGUFWriter(eco)
    for k, v in r.metadata.items():
        if k == "ntransformer.rope_style":
            continue  # ecosystem files don't carry the override
        w.add_meta(k, v)
    for name, info in r.tensors.items():
        raw = bytes(r.raw_bytes(name))
        if name.endswith(("attn_q.weight", "attn_k.weight")):
            heads = cfg.n_heads if "attn_q" in name else cfg.n_kv_heads
            arr = np.frombuffer(raw, np.float32).reshape(info.shape).copy()
            raw = _llamacpp_permute(arr, heads).tobytes()
        w.add_tensor(name, raw=raw, shape=tuple(info.shape),
                     dtype=info.dtype)
    w.write()
    r.close()

    m_own = load_model(own)
    m_eco = load_model(eco)
    assert not m_own.config.rope_interleaved
    assert m_eco.config.rope_interleaved  # llama default: adjacent

    tokens = np.array([1, 5, 9, 14, 27], np.int32)
    import jax.numpy as jnp
    for m in (m_own, m_eco):
        kv = KVCache.create(m.arch)
        logits, _, _ = forward(m.arch, m.weights, kv,
                               jnp.asarray(tokens), 0)
        m._logits = np.asarray(logits[0], np.float64)
    # same math, element order inside each head differs → tiny float
    # association differences only
    np.testing.assert_allclose(m_own._logits, m_eco._logits,
                               rtol=2e-5, atol=2e-5)
