"""Gemma-1 family support (beyond the llama-only reference, config.h:13).

Gemma deltas vs llama, all STATIC Arch switches (llama graphs unchanged
at their defaults): gelu-tanh gating instead of silu, RMSNorm scaling by
(1 + w), embeddings multiplied by sqrt(hidden), tied LM head (no
output.weight in the file), NEOX half-split rope (the non-llama arch
default). gemma2 (softcaps, alternating SWA, post-norms) is covered in
tests/test_gemma2.py.
"""
import numpy as np
import pytest

from tools.make_test_gguf import write_model
from ntransformer_tpu.core.gguf import GGUFReader
from ntransformer_tpu.models.config import ModelConfig
from ntransformer_tpu.models.llama import KVCache, forward
from ntransformer_tpu.models.loader import load_model


@pytest.fixture(scope="module")
def g_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "gemma_f32.gguf"
    write_model(str(path), "tiny", "f32", seed=61, arch="gemma")
    return str(path)


@pytest.fixture(scope="module")
def g_model(g_path):
    return load_model(g_path)


def test_gemma_config_switches(g_model):
    cfg = g_model.config
    assert cfg.architecture == "gemma"
    assert cfg.act == "gelu_tanh"
    assert cfg.norm_bias == 1.0
    assert cfg.embed_scale == pytest.approx(cfg.hidden_size ** 0.5)
    assert not cfg.rope_interleaved          # NEOX half-split
    assert g_model.weights.lm_head is g_model.weights.embed  # tied


def test_gemma2_config_parses():
    """gemma2 is supported (tests/test_gemma2.py); the config layer fills
    the family defaults even from bare metadata."""
    cfg = ModelConfig.from_gguf_metadata({"general.architecture": "gemma2"})
    assert cfg.post_norms and cfg.swa_pattern == 2
    assert cfg.sliding_window == 4096
    assert cfg.attn_softcap == 50.0 and cfg.final_softcap == 30.0


def _numpy_reference(path: str, tokens: np.ndarray) -> np.ndarray:
    """Independent f32 numpy gemma forward: embed*sqrt(H) → [RMSNorm(1+w)
    → qkv → half rope → causal GQA → o-proj → residual → RMSNorm(1+w) →
    gelu_tanh(gate)*up → down → residual] × L → final norm(1+w) → tied
    head (x @ embed.T)."""
    r = GGUFReader(path)
    md = r.metadata

    def t(name):
        info = r.info(name)
        return (np.frombuffer(bytes(r.raw_bytes(name)), np.float32)
                .reshape(info.shape))

    H = int(md["gemma.embedding_length"])
    L = int(md["gemma.block_count"])
    nh = int(md["gemma.attention.head_count"])
    nkv = int(md["gemma.attention.head_count_kv"])
    D = H // nh
    theta = float(md["gemma.rope.freq_base"])
    eps = float(md["gemma.attention.layer_norm_rms_epsilon"])
    T = len(tokens)

    def rms(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * (1 + w)

    def rope(x):
        d2 = D // 2
        inv = theta ** (-np.arange(d2) / d2)
        ang = np.arange(T)[:, None] * inv[None, :]
        c, s = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
        x0, x1 = x[..., :d2], x[..., d2:]
        return np.concatenate([x0 * c - x1 * s, x0 * s + x1 * c], -1)

    def gelu_tanh(g):
        return 0.5 * g * (1 + np.tanh(np.sqrt(2 / np.pi)
                                      * (g + 0.044715 * g ** 3)))

    embed = t("token_embd.weight")                      # [V, H]
    x = embed[tokens] * np.sqrt(H)
    for i in range(L):
        pre = f"blk.{i}."
        h = rms(x, t(pre + "attn_norm.weight"))
        q = rope((h @ t(pre + "attn_q.weight").T).reshape(T, nh, D))
        k = rope((h @ t(pre + "attn_k.weight").T).reshape(T, nkv, D))
        v = (h @ t(pre + "attn_v.weight").T).reshape(T, nkv, D)
        att = np.zeros((T, nh, D), np.float32)
        group = nh // nkv
        for hh in range(nh):
            sc = (q[:, hh] @ k[:, hh // group].T) / np.sqrt(D)
            sc += np.triu(np.full((T, T), -1e30), 1)
            pr = np.exp(sc - sc.max(-1, keepdims=True))
            pr /= pr.sum(-1, keepdims=True)
            att[:, hh] = pr @ v[:, hh // group]
        x = x + att.reshape(T, H) @ t(pre + "attn_output.weight").T
        h = rms(x, t(pre + "ffn_norm.weight"))
        g = h @ t(pre + "ffn_gate.weight").T
        u = h @ t(pre + "ffn_up.weight").T
        x = x + (gelu_tanh(g) * u) @ t(pre + "ffn_down.weight").T
    x = rms(x, t("output_norm.weight"))
    logits = x @ embed.T                                # tied head
    r.close()
    return logits


def test_gemma_matches_numpy_oracle(g_path, g_model):
    import jax.numpy as jnp
    tokens = np.array([3, 17, 5, 42, 9], np.int32)
    ref = _numpy_reference(g_path, tokens)
    kv = KVCache.create(g_model.arch)
    logits, _, _ = forward(g_model.arch, g_model.weights, kv,
                           jnp.asarray(tokens), 0, all_logits=True)
    got = np.asarray(logits, np.float32)
    assert got.shape == ref.shape
    # bf16 matmuls + the sqrt(H)*x magnitudes → slightly looser than qwen2
    np.testing.assert_allclose(got, ref, rtol=0.12, atol=0.12
                               * float(np.abs(ref).max()))
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.8


def test_gemma_engine_server_tiered_agree(tmp_path_factory):
    """Greedy generation agrees across Engine, BatchServer, and the tiered
    streaming path on a q8_0 gemma file (the switches ride every path)."""
    from ntransformer_tpu.inference.engine import (Engine, GenerateConfig,
                                                   TieredEngine)
    from ntransformer_tpu.inference.sampler import SamplerConfig
    from ntransformer_tpu.inference.serve import BatchServer, Request
    from ntransformer_tpu.models.tiered import load_model_tiered

    path = str(tmp_path_factory.mktemp("models") / "gemma_q8.gguf")
    write_model(path, "tiny", "q8_0", seed=62, arch="gemma")
    cfg = GenerateConfig(max_tokens=6, temperature=0.0, repeat_penalty=1.0)
    want, _ = Engine(load_model(path)).generate("hello world", cfg)

    srv = BatchServer(load_model(path), batch_size=2,
                      sampler_cfg=SamplerConfig(temperature=0.0))
    reqs = [Request(prompt="hello world", max_tokens=6)]
    srv.run(reqs)
    assert reqs[0].text == want

    tm = load_model_tiered(path, max_hbm_layers=2, max_ram_layers=2,
                           hbm_bytes=8 << 30, ram_bytes=16 << 30)
    got, _ = TieredEngine(tm).generate("hello world", cfg)
    assert got == want
