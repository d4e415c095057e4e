"""Qwen3-family support: per-head q/k RMSNorms end-to-end.

Qwen3 is the qwen2 graph minus the QKV biases plus RMSNorms over head_dim
applied to q and k before RoPE (llama.cpp build_qwen3; HF Qwen3Attention).
The norms ride every path: resident forward (validated against an
independent numpy oracle), the batched serving step, tensor parallelism
(replicated — they are per-head-dim, shared by all heads), and tiered
streaming (packed with the per-layer vectors, pack format v3).
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tools.make_test_gguf import write_model
from ntransformer_tpu.core.gguf import GGUFReader
from ntransformer_tpu.models.llama import KVCache, forward
from ntransformer_tpu.models.loader import load_model


@pytest.fixture(scope="module")
def q3_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "qwen3_f32.gguf"
    write_model(str(path), "tiny", "f32", seed=31, arch="qwen3")
    return str(path)


@pytest.fixture(scope="module")
def q3_model(q3_path):
    return load_model(q3_path)


@pytest.fixture(scope="module")
def q3_q8_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "qwen3_q8.gguf"
    write_model(str(path), "tiny", "q8_0", seed=32, arch="qwen3")
    return str(path)


def test_qwen3_loads_qk_norms(q3_model):
    cfg, arch, lw = q3_model.config, q3_model.arch, q3_model.weights.layers
    assert cfg.architecture == "qwen3" and cfg.qk_norm
    assert not cfg.rope_interleaved       # NEOX half-split arch default
    assert lw.bq is None                  # qwen3 drops the qwen2 biases
    assert lw.q_norm.shape == (arch.n_layers, arch.head_dim)
    assert lw.k_norm.shape == (arch.n_layers, arch.head_dim)
    assert float(jnp.abs(lw.q_norm).max()) > 0


def _numpy_reference(path: str, tokens: np.ndarray) -> np.ndarray:
    """Independent f32 numpy forward (HF Qwen3 semantics: RMSNorm → qkv →
    per-head q/k RMSNorm → half-split rope → causal GQA → o-proj →
    residual → RMSNorm → SwiGLU → residual; final norm; lm_head)."""
    r = GGUFReader(path)
    md = r.metadata

    def t(name):
        info = r.info(name)
        return (np.frombuffer(bytes(r.raw_bytes(name)), np.float32)
                .reshape(info.shape))

    H = int(md["qwen3.embedding_length"])
    L = int(md["qwen3.block_count"])
    nh = int(md["qwen3.attention.head_count"])
    nkv = int(md["qwen3.attention.head_count_kv"])
    D = H // nh
    theta = float(md["qwen3.rope.freq_base"])
    eps = float(md["qwen3.attention.layer_norm_rms_epsilon"])
    T = len(tokens)

    def rms(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w

    def rope(x):  # x [T, Hh, D] half-split pairs (i, i+D/2)
        d2 = D // 2
        inv = theta ** (-np.arange(d2) / d2)
        ang = np.arange(T)[:, None] * inv[None, :]
        c, s = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
        x0, x1 = x[..., :d2], x[..., d2:]
        return np.concatenate([x0 * c - x1 * s, x0 * s + x1 * c], -1)

    x = t("token_embd.weight")[tokens]
    for i in range(L):
        pre = f"blk.{i}."
        h = rms(x, t(pre + "attn_norm.weight"))
        q = (h @ t(pre + "attn_q.weight").T).reshape(T, nh, D)
        k = (h @ t(pre + "attn_k.weight").T).reshape(T, nkv, D)
        v = (h @ t(pre + "attn_v.weight").T).reshape(T, nkv, D)
        q = rope(rms(q, t(pre + "attn_q_norm.weight")))
        k = rope(rms(k, t(pre + "attn_k_norm.weight")))
        att = np.zeros((T, nh, D), np.float32)
        group = nh // nkv
        for hh in range(nh):
            sc = (q[:, hh] @ k[:, hh // group].T) / np.sqrt(D)
            sc += np.triu(np.full((T, T), -1e30), 1)
            p = np.exp(sc - sc.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            att[:, hh] = p @ v[:, hh // group]
        x = x + att.reshape(T, H) @ t(pre + "attn_output.weight").T
        h = rms(x, t(pre + "ffn_norm.weight"))
        g = h @ t(pre + "ffn_gate.weight").T
        u = h @ t(pre + "ffn_up.weight").T
        x = x + (g / (1 + np.exp(-g)) * u) @ t(pre + "ffn_down.weight").T
    x = rms(x, t("output_norm.weight"))
    logits = x @ t("output.weight").T
    r.close()
    return logits


def test_qwen3_matches_numpy_oracle(q3_path, q3_model):
    tokens = np.array([3, 17, 5, 42, 9, 11, 7], np.int32)
    ref = _numpy_reference(q3_path, tokens)
    kv = KVCache.create(q3_model.arch)
    logits, _, _ = forward(q3_model.arch, q3_model.weights, kv,
                           jnp.asarray(tokens), 0, all_logits=True)
    got = np.asarray(logits, np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0.08, atol=0.08)
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.85


def test_qwen3_qk_norm_changes_output(q3_model):
    """Dropping the q/k norms (qk_norm=False) must change the logits —
    i.e. the oracle-matched run genuinely applied them."""
    tokens = jnp.asarray(np.array([3, 5, 9, 14], np.int32))
    m = q3_model
    la, _, _ = forward(m.arch, m.weights, KVCache.create(m.arch), tokens, 0)
    arch_off = dataclasses.replace(m.arch, qk_norm=False)
    lb, _, _ = forward(arch_off, m.weights, KVCache.create(arch_off),
                       tokens, 0)
    assert not np.allclose(np.asarray(la), np.asarray(lb), atol=1e-3)


def test_qwen3_engine_and_batched_server(q3_q8_path):
    """Greedy generation through the Engine and the batch server agree —
    the batched serving step carries the q/k norms too."""
    from ntransformer_tpu.inference.engine import Engine, GenerateConfig
    from ntransformer_tpu.inference.sampler import SamplerConfig
    from ntransformer_tpu.inference.serve import BatchServer, Request

    m = load_model(q3_q8_path)
    eng = Engine(m)
    cfg = GenerateConfig(max_tokens=6, temperature=0.0, repeat_penalty=1.0)
    want, _ = eng.generate("hello world", cfg)

    srv = BatchServer(m, batch_size=2,
                      sampler_cfg=SamplerConfig(temperature=0.0))
    reqs = [Request(prompt="hello world", max_tokens=6)]
    srv.run(reqs)
    assert reqs[0].text == want


def test_qwen3_tiered_matches_resident(q3_q8_path):
    """SLEP streaming packs the q/k norms with the per-layer vectors
    (pack v3): tiered greedy decode is identical to resident."""
    from ntransformer_tpu.inference.engine import (Engine, GenerateConfig,
                                                   TieredEngine)
    from ntransformer_tpu.models.tiered import load_model_tiered

    cfg = GenerateConfig(max_tokens=5, temperature=0.0, repeat_penalty=1.0)
    want, _ = Engine(load_model(q3_q8_path)).generate("hello", cfg)
    tm = load_model_tiered(q3_q8_path, max_hbm_layers=2, max_ram_layers=2,
                           hbm_bytes=8 << 30, ram_bytes=16 << 30)
    got, _ = TieredEngine(tm).generate("hello", cfg)
    assert got == want


def test_qwen3_tp_matches_single(q3_q8_path):
    """TP forward with replicated q/k norms reproduces the single-device
    logits on a CPU mesh."""
    import jax
    from jax.sharding import Mesh
    from ntransformer_tpu.parallel.tp import (TP_AXIS, make_tp_forward,
                                              shard_model)

    m = load_model(q3_q8_path, device=False)
    mesh = Mesh(np.array(jax.devices("cpu")[:2]), (TP_AXIS,))
    w_sh, kv_sh = shard_model(m.weights, KVCache.create(m.arch), mesh,
                              m.arch)
    fwd = make_tp_forward(mesh, m.arch, weights_template=m.weights)
    tokens = jnp.asarray(np.array([3, 7, 12], np.int32))
    lt, _, _ = fwd(w_sh, kv_sh, tokens, jnp.int32(0))

    m1 = load_model(q3_q8_path)
    ls, _, _ = forward(m1.arch, m1.weights, KVCache.create(m1.arch),
                       tokens, 0)
    np.testing.assert_allclose(np.asarray(lt), np.asarray(ls),
                               rtol=2e-2, atol=2e-2)


def test_v2_pack_with_qk_norms_rebuilds(q3_q8_path):
    """A pre-v3 .ntp built from a qk-norm GGUF lacks q_norm/k_norm in its
    blobs; ensure_pack must rebuild it even though the GGUF content key
    still matches (pack format version check)."""
    import struct

    from ntransformer_tpu.core.gguf import GGUFReader
    from ntransformer_tpu.memory.pack import (MAGIC, PACK_VERSION,
                                              ensure_pack)

    r = GGUFReader(q3_q8_path)
    pr = ensure_pack(r, q3_q8_path)
    path = pr.path
    assert pr.version == PACK_VERSION
    # forge the binary version field back to 2
    # (layout: MAGIC | u32 version | u64 json_len | json, pack.py:12)
    with open(path, "r+b") as f:
        f.seek(len(MAGIC))
        f.write(struct.pack("<I", 2))
    pr2 = ensure_pack(GGUFReader(q3_q8_path), q3_q8_path)
    assert pr2.version == PACK_VERSION  # rebuilt, not reused
