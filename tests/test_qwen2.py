"""Qwen2-family support: QKV biases end-to-end.

The reference is llama-only (config.h:13); qwen2 is the same RMSNorm +
RoPE + GQA + SwiGLU block with three extra bias vectors on the q/k/v
projections (and NEOX half-split rope, the arch default in
models/config.py). Biases ride every path: resident forward (validated
against an independent numpy oracle here), the batched serving step,
tensor parallelism (lane-sharded with their matrices), tiered streaming
(packed with the per-layer norms), and the fused-QKV matmul (biases stay
per-part; the fused output is sliced back before the add).
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tools.make_test_gguf import write_model
from ntransformer_tpu.core.gguf import GGUFReader
from ntransformer_tpu.models.llama import (KVCache, forward,
                                           fuse_layer_weights)
from ntransformer_tpu.models.loader import load_model


@pytest.fixture(scope="module")
def q2_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "qwen2_f32.gguf"
    write_model(str(path), "tiny", "f32", seed=21, arch="qwen2")
    return str(path)


@pytest.fixture(scope="module")
def q2_model(q2_path):
    return load_model(q2_path)


@pytest.fixture(scope="module")
def q2_q8_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "qwen2_q8.gguf"
    write_model(str(path), "tiny", "q8_0", seed=22, arch="qwen2")
    return str(path)


def test_qwen2_loads_biases(q2_model):
    cfg, arch, lw = q2_model.config, q2_model.arch, q2_model.weights.layers
    assert cfg.architecture == "qwen2"
    assert not cfg.rope_interleaved  # NEOX half-split arch default
    assert lw.bq.shape == (arch.n_layers, arch.n_heads * arch.head_dim)
    assert lw.bk.shape == (arch.n_layers, arch.n_kv_heads * arch.head_dim)
    assert float(jnp.abs(lw.bq).max()) > 0


def _numpy_reference(path: str, tokens: np.ndarray) -> np.ndarray:
    """Independent f32 numpy forward (HF Qwen2 semantics: RMSNorm →
    qkv + bias → half-split rope → causal GQA attention → o-proj →
    residual → RMSNorm → SwiGLU → residual; final norm; lm_head)."""
    r = GGUFReader(path)
    md = r.metadata

    def t(name):
        info = r.info(name)
        return (np.frombuffer(bytes(r.raw_bytes(name)), np.float32)
                .reshape(info.shape))

    H = int(md["qwen2.embedding_length"])
    L = int(md["qwen2.block_count"])
    nh = int(md["qwen2.attention.head_count"])
    nkv = int(md["qwen2.attention.head_count_kv"])
    D = H // nh
    theta = float(md["qwen2.rope.freq_base"])
    eps = float(md["qwen2.attention.layer_norm_rms_epsilon"])
    T = len(tokens)

    def rms(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w

    def rope(x):  # x [T, Hh, D] half-split pairs (i, i+D/2)
        d2 = D // 2
        inv = theta ** (-np.arange(d2) / d2)
        ang = np.arange(T)[:, None] * inv[None, :]      # [T, d2]
        c, s = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
        x0, x1 = x[..., :d2], x[..., d2:]
        return np.concatenate([x0 * c - x1 * s, x0 * s + x1 * c], -1)

    x = t("token_embd.weight")[tokens]                  # [T, H]
    for i in range(L):
        pre = f"blk.{i}."
        h = rms(x, t(pre + "attn_norm.weight"))
        q = h @ t(pre + "attn_q.weight").T + t(pre + "attn_q.bias")
        k = h @ t(pre + "attn_k.weight").T + t(pre + "attn_k.bias")
        v = h @ t(pre + "attn_v.weight").T + t(pre + "attn_v.bias")
        q = rope(q.reshape(T, nh, D))
        k = rope(k.reshape(T, nkv, D))
        v = v.reshape(T, nkv, D)
        att = np.zeros((T, nh, D), np.float32)
        group = nh // nkv
        for hh in range(nh):
            kk, vv = k[:, hh // group], v[:, hh // group]   # [T, D]
            sc = (q[:, hh] @ kk.T) / np.sqrt(D)             # [T, T]
            sc += np.triu(np.full((T, T), -1e30), 1)        # causal
            p = np.exp(sc - sc.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            att[:, hh] = p @ vv
        x = x + att.reshape(T, H) @ t(pre + "attn_output.weight").T
        h = rms(x, t(pre + "ffn_norm.weight"))
        g = h @ t(pre + "ffn_gate.weight").T
        u = h @ t(pre + "ffn_up.weight").T
        act = g / (1 + np.exp(-g)) * u                      # silu * up
        x = x + act @ t(pre + "ffn_down.weight").T
    x = rms(x, t("output_norm.weight"))
    logits = x @ t("output.weight").T
    r.close()
    return logits


def test_qwen2_matches_numpy_oracle(q2_path, q2_model):
    tokens = np.array([3, 17, 5, 42, 9, 11, 7], np.int32)
    ref = _numpy_reference(q2_path, tokens)
    kv = KVCache.create(q2_model.arch)
    logits, _, _ = forward(q2_model.arch, q2_model.weights, kv,
                           jnp.asarray(tokens), 0, all_logits=True)
    got = np.asarray(logits, np.float32)
    # the framework path computes matmuls in bf16 — compare argmax and
    # loose numerics (a bias or rope-pairing bug moves logits by O(1))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0.08, atol=0.08)
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.85


def test_qwen2_zero_bias_equals_no_bias(q2_model):
    tokens = jnp.asarray(np.array([3, 5, 9], np.int32))
    m = q2_model
    zeroed = dataclasses.replace(
        m.weights, layers=dataclasses.replace(
            m.weights.layers,
            bq=jnp.zeros_like(m.weights.layers.bq),
            bk=jnp.zeros_like(m.weights.layers.bk),
            bv=jnp.zeros_like(m.weights.layers.bv)))
    none = dataclasses.replace(
        m.weights, layers=dataclasses.replace(
            m.weights.layers, bq=None, bk=None, bv=None))
    la, _, _ = forward(m.arch, zeroed, KVCache.create(m.arch), tokens, 0)
    lb, _, _ = forward(m.arch, none, KVCache.create(m.arch), tokens, 0)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_qwen2_fused_matches_unfused(q2_q8_path):
    m = load_model(q2_q8_path)
    fused_layers = fuse_layer_weights(m.weights.layers)
    assert fused_layers.wqkv is not None  # uniform dtype → full fuse
    assert fused_layers.bq is not None    # biases stay per-part
    fused = dataclasses.replace(m.weights, layers=fused_layers)
    tokens = jnp.asarray(np.array([2, 8, 31, 4], np.int32))
    la, _, _ = forward(m.arch, m.weights, KVCache.create(m.arch), tokens, 0)
    lb, _, _ = forward(m.arch, fused, KVCache.create(m.arch), tokens, 0)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=2e-2, atol=2e-2)


def test_qwen2_engine_and_batched_server(q2_q8_path):
    """Greedy generation through the Engine and the batch server agree —
    the serving path carries the biases too."""
    from ntransformer_tpu.inference.engine import Engine, GenerateConfig
    from ntransformer_tpu.inference.sampler import SamplerConfig
    from ntransformer_tpu.inference.serve import BatchServer, Request

    m = load_model(q2_q8_path)
    eng = Engine(m)
    cfg = GenerateConfig(max_tokens=6, temperature=0.0, repeat_penalty=1.0)
    want, _ = eng.generate("hello world", cfg)

    srv = BatchServer(m, batch_size=2,
                      sampler_cfg=SamplerConfig(temperature=0.0))
    reqs = [Request(prompt="hello world", max_tokens=6)]
    srv.run(reqs)
    assert reqs[0].text == want


def test_qwen2_tiered_matches_resident(q2_q8_path, tmp_path):
    """SLEP streaming packs the biases with the per-layer norms: tiered
    greedy decode is bit-identical to resident."""
    from ntransformer_tpu.inference.engine import Engine, GenerateConfig
    from ntransformer_tpu.inference.engine import TieredEngine
    from ntransformer_tpu.models.tiered import load_model_tiered

    cfg = GenerateConfig(max_tokens=5, temperature=0.0, repeat_penalty=1.0)
    want, _ = Engine(load_model(q2_q8_path)).generate("hello", cfg)
    tm = load_model_tiered(q2_q8_path, max_hbm_layers=2, max_ram_layers=2,
                           hbm_bytes=8 << 30, ram_bytes=16 << 30)
    got, _ = TieredEngine(tm).generate("hello", cfg)
    assert got == want


def test_qwen2_tp_matches_single(q2_q8_path):
    """TP forward with lane-sharded biases reproduces the single-device
    logits on a CPU mesh."""
    import jax
    from jax.sharding import Mesh
    from ntransformer_tpu.models.llama import KVCache
    from ntransformer_tpu.parallel.tp import (TP_AXIS, make_tp_forward,
                                              shard_model)

    m = load_model(q2_q8_path, device=False)
    devs = np.array(jax.devices("cpu")[:2])
    mesh = Mesh(devs, (TP_AXIS,))
    w_sh, kv_sh = shard_model(m.weights, KVCache.create(m.arch), mesh,
                              m.arch)
    fwd = make_tp_forward(mesh, m.arch, weights_template=m.weights)
    tokens = jnp.asarray(np.array([3, 7, 12], np.int32))
    lt, _, _ = fwd(w_sh, kv_sh, tokens, jnp.int32(0))

    m1 = load_model(q2_q8_path)
    ls, _, _ = forward(m1.arch, m1.weights, KVCache.create(m1.arch),
                       tokens, 0)
    np.testing.assert_allclose(np.asarray(lt), np.asarray(ls),
                               rtol=2e-2, atol=2e-2)


def test_v1_pack_with_biases_rebuilds(q2_q8_path):
    """A pre-v2 .ntp built from a bias-carrying GGUF lacks bq/bk/bv in its
    blobs; ensure_pack must rebuild it even though the GGUF content key
    still matches (pack format version check)."""
    import numpy as np
    from ntransformer_tpu.core.gguf import GGUFReader
    from ntransformer_tpu.memory.pack import (PACK_VERSION, PackReader,
                                              ensure_pack, pack_path_for)

    r = GGUFReader(q2_q8_path)
    pr = ensure_pack(r, q2_q8_path)
    path = pr.path
    assert pr.version == PACK_VERSION
    assert "bq" in pr.layer_meta(0)["norms"]
    # forge a v1 pack: binary-patch the version field (magic|u32 version)
    with open(path, "r+b") as f:
        f.seek(4)
        f.write(np.uint32(1).tobytes())
    assert PackReader(path).version == 1
    pr2 = ensure_pack(r, q2_q8_path)
    assert pr2.version == PACK_VERSION  # rebuilt, biases present again
    assert "bq" in pr2.layer_meta(0)["norms"]
    r.close()
