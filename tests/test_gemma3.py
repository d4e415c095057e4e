"""Gemma-3 family support (beyond the llama-only reference, config.h:13).

Gemma-3 deltas vs gemma-2 (llama.cpp build_gemma3): q/k RMSNorms instead
of attention softcapping, a 5-local:1-global SWA pattern (layers with
l % 6 == 5 are global), and DUAL rope bases — the local (sliding-window)
layers rotate with their own base frequency (10k in real files; the
synthetic writer stamps 1000 so a single-table bug fails parity against
the 10k global base). Post norms, (1+w) norms, gelu-tanh gating, sqrt(H)
embed scaling and the tied LM head carry over from gemma-2.

Uses the 7-layer "deep" preset so the pattern includes one global layer.
"""
import numpy as np
import pytest

from tools.make_test_gguf import write_model
from ntransformer_tpu.core.gguf import GGUFReader
from ntransformer_tpu.models.llama import KVCache, forward
from ntransformer_tpu.models.loader import load_model


@pytest.fixture(scope="module")
def g3_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "gemma3_f32.gguf"
    write_model(str(path), "deep", "f32", seed=91, arch="gemma3")
    return str(path)


@pytest.fixture(scope="module")
def g3_model(g3_path):
    return load_model(g3_path)


def test_gemma3_config_switches(g3_model):
    cfg = g3_model.config
    assert cfg.architecture == "gemma3"
    assert cfg.act == "gelu_tanh" and cfg.norm_bias == 1.0
    assert cfg.embed_scale == pytest.approx(cfg.hidden_size ** 0.5)
    assert cfg.post_norms and cfg.qk_norm
    assert cfg.attn_softcap == 0.0 and cfg.final_softcap == 0.0  # no caps
    assert cfg.sliding_window == 16 and cfg.swa_pattern == 6
    assert cfg.rope_local_theta == 1000.0
    assert g3_model.weights.lm_head is g3_model.weights.embed  # tied
    assert g3_model.weights.rope_cos.ndim == 3  # [2, S, d2] dual tables


def _numpy_reference(path: str, tokens: np.ndarray) -> np.ndarray:
    """Independent f32 numpy gemma-3 forward: embed*sqrt(H) → [RMSNorm(1+w)
    → qkv → per-head q/k RMSNorm(1+w) → rope (per-layer base) → causal GQA
    (local layers: sliding window) → o-proj → post-norm(1+w) → residual →
    RMSNorm(1+w) → gelu_tanh(gate)*up → down → post-norm(1+w) → residual]
    × L → final norm(1+w) → tied head."""
    r = GGUFReader(path)
    md = r.metadata

    def t(name):
        info = r.info(name)
        return (np.frombuffer(bytes(r.raw_bytes(name)), np.float32)
                .reshape(info.shape))

    H = int(md["gemma3.embedding_length"])
    L = int(md["gemma3.block_count"])
    nh = int(md["gemma3.attention.head_count"])
    nkv = int(md["gemma3.attention.head_count_kv"])
    D = H // nh
    theta_g = float(md["gemma3.rope.freq_base"])
    theta_l = float(md["gemma3.rope.local_freq_base"])
    eps = float(md["gemma3.attention.layer_norm_rms_epsilon"])
    window = int(md["gemma3.attention.sliding_window"])
    T = len(tokens)

    def rms(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * (1 + w)

    def rope(x, theta):
        d2 = D // 2
        inv = theta ** (-np.arange(d2) / d2)
        ang = np.arange(T)[:, None] * inv[None, :]
        c, s = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
        x0, x1 = x[..., :d2], x[..., d2:]
        return np.concatenate([x0 * c - x1 * s, x0 * s + x1 * c], -1)

    def gelu_tanh(g):
        return 0.5 * g * (1 + np.tanh(np.sqrt(2 / np.pi)
                                      * (g + 0.044715 * g ** 3)))

    embed = t("token_embd.weight")
    x = embed[tokens] * np.sqrt(H)
    qp, kp = np.arange(T)[:, None], np.arange(T)[None, :]
    causal = kp <= qp
    local_mask = causal & (kp > qp - window)
    for i in range(L):
        pre = f"blk.{i}."
        is_local = (i % 6) < 5
        mask = local_mask if is_local else causal
        theta = theta_l if is_local else theta_g
        h = rms(x, t(pre + "attn_norm.weight"))
        q = (h @ t(pre + "attn_q.weight").T).reshape(T, nh, D)
        k = (h @ t(pre + "attn_k.weight").T).reshape(T, nkv, D)
        v = (h @ t(pre + "attn_v.weight").T).reshape(T, nkv, D)
        q = rope(rms(q, t(pre + "attn_q_norm.weight")), theta)
        k = rope(rms(k, t(pre + "attn_k_norm.weight")), theta)
        att = np.zeros((T, nh, D), np.float32)
        group = nh // nkv
        for hh in range(nh):
            sc = (q[:, hh] @ k[:, hh // group].T) / np.sqrt(D)
            sc = np.where(mask, sc, -1e30)
            p = np.exp(sc - sc.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            att[:, hh] = p @ v[:, hh // group]
        o = att.reshape(T, H) @ t(pre + "attn_output.weight").T
        x = x + rms(o, t(pre + "post_attention_norm.weight"))
        h = rms(x, t(pre + "ffn_norm.weight"))
        g = h @ t(pre + "ffn_gate.weight").T
        u = h @ t(pre + "ffn_up.weight").T
        dn = (gelu_tanh(g) * u) @ t(pre + "ffn_down.weight").T
        x = x + rms(dn, t(pre + "post_ffw_norm.weight"))
    x = rms(x, t("output_norm.weight"))
    logits = x @ embed.T
    r.close()
    return logits


def test_gemma3_matches_numpy_oracle(g3_path, g3_model):
    """24 tokens > the 16-key window; 7 layers include one GLOBAL layer
    (l=5), so a wrong pattern, a single rope table, or a missing q/k norm
    all fail."""
    import jax.numpy as jnp
    rng = np.random.default_rng(12)
    tokens = rng.integers(3, 200, size=24).astype(np.int32)
    ref = _numpy_reference(g3_path, tokens)
    kv = KVCache.create(g3_model.arch)
    logits, _, _ = forward(g3_model.arch, g3_model.weights, kv,
                           jnp.asarray(tokens), 0, all_logits=True)
    got = np.asarray(logits, np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0.12,
                               atol=0.12 * float(np.abs(ref).max()))
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.8


def test_gemma3_dual_rope_changes_output(g3_model):
    """Collapsing both tables to the global base changes the logits — the
    oracle-matched run genuinely selected per-layer bases."""
    import dataclasses
    import jax.numpy as jnp
    rng = np.random.default_rng(13)
    tokens = jnp.asarray(rng.integers(3, 200, size=12), jnp.int32)
    m = g3_model
    la, _, _ = forward(m.arch, m.weights, KVCache.create(m.arch), tokens, 0)
    wg = dataclasses.replace(
        m.weights,
        rope_cos=jnp.stack([m.weights.rope_cos[0], m.weights.rope_cos[0]]),
        rope_sin=jnp.stack([m.weights.rope_sin[0], m.weights.rope_sin[0]]))
    lb, _, _ = forward(m.arch, wg, KVCache.create(m.arch), tokens, 0)
    assert not np.allclose(np.asarray(la), np.asarray(lb), atol=1e-3)


def test_gemma3_decode_matches_prefill(g3_model):
    """Token-by-token decode agrees with whole-prompt prefill across the
    window boundary and the dual rope tables."""
    import jax.numpy as jnp
    arch = g3_model.arch
    rng = np.random.default_rng(14)
    toks = rng.integers(3, 200, size=20).astype(np.int32)
    full, _, _ = forward(arch, g3_model.weights, KVCache.create(arch),
                         jnp.asarray(toks), 0, all_logits=True)
    kv = KVCache.create(arch)
    step_logits = []
    for i, tk in enumerate(toks):
        lg, kv, _ = forward(arch, g3_model.weights, kv,
                            jnp.asarray([tk], jnp.int32), i)
        step_logits.append(np.asarray(lg)[0])
    np.testing.assert_allclose(np.stack(step_logits), np.asarray(full),
                               rtol=2e-2, atol=2e-2)


def test_gemma3_engine_generates(tmp_path_factory):
    from ntransformer_tpu.inference.engine import Engine, GenerateConfig
    path = str(tmp_path_factory.mktemp("models") / "gemma3_q8.gguf")
    write_model(path, "deep", "q8_0", seed=92, arch="gemma3")
    eng = Engine(load_model(path))
    cfg = GenerateConfig(max_tokens=6, temperature=0.0, repeat_penalty=1.0)
    t1, s1 = eng.generate("hello world", cfg)
    t2, _ = eng.generate("hello world", cfg)
    assert t1 == t2 and s1.decode_tokens > 0


def test_gemma3_tp_matches_single_device(g3_path):
    """2-way TP parity: q/k norms replicate, dual rope tables replicate,
    post norms see the full post-psum output."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from ntransformer_tpu.parallel.tp import (TP_AXIS, make_tp_forward,
                                              shard_model)
    m = load_model(g3_path)
    mesh = Mesh(np.array(jax.devices()[:2]), (TP_AXIS,))
    rng = np.random.default_rng(15)
    tokens = jnp.asarray(rng.integers(3, 200, size=24), jnp.int32)
    ref, _, _ = forward(m.arch, m.weights, KVCache.create(m.arch), tokens, 0)
    w_sh, kv_sh = shard_model(m.weights, KVCache.create(m.arch), mesh,
                              m.arch)
    fwd = make_tp_forward(mesh, m.arch, weights_template=m.weights)
    lt, _, _ = fwd(w_sh, kv_sh, tokens, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(lt), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_gemma3_batched_server_matches_engine(tmp_path_factory):
    """The batched serving path carries gemma3's q/k norms, dual rope
    bases, post norms and the 5:1 window: server greedy == Engine greedy
    on a prompt longer than the window."""
    from ntransformer_tpu.inference.engine import Engine, GenerateConfig
    from ntransformer_tpu.inference.sampler import SamplerConfig
    from ntransformer_tpu.inference.serve import BatchServer, Request
    path = str(tmp_path_factory.mktemp("models") / "gemma3_q8s.gguf")
    write_model(path, "deep", "q8_0", seed=93, arch="gemma3")
    m = load_model(path)
    prompt_ids = list(range(5, 29))  # 24 tokens > the 16-key window
    cfg = GenerateConfig(max_tokens=6, temperature=0.0, repeat_penalty=1.0)
    want, _ = Engine(m).generate("", cfg, prompt_ids=prompt_ids)
    srv = BatchServer(m, batch_size=2,
                      sampler_cfg=SamplerConfig(temperature=0.0))
    r = Request(prompt="", max_tokens=6, prompt_ids=list(prompt_ids))
    srv.run([r])
    assert r.text == want


def test_gemma3_batched_kernel_matches_jnp(g3_model):
    """Kernel-path (interpret) vs jnp-path parity for the gemma3 batched
    step: dual rope select + window + qk/post norms in the scan body."""
    import jax.numpy as jnp
    from ntransformer_tpu.models.batched import (BatchedKV,
                                                 batched_decode_step)
    arch = g3_model.arch
    B = 2
    rng = np.random.default_rng(19)
    pos = jnp.asarray([22, 7], jnp.int32)
    toks = jnp.asarray(rng.integers(3, 200, size=B), jnp.int32)
    active = jnp.ones(B, bool)
    shape = (arch.n_layers, B, arch.n_kv_heads, arch.max_seq_len,
             arch.head_dim)

    def mk_bkv(seed):
        r = np.random.default_rng(seed)
        return BatchedKV(
            jnp.asarray(r.standard_normal(shape) * 0.3, jnp.bfloat16),
            jnp.asarray(r.standard_normal(shape) * 0.3, jnp.bfloat16))

    la, _ = batched_decode_step(arch, g3_model.weights, mk_bkv(23), toks,
                                pos, active, impl="kernel",
                                kv_append="dus")
    lb, _ = batched_decode_step(arch, g3_model.weights, mk_bkv(23), toks,
                                pos, active, impl="jnp")
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=2e-2, atol=2e-2)
