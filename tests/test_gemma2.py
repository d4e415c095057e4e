"""Gemma-2 family support (beyond the llama-only reference, config.h:13).

Gemma-2 deltas vs gemma-1, all driven by `general.architecture=gemma2`
metadata (llama.cpp build_gemma2 graph): post-attention and post-FFN block
norms applied BEFORE each residual add, attention-score softcapping
(50*tanh(s/50)), final-logit softcapping (30*tanh(l/30)), and alternating
sliding-window attention — EVEN layers see only the last `sliding_window`
keys, odd layers stay global. The window is a dynamic operand of the flash
kernel (one compiled body serves both parities of the layer scan).

The numpy oracle below is written independently of the model code; the
synthetic file's post norms carry RANDOM weights so a missing/misplaced
(1+w) shows up as a real mismatch.
"""
import numpy as np
import pytest

from tools.make_test_gguf import write_model
from ntransformer_tpu.core.gguf import GGUFReader
from ntransformer_tpu.models.llama import KVCache, forward
from ntransformer_tpu.models.loader import load_model


@pytest.fixture(scope="module")
def g2_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "gemma2_f32.gguf"
    write_model(str(path), "tiny", "f32", seed=71, arch="gemma2")
    return str(path)


@pytest.fixture(scope="module")
def g2_model(g2_path):
    return load_model(g2_path)


def test_gemma2_config_switches(g2_model):
    cfg = g2_model.config
    assert cfg.architecture == "gemma2"
    assert cfg.act == "gelu_tanh"
    assert cfg.norm_bias == 1.0
    assert cfg.embed_scale == pytest.approx(cfg.hidden_size ** 0.5)
    assert cfg.post_norms
    assert cfg.attn_softcap == 50.0 and cfg.final_softcap == 30.0
    assert cfg.sliding_window == 16 and cfg.swa_pattern == 2
    assert g2_model.weights.lm_head is g2_model.weights.embed  # tied
    assert g2_model.weights.layers.attn_post_norm is not None
    assert g2_model.weights.layers.ffn_post_norm is not None


def _numpy_reference(path: str, tokens: np.ndarray) -> np.ndarray:
    """Independent f32 numpy gemma-2 forward: embed*sqrt(H) → [RMSNorm(1+w)
    → qkv → half rope → softcapped causal GQA (even layers: sliding
    window) → o-proj → post-norm(1+w) → residual → RMSNorm(1+w) →
    gelu_tanh(gate)*up → down → post-norm(1+w) → residual] × L → final
    norm(1+w) → tied head → 30*tanh(l/30)."""
    r = GGUFReader(path)
    md = r.metadata

    def t(name):
        info = r.info(name)
        return (np.frombuffer(bytes(r.raw_bytes(name)), np.float32)
                .reshape(info.shape))

    H = int(md["gemma2.embedding_length"])
    L = int(md["gemma2.block_count"])
    nh = int(md["gemma2.attention.head_count"])
    nkv = int(md["gemma2.attention.head_count_kv"])
    D = H // nh
    theta = float(md["gemma2.rope.freq_base"])
    eps = float(md["gemma2.attention.layer_norm_rms_epsilon"])
    window = int(md["gemma2.attention.sliding_window"])
    attn_cap = float(md["gemma2.attn_logit_softcapping"])
    final_cap = float(md["gemma2.final_logit_softcapping"])
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
    qp, kp = np.arange(T)[:, None], np.arange(T)[None, :]
    causal = kp <= qp
    local = causal & (kp > qp - window)
    for i in range(L):
        pre = f"blk.{i}."
        mask = local if i % 2 == 0 else causal  # even layers sliding
        h = rms(x, t(pre + "attn_norm.weight"))
        q = rope((h @ t(pre + "attn_q.weight").T).reshape(T, nh, D))
        k = rope((h @ t(pre + "attn_k.weight").T).reshape(T, nkv, D))
        v = (h @ t(pre + "attn_v.weight").T).reshape(T, nkv, D)
        att = np.zeros((T, nh, D), np.float32)
        group = nh // nkv
        for hh in range(nh):
            sc = (q[:, hh] @ k[:, hh // group].T) / np.sqrt(D)
            sc = attn_cap * np.tanh(sc / attn_cap)
            sc = np.where(mask, sc, -1e30)
            pr = np.exp(sc - sc.max(-1, keepdims=True))
            pr /= pr.sum(-1, keepdims=True)
            att[:, hh] = pr @ v[:, hh // group]
        o = att.reshape(T, H) @ t(pre + "attn_output.weight").T
        x = x + rms(o, t(pre + "post_attention_norm.weight"))
        h = rms(x, t(pre + "ffn_norm.weight"))
        g = h @ t(pre + "ffn_gate.weight").T
        u = h @ t(pre + "ffn_up.weight").T
        dn = (gelu_tanh(g) * u) @ t(pre + "ffn_down.weight").T
        x = x + rms(dn, t(pre + "post_ffw_norm.weight"))
    x = rms(x, t("output_norm.weight"))
    logits = x @ embed.T                                # tied head
    logits = final_cap * np.tanh(logits / final_cap)
    r.close()
    return logits


def test_gemma2_matches_numpy_oracle(g2_path, g2_model):
    """24 tokens > the 16-key window, so the even layers' sliding mask
    actually bites; a global-everything or local-everything bug fails."""
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    tokens = rng.integers(3, 200, size=24).astype(np.int32)
    ref = _numpy_reference(g2_path, tokens)
    kv = KVCache.create(g2_model.arch)
    logits, _, _ = forward(g2_model.arch, g2_model.weights, kv,
                           jnp.asarray(tokens), 0, all_logits=True)
    got = np.asarray(logits, np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0.12,
                               atol=0.12 * float(np.abs(ref).max()))
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.8


def test_gemma2_window_changes_output(g2_model):
    """Sanity: forcing every layer global changes the logits (i.e. the
    window masked something in the oracle-matched run)."""
    import dataclasses
    import jax.numpy as jnp
    rng = np.random.default_rng(6)
    tokens = jnp.asarray(rng.integers(3, 200, size=24), jnp.int32)
    arch = g2_model.arch
    l1, _, _ = forward(arch, g2_model.weights, KVCache.create(arch),
                       tokens, 0, all_logits=True)
    arch_g = dataclasses.replace(arch, swa_pattern=0, sliding_window=0)
    l2, _, _ = forward(arch_g, g2_model.weights, KVCache.create(arch_g),
                       tokens, 0, all_logits=True)
    assert not np.allclose(np.asarray(l1), np.asarray(l2), atol=1e-3)


def test_gemma2_decode_matches_prefill(g2_model):
    """Token-by-token decode (window crossing the cache as pos grows) must
    agree with one whole-prompt prefill at every position."""
    import jax.numpy as jnp
    arch = g2_model.arch
    rng = np.random.default_rng(7)
    toks = rng.integers(3, 200, size=20).astype(np.int32)
    full, _, _ = forward(arch, g2_model.weights, KVCache.create(arch),
                         jnp.asarray(toks), 0, all_logits=True)
    kv = KVCache.create(arch)
    step_logits = []
    for i, tk in enumerate(toks):
        lg, kv, _ = forward(arch, g2_model.weights, kv,
                            jnp.asarray([tk], jnp.int32), i)
        step_logits.append(np.asarray(lg)[0])
    np.testing.assert_allclose(np.stack(step_logits), np.asarray(full),
                               rtol=2e-2, atol=2e-2)


def test_gemma2_engine_generates(tmp_path_factory):
    """End-to-end q8_0 gemma2 through Engine.generate (quantized kernels +
    the full switch set on the real inference path)."""
    from ntransformer_tpu.inference.engine import Engine, GenerateConfig
    path = str(tmp_path_factory.mktemp("models") / "gemma2_q8.gguf")
    write_model(path, "tiny", "q8_0", seed=72, arch="gemma2")
    eng = Engine(load_model(path))
    cfg = GenerateConfig(max_tokens=6, temperature=0.0, repeat_penalty=1.0)
    t1, s1 = eng.generate("hello world", cfg)
    t2, s2 = eng.generate("hello world", cfg)
    assert t1 == t2 and s1.decode_tokens > 0


def test_gemma2_tiered_loads(tmp_path_factory):
    """r5: SWA models stream — the per-layer step carries the absolute
    layer index (llama.layer_step abs_layer), so the r4 refusal is gone.
    Full tiered-vs-resident parity lives in tests/test_tiered.py."""
    from ntransformer_tpu.models.tiered import load_model_tiered
    path = str(tmp_path_factory.mktemp("models") / "gemma2_q8b.gguf")
    write_model(path, "tiny", "q8_0", seed=73, arch="gemma2")
    tm = load_model_tiered(path, max_hbm_layers=2, max_ram_layers=2,
                           hbm_bytes=8 << 30, ram_bytes=16 << 30)
    assert tm.arch.swa_pattern and tm.tiers.n_streamed > 0


def test_gemma2_batched_server_matches_engine(tmp_path_factory):
    """The batched serving path carries softcaps, post norms and the
    sliding window: server greedy output == Engine greedy output on a
    prompt longer than the window (decode positions cross it too)."""
    from ntransformer_tpu.inference.engine import Engine, GenerateConfig
    from ntransformer_tpu.inference.sampler import SamplerConfig
    from ntransformer_tpu.inference.serve import BatchServer, Request
    path = str(tmp_path_factory.mktemp("models") / "gemma2_q8s.gguf")
    write_model(path, "tiny", "q8_0", seed=74, arch="gemma2")
    m = load_model(path)
    prompt_ids = list(range(5, 29))  # 24 tokens > the 16-key window
    cfg = GenerateConfig(max_tokens=6, temperature=0.0, repeat_penalty=1.0)
    want, _ = Engine(m).generate("", cfg, prompt_ids=prompt_ids)
    srv = BatchServer(m, batch_size=2,
                      sampler_cfg=SamplerConfig(temperature=0.0))
    r = Request(prompt="", max_tokens=6, prompt_ids=list(prompt_ids))
    srv.run([r])
    assert r.text == want


@pytest.mark.parametrize("quant", [False, True])
def test_gemma2_batched_kernel_matches_jnp(g2_model, quant):
    """The batched flash-decode KERNEL path (interpret mode) reproduces
    the jnp path under softcap + alternating window — the window rides
    the scalar-prefetch row and the int8 scale fold precedes the tanh."""
    import jax.numpy as jnp
    from ntransformer_tpu.models.batched import (BatchedKV,
                                                 batched_decode_step)
    arch = g2_model.arch
    B = 2
    rng = np.random.default_rng(17)
    # pre-populate caches by running some steps first (positions > window)
    pos = jnp.asarray([20, 9], jnp.int32)
    toks = jnp.asarray(rng.integers(3, 200, size=B), jnp.int32)
    active = jnp.ones(B, bool)
    shape = (arch.n_layers, B, arch.n_kv_heads, arch.max_seq_len,
             arch.head_dim)

    def mk_bkv():
        ks = jnp.asarray(rng.standard_normal(shape) * 0.3)
        vs = jnp.asarray(rng.standard_normal(shape) * 0.3)
        if quant:
            def qz(x):
                s = jnp.abs(x).max(-1, keepdims=True) / 127.0 + 1e-9
                # batched scale buffers are S-minor [L, B, Hkv, S]
                return (jnp.round(x / s).astype(jnp.int8),
                        s.reshape(s.shape[:-1]))
            kq, ksc = qz(ks)
            vq, vsc = qz(vs)
            return BatchedKV(kq, vq, ksc, vsc)
        return BatchedKV(ks.astype(jnp.bfloat16), vs.astype(jnp.bfloat16))

    rng = np.random.default_rng(17)
    bkv_a = mk_bkv()
    rng = np.random.default_rng(17)  # identical contents, fresh buffers
    bkv_b = mk_bkv()
    la, _ = batched_decode_step(arch, g2_model.weights, bkv_a, toks, pos,
                                active, impl="kernel", kv_append="dus")
    lb, _ = batched_decode_step(arch, g2_model.weights, bkv_b, toks, pos,
                                active, impl="jnp")
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=2e-2, atol=2e-2)


def test_gemma2_tp_matches_single_device(g2_path):
    """2-way TP on the CPU mesh reproduces the single-device gemma2
    forward: post norms are applied to the full post-psum block output,
    and the SWA/softcap switches ride the sharded layer_step. Uses more
    tokens than the window so local layers actually mask."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from ntransformer_tpu.parallel.tp import (TP_AXIS, make_tp_forward,
                                              shard_model)
    model = load_model(g2_path)
    if model.arch.n_kv_heads % 2:
        pytest.skip("tiny model kv heads not divisible by 2")
    mesh = Mesh(np.array(jax.devices()[:2]), (TP_AXIS,))
    rng = np.random.default_rng(8)
    tokens = jnp.asarray(rng.integers(3, 200, size=24), jnp.int32)

    ref_logits, _, _ = forward(model.arch, model.weights,
                               KVCache.create(model.arch), tokens, 0)
    w_sh, kv_sh = shard_model(model.weights, KVCache.create(model.arch),
                              mesh, model.arch)
    tp_fwd = make_tp_forward(mesh, model.arch, weights_template=model.weights)
    logits, _, _ = tp_fwd(w_sh, kv_sh, tokens, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=2e-2, atol=2e-2)
