"""Mixture-of-experts support (mixtral-style: llama arch + expert tensors;
qwen3moe) — beyond the llama-only, dense-only reference (config.h:13).

Routing: softmax over all router logits → top-k → renormalize (equal to
mixtral's softmax-after-top-k and qwen3moe's norm_topk_prob). Compute is
keyed on the static T: decode (T=1) runs ONLY the k selected experts
through the flattened stacked-plane select (k experts' bytes from HBM);
prefill runs a static dense loop over all experts with per-token weights
(MXU-dense, no ragged gathers). The decode↔prefill parity test below is
the critical check that both strategies implement the same math.

Expert parallelism (parallel/ep.py): expert planes shard on their E axis,
one psum per MoE layer; parity-tested on a CPU mesh.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tools.make_test_gguf import write_model
from ntransformer_tpu.core.gguf import GGUFReader
from ntransformer_tpu.models.config import ModelConfig
from ntransformer_tpu.models.llama import KVCache, forward
from ntransformer_tpu.models.loader import load_model


@pytest.fixture(scope="module")
def moe_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "moe_f32.gguf"
    write_model(str(path), "moe", "f32", seed=121)
    return str(path)


@pytest.fixture(scope="module")
def moe_model(moe_path):
    return load_model(moe_path)


@pytest.fixture(scope="module")
def moe_q8_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "moe_q8.gguf"
    write_model(str(path), "moe", "q8_0", seed=122)
    return str(path)


def test_moe_config_and_load(moe_model):
    cfg, lw = moe_model.config, moe_model.weights.layers
    assert cfg.n_experts == 4 and cfg.n_experts_used == 2
    assert cfg.moe_inter == 192
    assert lw.w_gate is None and lw.w_down is None  # pure-MoE layers
    assert lw.ffn_gate_inp is not None
    # stacked planes carry [L, E, rows, N]
    first = next(iter(lw.w_gate_exps.planes.values()))
    assert first.shape[:2] == (cfg.n_layers, cfg.n_experts)


def test_qwen3moe_config_parses():
    cfg = ModelConfig.from_gguf_metadata({
        "general.architecture": "qwen3moe",
        "qwen3moe.expert_count": 128,
        "qwen3moe.expert_used_count": 8,
        "qwen3moe.expert_feed_forward_length": 768,
    })
    assert cfg.qk_norm and cfg.n_experts == 128
    assert cfg.n_experts_used == 8 and cfg.moe_inter == 768


def _numpy_reference(path: str, tokens: np.ndarray) -> np.ndarray:
    """Independent f32 numpy MoE forward: standard llama attention block;
    FFN = softmax(router) → top-2 → renormalize → weighted sum of the
    selected experts' silu FFNs."""
    r = GGUFReader(path)
    md = r.metadata

    def t(name):
        info = r.info(name)
        return (np.frombuffer(bytes(r.raw_bytes(name)), np.float32)
                .reshape(info.shape))

    H = int(md["llama.embedding_length"])
    L = int(md["llama.block_count"])
    nh = int(md["llama.attention.head_count"])
    nkv = int(md["llama.attention.head_count_kv"])
    E = int(md["llama.expert_count"])
    K = int(md["llama.expert_used_count"])
    D = H // nh
    theta = float(md["llama.rope.freq_base"])
    eps = float(md["llama.attention.layer_norm_rms_epsilon"])
    T = len(tokens)

    def rms(x, w):
        return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w

    def rope(x):
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
        q = rope((h @ t(pre + "attn_q.weight").T).reshape(T, nh, D))
        k = rope((h @ t(pre + "attn_k.weight").T).reshape(T, nkv, D))
        v = (h @ t(pre + "attn_v.weight").T).reshape(T, nkv, D)
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
        router = h @ t(pre + "ffn_gate_inp.weight").T          # [T, E]
        probs = np.exp(router - router.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        ge = t(pre + "ffn_gate_exps.weight")                   # [E, I, H]
        ue = t(pre + "ffn_up_exps.weight")
        de = t(pre + "ffn_down_exps.weight")                   # [E, H, I]
        out = np.zeros((T, H), np.float32)
        for tt in range(T):
            top = np.argsort(-probs[tt])[:K]
            w = probs[tt, top] / probs[tt, top].sum()
            for j, e in enumerate(top):
                g = h[tt] @ ge[e].T
                u = h[tt] @ ue[e].T
                out[tt] += w[j] * ((g / (1 + np.exp(-g)) * u) @ de[e].T)
        x = x + out
    x = rms(x, t("output_norm.weight"))
    logits = x @ t("output.weight").T
    r.close()
    return logits


def test_moe_matches_numpy_oracle(moe_path, moe_model):
    tokens = np.array([3, 17, 5, 42, 9, 11, 7, 30], np.int32)
    ref = _numpy_reference(moe_path, tokens)
    kv = KVCache.create(moe_model.arch)
    logits, _, _ = forward(moe_model.arch, moe_model.weights, kv,
                           jnp.asarray(tokens), 0, all_logits=True)
    got = np.asarray(logits, np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0.08, atol=0.08)
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.85


def test_moe_decode_matches_prefill(moe_model):
    """THE MoE parity check: the decode path (T=1: only the k selected
    experts run, via traced flattened index) must agree with the prefill
    path (dense masked loop over all experts) at every position."""
    arch = moe_model.arch
    rng = np.random.default_rng(31)
    toks = rng.integers(3, 200, size=12).astype(np.int32)
    full, _, _ = forward(arch, moe_model.weights, KVCache.create(arch),
                         jnp.asarray(toks), 0, all_logits=True)
    kv = KVCache.create(arch)
    step_logits = []
    for i, tk in enumerate(toks):
        lg, kv, _ = forward(arch, moe_model.weights, kv,
                            jnp.asarray([tk], jnp.int32), i)
        step_logits.append(np.asarray(lg)[0])
    np.testing.assert_allclose(np.stack(step_logits), np.asarray(full),
                               rtol=2e-2, atol=2e-2)


def test_moe_engine_generates(moe_q8_path):
    """End-to-end q8_0 MoE through Engine.generate (quantized expert
    planes through the flattened stacked select)."""
    from ntransformer_tpu.inference.engine import Engine, GenerateConfig
    eng = Engine(load_model(moe_q8_path))
    cfg = GenerateConfig(max_tokens=6, temperature=0.0, repeat_penalty=1.0)
    t1, s1 = eng.generate("hello world", cfg)
    t2, _ = eng.generate("hello world", cfg)
    assert t1 == t2 and s1.decode_tokens > 0


def test_moe_routing_is_selective(moe_model):
    """Zeroing a NON-selected expert's weights must not change the output
    for a token routed elsewhere — i.e. the top-k selection is real."""
    arch = moe_model.arch
    tokens = jnp.asarray([5], jnp.int32)
    lw = moe_model.weights.layers
    # find which experts token 5 uses at layer 0 by zeroing each in turn
    base, _, _ = forward(arch, moe_model.weights, KVCache.create(arch),
                         tokens, 0)
    changed = []
    for e in range(arch.n_experts):
        def zero_e(ql, e=e):
            planes = {nm: a.at[:, e].set(0) for nm, a in ql.planes.items()}
            from ntransformer_tpu.ops.linear import QLinear
            return QLinear(ql.dtype, ql.k, ql.n, planes)
        w2 = dataclasses.replace(
            moe_model.weights, layers=dataclasses.replace(
                lw, w_down_exps=zero_e(lw.w_down_exps)))
        lg, _, _ = forward(arch, w2, KVCache.create(arch), tokens, 0)
        changed.append(not np.allclose(np.asarray(lg), np.asarray(base),
                                       atol=1e-5))
    # some experts matter, some don't (k=2 of 4 per layer; 3 layers can
    # select different experts, but at least one must be unused somewhere)
    assert any(changed) and not all(changed)


def test_moe_ep_matches_single_device(moe_q8_path):
    """2-way expert parallelism on the CPU mesh reproduces the
    single-device logits — prefill (dense local loop + psum) AND decode
    (masked k-select + psum)."""
    from ntransformer_tpu.parallel.ep import (EP_AXIS, make_ep_forward,
                                              shard_model_ep)
    from jax.sharding import Mesh
    m = load_model(moe_q8_path, device=False)
    mesh = Mesh(np.array(jax.devices("cpu")[:2]), (EP_AXIS,))
    w_sh, kv_sh = shard_model_ep(m.weights, KVCache.create(m.arch), mesh,
                                 m.arch)
    fwd = make_ep_forward(mesh, m.arch, weights_template=m.weights)

    m1 = load_model(moe_q8_path)
    tokens = jnp.asarray([3, 7, 12, 9], jnp.int32)
    ref, kv_ref, _ = forward(m1.arch, m1.weights, KVCache.create(m1.arch),
                             tokens, 0)
    lt, kv_sh, _ = fwd(w_sh, kv_sh, tokens, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(lt), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    # one decode step on top
    ref2, _, _ = forward(m1.arch, m1.weights, kv_ref,
                         jnp.asarray([5], jnp.int32), 4)
    lt2, _, _ = fwd(w_sh, kv_sh, jnp.asarray([5], jnp.int32), jnp.int32(4))
    np.testing.assert_allclose(np.asarray(lt2), np.asarray(ref2),
                               rtol=2e-2, atol=2e-2)


def test_moe_refused_on_unsupported_paths(moe_q8_path):
    # r5: MoE now STREAMS via the (layer, expert) scheduler — the tiered
    # load routes to tiered_moe (full coverage in tests/test_tiered_moe.py);
    # only requant/TP-mesh composition still refuses
    from ntransformer_tpu.core.dtypes import DType
    from ntransformer_tpu.models.tiered import load_model_tiered
    from ntransformer_tpu.models.tiered_moe import TieredMoEModel
    tm = load_model_tiered(moe_q8_path, max_hbm_layers=1, max_ram_layers=1,
                           hbm_bytes=8 << 30, ram_bytes=16 << 30)
    assert isinstance(tm, TieredMoEModel)
    tm.estreamer.close()
    with pytest.raises(NotImplementedError, match="requant"):
        load_model_tiered(moe_q8_path, requant=DType.Q4_K)

    from jax.sharding import Mesh
    from ntransformer_tpu.parallel.tp import TP_AXIS, shard_model
    m = load_model(moe_q8_path)
    mesh = Mesh(np.array(jax.devices("cpu")[:2]), (TP_AXIS,))
    with pytest.raises(NotImplementedError, match="ep"):
        shard_model(m.weights, KVCache.create(m.arch), mesh, m.arch)


def test_moe_batched_server_matches_engine(moe_q8_path):
    """The continuous-batching server serves MoE: two concurrent routed
    requests, greedy outputs equal to Engine.generate."""
    from ntransformer_tpu.inference.engine import Engine, GenerateConfig
    from ntransformer_tpu.inference.sampler import SamplerConfig
    from ntransformer_tpu.inference.serve import BatchServer, Request
    m = load_model(moe_q8_path)
    cfg = GenerateConfig(max_tokens=6, temperature=0.0, repeat_penalty=1.0)
    eng = Engine(m)
    want1, _ = eng.generate("hello world", cfg)
    want2, _ = eng.generate("the capital of france", cfg)
    srv = BatchServer(m, batch_size=2,
                      sampler_cfg=SamplerConfig(temperature=0.0))
    r1 = Request(prompt="hello world", max_tokens=6)
    r2 = Request(prompt="the capital of france", max_tokens=6)
    srv.run([r1, r2])
    assert r1.text == want1 and r2.text == want2


def test_moe_batched_kernel_matches_jnp(moe_model):
    """Kernel-path (interpret) vs jnp-path parity for the MoE batched
    step: the routed dense expert loop sits in the shared FFN tail."""
    from ntransformer_tpu.models.batched import (BatchedKV,
                                                 batched_decode_step)
    arch = moe_model.arch
    B = 3
    rng = np.random.default_rng(41)
    pos = jnp.asarray([4, 0, 11], jnp.int32)
    toks = jnp.asarray(rng.integers(3, 200, size=B), jnp.int32)
    active = jnp.asarray([True, True, False])
    la, _ = batched_decode_step(arch, moe_model.weights,
                                BatchedKV.create(arch, B), toks, pos,
                                active, impl="kernel", kv_append="dus")
    lb, _ = batched_decode_step(arch, moe_model.weights,
                                BatchedKV.create(arch, B), toks, pos,
                                active, impl="jnp")
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=2e-2, atol=2e-2)


def test_qwen3moe_end_to_end(tmp_path_factory):
    """qwen3moe = qwen3's q/k norms + the routed FFN, through
    Engine.generate (q8_0 expert planes)."""
    from ntransformer_tpu.inference.engine import Engine, GenerateConfig
    path = str(tmp_path_factory.mktemp("models") / "q3moe_q8.gguf")
    write_model(path, "moe", "q8_0", seed=123, arch="qwen3moe")
    m = load_model(path)
    assert m.config.qk_norm and m.config.n_experts == 4
    assert m.weights.layers.q_norm is not None
    eng = Engine(m)
    cfg = GenerateConfig(max_tokens=6, temperature=0.0, repeat_penalty=1.0)
    t1, s1 = eng.generate("hello world", cfg)
    t2, _ = eng.generate("hello world", cfg)
    assert t1 == t2 and s1.decode_tokens > 0


def test_ep_engine_generate_matches_resident(moe_q8_path):
    """EPEngine (2-way expert parallelism on the CPU mesh) reproduces the
    single-chip Engine's greedy output through the full generate path
    (chunked prefill + decode), and the CLI reaches it via --ep."""
    from ntransformer_tpu.inference.engine import (Engine, EPEngine,
                                                   GenerateConfig)
    cfg = GenerateConfig(max_tokens=6, temperature=0.0, repeat_penalty=1.0)
    want, _ = Engine(load_model(moe_q8_path)).generate("hello world", cfg)
    eng = EPEngine.load(moe_q8_path, ep=2)
    got, stats = eng.generate("hello world", cfg)
    assert got == want and stats.decode_tokens > 0


def test_ep_cli_flag_combinations(moe_q8_path, tmp_path):
    """--ep: dead-flag refusals (×tp/×cp/×draft) and a live generate."""
    from ntransformer_tpu.cli import main
    assert main(["-m", moe_q8_path, "--ep", "2", "--tp", "2",
                 "-p", "x"]) == 2
    assert main(["-m", moe_q8_path, "--ep", "2", "--cp", "2",
                 "-p", "x"]) == 2
    assert main(["-m", moe_q8_path, "--ep", "2", "--draft-model",
                 moe_q8_path, "-p", "x"]) == 2
    assert main(["-m", moe_q8_path, "--ep", "2", "-p", "hello", "-n", "3",
                 "-t", "0"]) == 0


def test_ep_engine_refuses_dense_model(tmp_path):
    from ntransformer_tpu.inference.engine import EPEngine
    path = str(tmp_path / "dense.gguf")
    write_model(path, "tiny", "q8_0", seed=1)
    with pytest.raises(AssertionError, match="mixture-of-experts"):
        EPEngine.load(path, ep=2)
