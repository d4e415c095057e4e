"""Tiered MoE: routed (layer, expert) streaming (r4 verdict item 5).

The r4 cost model (experiments/moe_tiered_cost.py) measured temporal
prefetch at 0.94 hit rate and priced routed streaming ~1.9x cheaper per
byte than dense layers; this is the scheduler it designed. Parity target:
the resident MoE forward (models/llama.py moe_ffn), bit-close.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from ntransformer_tpu.models.llama import KVCache, forward
from ntransformer_tpu.models.loader import load_model
from ntransformer_tpu.models.tiered import load_model_tiered
from ntransformer_tpu.models.tiered_moe import (TieredMoEModel,
                                                forward_tiered_moe)
from tools.make_test_gguf import write_model

GB = 1 << 30


@pytest.fixture(scope="module")
def moe_gguf(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "moe_q8.gguf"
    write_model(str(path), "moe", "q8_0", seed=21)
    return str(path)


@pytest.fixture(scope="module")
def resident(moe_gguf):
    return load_model(moe_gguf, compute="quant")


@pytest.fixture(scope="module")
def tmoe(moe_gguf):
    tm = load_model_tiered(moe_gguf, hbm_bytes=64 * GB, ram_bytes=64 * GB)
    assert isinstance(tm, TieredMoEModel)
    return tm


def test_tiered_moe_prefill_parity(tmoe, resident):
    toks = jnp.asarray([1, 5, 9, 2], jnp.int32)
    kv_t = KVCache.create(tmoe.arch)
    lt, kv_t, _ = forward_tiered_moe(tmoe, kv_t, toks, 0)
    lr, _, _ = forward(resident.arch, resident.weights,
                       KVCache.create(resident.arch), toks, 0)
    np.testing.assert_allclose(np.asarray(lt), np.asarray(lr),
                               rtol=1e-4, atol=2e-4)


def test_tiered_moe_decode_parity_and_hits(tmoe, resident):
    """Greedy decode matches resident token-for-token, and the temporal
    prefetch hit counter reports (the verdict's telemetry ask)."""
    toks = jnp.asarray([1, 5, 9, 2], jnp.int32)
    kv_t = KVCache.create(tmoe.arch)
    lt, kv_t, _ = forward_tiered_moe(tmoe, kv_t, toks, 0)
    kv_r = KVCache.create(resident.arch)
    lr, kv_r, _ = forward(resident.arch, resident.weights, kv_r, toks, 0)
    tmoe.estreamer.reset_stats()
    for step in range(6):
        nt = int(np.argmax(np.asarray(lt)[-1]))
        nr = int(np.argmax(np.asarray(lr)[-1]))
        assert nt == nr, f"step {step}: {nt} != {nr}"
        tok = jnp.asarray([nr], jnp.int32)
        lt, kv_t, _ = forward_tiered_moe(tmoe, kv_t, tok, 4 + step)
        lr, kv_r, _ = forward(resident.arch, resident.weights, kv_r, tok,
                              4 + step)
        np.testing.assert_allclose(np.asarray(lt), np.asarray(lr),
                                   rtol=1e-4, atol=5e-4)
    st = tmoe.estreamer.stats()
    assert st["hits"] + st["misses"] == 6 * tmoe.arch.n_layers \
        * tmoe.arch.n_experts_used
    # temporal locality on this trace (r4 measured 0.94 on 256 tokens);
    # a conservative floor — the counter must show REAL predictive power
    assert st["hit_rate"] > 0.5, st


def test_tiered_moe_lru_eviction_correct(moe_gguf, resident):
    """A cache smaller than the working set still decodes correctly —
    eviction costs demand loads, never correctness."""
    from ntransformer_tpu.models.tiered_moe import load_model_tiered_moe
    tm = load_model_tiered_moe(moe_gguf, hbm_expert_slots=2)
    toks = jnp.asarray([1, 5, 9], jnp.int32)
    kv_t = KVCache.create(tm.arch)
    lt, kv_t, _ = forward_tiered_moe(tm, kv_t, toks, 0)
    lr, kv_r, _ = forward(resident.arch, resident.weights,
                          KVCache.create(resident.arch), toks, 0)
    np.testing.assert_allclose(np.asarray(lt), np.asarray(lr),
                               rtol=1e-4, atol=2e-4)
    nt = jnp.asarray([int(np.argmax(np.asarray(lt)[-1]))], jnp.int32)
    lt, kv_t, _ = forward_tiered_moe(tm, kv_t, nt, 3)
    lr, _, _ = forward(resident.arch, resident.weights, kv_r, nt, 3)
    np.testing.assert_allclose(np.asarray(lt), np.asarray(lr),
                               rtol=1e-4, atol=5e-4)
    st = tm.estreamer.stats()
    assert st["cached"] <= 2
    tm.estreamer.close()


def test_tiered_moe_disk_tier(moe_gguf, resident):
    """ram_bytes=0 forces every expert through per-expert pack reads
    (the tier-C path) — still bit-close to resident."""
    from ntransformer_tpu.models.tiered_moe import load_model_tiered_moe
    tm = load_model_tiered_moe(moe_gguf, ram_bytes=0)
    assert not tm.estreamer.ram_blobs
    toks = jnp.asarray([1, 5, 9, 2], jnp.int32)
    kv_t = KVCache.create(tm.arch)
    lt, kv_t, _ = forward_tiered_moe(tmoe_kv := tm, kv_t, toks, 0)
    lr, _, _ = forward(resident.arch, resident.weights,
                       KVCache.create(resident.arch), toks, 0)
    np.testing.assert_allclose(np.asarray(lt), np.asarray(lr),
                               rtol=1e-4, atol=2e-4)
    tm.estreamer.close()


def test_tiered_moe_engine_generate(moe_gguf):
    """TieredEngine drives the MoE-tiered model end to end (greedy
    generate through the dispatching forward_tiered)."""
    from ntransformer_tpu.inference.engine import (GenerateConfig,
                                                   TieredEngine)
    eng = TieredEngine.load(moe_gguf, max_seq_len=128)
    cfg = GenerateConfig(max_tokens=6, temperature=0.0, repeat_penalty=1.0)
    text, stats = eng.generate("alpha beta", cfg)
    assert stats.decode_tokens > 0
    # resident engine must agree greedily
    from ntransformer_tpu.inference.engine import Engine
    eng2 = Engine.load(moe_gguf, max_seq_len=128)
    text2, _ = eng2.generate("alpha beta", cfg)
    assert text == text2


def test_tiered_moe_int8_kv(tmoe, moe_gguf):
    """int8 KV composes with expert streaming."""
    from ntransformer_tpu.models.tiered_moe import load_model_tiered_moe
    tm = load_model_tiered_moe(moe_gguf)
    toks = jnp.asarray([1, 5, 9, 2], jnp.int32)
    kv_q = KVCache.create(tm.arch, quant=True)
    lq, kv_q, _ = forward_tiered_moe(tm, kv_q, toks, 0)
    kv_f = KVCache.create(tm.arch)
    lf, kv_f, _ = forward_tiered_moe(tm, kv_f, toks, 0)
    # int8 KV error bound (same class as the dense path's int8 tests)
    rel = np.abs(np.asarray(lq) - np.asarray(lf)).max() / \
        (np.abs(np.asarray(lf)).max() + 1e-9)
    assert rel < 0.05, rel
    tm.estreamer.close()


def test_tiered_moe_refusals(tmoe):
    toks = jnp.asarray([1], jnp.int32)
    kv = KVCache.create(tmoe.arch)
    with pytest.raises(NotImplementedError, match="dense-tiered"):
        forward_tiered_moe(tmoe, kv, toks, 0, draft_only=True)
    with pytest.raises(NotImplementedError, match="dense-tiered"):
        forward_tiered_moe(tmoe, kv, toks, 0, skip=frozenset({1}))
