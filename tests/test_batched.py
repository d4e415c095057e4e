"""Batched decode + continuous batching server: results must be identical
to independent single-sequence decoding (greedy)."""
import jax.numpy as jnp
import numpy as np
import pytest

from ntransformer_tpu.inference.engine import Engine, GenerateConfig
from ntransformer_tpu.inference.sampler import SamplerConfig
from ntransformer_tpu.inference.serve import BatchServer, Request
from ntransformer_tpu.models.batched import BatchedKV, batched_decode_step
from ntransformer_tpu.models.llama import KVCache, forward
from ntransformer_tpu.models.loader import load_model
from tools.make_test_gguf import write_model


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny_q8.gguf"
    write_model(str(path), "tiny", "q8_0", seed=8)
    return load_model(str(path))


def test_batched_step_matches_single(model):
    """B=3 sequences with different prompts/positions decode exactly as 3
    independent single-sequence loops."""
    arch, w = model.arch, model.weights
    prompts = [[1, 5, 9], [7, 2], [3, 3, 3, 4]]
    B = len(prompts)

    singles, kvs = [], []
    for ids in prompts:
        kv = KVCache.create(arch)
        logits, kv, _ = forward(arch, w, kv, jnp.asarray(ids, jnp.int32), 0)
        singles.append(int(jnp.argmax(logits[0])))
        kvs.append(kv)

    bkv = BatchedKV.create(arch, B)
    for b, kv in enumerate(kvs):
        bkv = BatchedKV(bkv.k.at[:, b].set(kv.k), bkv.v.at[:, b].set(kv.v))
    tokens = jnp.asarray(singles, jnp.int32)
    pos = jnp.asarray([len(p) for p in prompts], jnp.int32)
    active = jnp.ones(B, bool)

    # 4 lock-step batched decode steps vs 4 per-sequence steps
    b_out = [list(singles)]
    for _ in range(4):
        logits, bkv = batched_decode_step(arch, w, bkv, tokens, pos, active)
        tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        pos = pos + 1
        b_out.append([int(t) for t in tokens])

    for b, ids in enumerate(prompts):
        kv = kvs[b]
        tok = singles[b]
        p = len(ids)
        for step in range(4):
            logits, kv, _ = forward(arch, w, kv,
                                    jnp.asarray([tok], jnp.int32), p + step)
            tok = int(jnp.argmax(logits[0]))
            assert tok == b_out[step + 1][b], (
                f"seq {b} step {step}: batched {b_out[step + 1][b]} != {tok}")


def test_batched_inactive_slot_frozen(model):
    """Inactive slots must not corrupt their KV."""
    arch, w = model.arch, model.weights
    kv = KVCache.create(arch)
    logits, kv, _ = forward(arch, w, kv, jnp.asarray([1, 5], jnp.int32), 0)
    first = int(jnp.argmax(logits[0]))

    bkv = BatchedKV.create(arch, 2)
    bkv = BatchedKV(bkv.k.at[:, 0].set(kv.k), bkv.v.at[:, 0].set(kv.v))
    k_before = np.asarray(bkv.k[:, 1])
    tokens = jnp.asarray([first, 0], jnp.int32)
    pos = jnp.asarray([2, 0], jnp.int32)
    active = jnp.asarray([True, False])
    _, bkv = batched_decode_step(arch, w, bkv, tokens, pos, active)
    np.testing.assert_array_equal(np.asarray(bkv.k[:, 1]), k_before)


def test_batch_server_matches_engine(model):
    """Continuous batching with B=2 over 4 requests reproduces per-request
    greedy generations bit-for-bit."""
    eng = Engine(model)
    cfg = GenerateConfig(max_tokens=6, temperature=0.0, repeat_penalty=1.0)
    prompts = ["alpha beta", "gamma", "delta epsilon zeta", "eta"]
    expected = [eng.generate(p, cfg)[0] for p in prompts]

    srv = BatchServer(model, batch_size=2,
                      sampler_cfg=SamplerConfig(temperature=0.0))
    reqs = [Request(prompt=p, max_tokens=6) for p in prompts]
    stats = srv.run(reqs)
    assert stats.requests == 4
    for r, want in zip(reqs, expected):
        assert r.text == want, f"{r.prompt!r}: {r.text!r} != {want!r}"
    assert stats.tokens >= 4 * 2
    assert stats.steps > 0


def test_server_first_token_eos_frees_slot(model):
    """A request whose first sampled token is EOS completes immediately
    without occupying a batch slot (code-review fix)."""
    from unittest.mock import patch
    import jax.numpy as jnp
    srv = BatchServer(model, batch_size=2,
                      sampler_cfg=SamplerConfig(temperature=0.0))
    eos = model.tokenizer.eos_id
    real_prefill = srv._prefill_one

    def fake_prefill(ids):
        logits, kv = real_prefill(ids)
        # force argmax -> EOS for the "die" prompt (3 tokens incl. BOS)
        if len(ids) == 2:
            logits = logits.at[eos].set(1e9)
        return logits, kv

    with patch.object(srv, "_prefill_one", side_effect=fake_prefill):
        reqs = [Request(prompt="x", max_tokens=5),       # 2 ids -> EOS first
                Request(prompt="alpha beta", max_tokens=5)]
        stats = srv.run(reqs)
    assert reqs[0].output_ids == [eos]
    assert reqs[0].finished_at > 0
    assert len(reqs[1].output_ids) > 1
    assert stats.requests == 2
