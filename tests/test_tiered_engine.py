"""TieredEngine end-to-end: generation through the SLEP pipeline must match
the resident Engine exactly (greedy), and the decode-time optimizations
(self-speculation, layer-skip) must work over the tiered forward."""
import jax.numpy as jnp
import numpy as np
import pytest

from ntransformer_tpu.inference.engine import Engine, GenerateConfig, TieredEngine
from ntransformer_tpu.models.loader import load_model
from ntransformer_tpu.models.tiered import load_model_tiered
from tools.make_test_gguf import write_model

GB = 1 << 30
GREEDY = GenerateConfig(max_tokens=10, temperature=0.0, repeat_penalty=1.0)


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny_q8.gguf"
    write_model(str(path), "tiny", "q8_0", seed=5)
    return str(path)


@pytest.fixture(scope="module")
def resident_engine(tiny_gguf):
    return Engine(load_model(tiny_gguf))


@pytest.fixture(scope="module")
def tiered_engine(tiny_gguf):
    tm = load_model_tiered(tiny_gguf, max_hbm_layers=2, max_ram_layers=1,
                           hbm_bytes=64 * GB, ram_bytes=64 * GB)
    assert tm.tiers.n_disk == 1  # all three tiers in play
    return TieredEngine(tm)


def test_tiered_generate_matches_resident(resident_engine, tiered_engine):
    text_r, stats_r = resident_engine.generate("hello world", GREEDY)
    text_t, stats_t = tiered_engine.generate("hello world", GREEDY)
    assert text_t == text_r
    assert stats_t.decode_tokens == stats_r.decode_tokens


def test_tiered_self_speculative_greedy_exact(tiered_engine, resident_engine):
    """Greedy speculative decoding preserves greedy output exactly
    (engine.cpp acceptance rule)."""
    text_ref, _ = resident_engine.generate("a b c", GREEDY)
    text, stats = tiered_engine.generate_self_speculative("a b c", GREEDY)
    assert text.startswith(text_ref[: len(text_ref) // 2])  # prefix agreement
    assert stats.drafted > 0


def test_tiered_layer_skip_calibration(tiny_gguf):
    tm = load_model_tiered(tiny_gguf, max_hbm_layers=1, max_ram_layers=8,
                           hbm_bytes=64 * GB, ram_bytes=64 * GB)
    eng = TieredEngine(tm)
    cfg = GenerateConfig(max_tokens=4, temperature=0.0, repeat_penalty=1.0,
                         skip_threshold=0.5)  # low threshold → skips happen
    _, stats = eng.generate("x y z", cfg)
    # middle band of 4 layers = [1, 3); skipped layers recorded and applied
    assert all(1 <= i < 3 for i in stats.skipped_layers)
    assert eng.skip == frozenset(stats.skipped_layers)


def test_tiered_benchmark(tiered_engine):
    stats = tiered_engine.benchmark(n_tokens=4)
    assert stats.decode_tokens == 4
    assert stats.decode_ms > 0 and stats.prefill_ms > 0


def test_tiered_separate_draft_speculation(tiny_gguf, tmp_path_factory,
                                           resident_engine):
    """Separate-draft speculation against a TIERED target (r2 missing #1;
    main.cpp:121-132): the draft loads resident with HBM priority, the
    target streams, and greedy output equals plain greedy generation
    (the longest-prefix accept rule preserves argmax)."""
    # a DIFFERENT tiny model as the draft (different seed → different
    # weights, so acceptance is partial — exercises the correction path)
    dpath = tmp_path_factory.mktemp("models") / "draft_q8.gguf"
    write_model(str(dpath), "tiny", "q8_0", seed=99)
    eng = TieredEngine.load(tiny_gguf, draft_path=str(dpath),
                            max_hbm_layers=2, max_ram_layers=1,
                            hbm_bytes=64 * GB, ram_bytes=64 * GB)
    assert eng.tm.tiers.n_streamed >= 1
    assert eng.draft is not None
    text_ref, _ = resident_engine.generate("hello world", GREEDY)
    text, stats = eng.generate_speculative("hello world", GREEDY)
    assert stats.drafted > 0
    assert text == text_ref, (text, text_ref)


def test_tiered_draft_reserve_accounted(tiny_gguf, tmp_path_factory):
    """The tiered auto-sizing must subtract the draft KV it cannot see
    (reserve_extra_bytes): with a huge claimed draft reserve, fewer
    layers stay HBM-resident."""
    from ntransformer_tpu.models.tiered import load_model_tiered
    base = load_model_tiered(tiny_gguf, hbm_bytes=1 * GB, ram_bytes=64 * GB)
    squeezed = load_model_tiered(tiny_gguf, hbm_bytes=1 * GB,
                                 ram_bytes=64 * GB,
                                 reserve_extra_bytes=900 << 20)
    assert squeezed.tiers.n_hbm < base.tiers.n_hbm


def test_tiered_engine_over_tp_mesh(tiny_gguf, resident_engine):
    """TieredEngine over a TP mesh — the `--streaming --tp N` CLI path:
    each shard stages its slice of every streamed layer; greedy output
    matches the unsharded resident engine."""
    import jax
    import numpy as _np
    from jax.sharding import Mesh
    mesh = Mesh(_np.asarray(jax.devices()[:2]), ("tp",))
    tm = load_model_tiered(tiny_gguf, max_hbm_layers=2, max_ram_layers=1,
                           hbm_bytes=64 * GB, ram_bytes=64 * GB, mesh=mesh)
    assert tm.tp is not None and tm.tiers.n_disk >= 1
    eng = TieredEngine(tm)
    want, _ = resident_engine.generate("tp tiered hello", GREEDY)
    got, _ = eng.generate("tp tiered hello", GREEDY)
    assert got == want
