"""Context parallelism: sequence-sharded KV cache must reproduce the
single-device forward exactly, including writes that cross shard
boundaries (8-device CPU mesh)."""
import jax.numpy as jnp
import numpy as np
import pytest

from ntransformer_tpu.models.llama import KVCache, forward
from ntransformer_tpu.models.loader import load_model
from ntransformer_tpu.parallel.cp import (make_cp_forward, make_cp_mesh,
                                          replicate_weights, shard_kv)
from tools.make_test_gguf import write_model


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "cp_q8.gguf"
    write_model(str(path), "tiny", "q8_0", seed=13)
    return load_model(str(path))


def test_cp_forward_parity(model):
    arch, w = model.arch, model.weights
    mesh = make_cp_mesh(4)  # S=512 → 128 positions per shard
    w_cp = replicate_weights(w, mesh)
    kv_cp = shard_kv(KVCache.create(arch), mesh)
    fwd = make_cp_forward(mesh, arch, weights_template=w)
    kv = KVCache.create(arch)

    # prefill at 0, then a window crossing the shard-0/1 boundary (128)
    for toks, pos in [([1, 5, 9, 2, 7, 3, 8, 4], 0),
                      ([6, 6, 2, 9, 1, 3, 5, 7], 124)]:
        t = jnp.asarray(toks, jnp.int32)
        lr, kv, _ = forward(arch, w, kv, t, pos)
        lc, kv_cp, _ = fwd(w_cp, kv_cp, t, jnp.int32(pos))
        np.testing.assert_allclose(np.asarray(lc), np.asarray(lr),
                                   rtol=1e-4, atol=3e-4)

    # single-token decode exactly on a boundary position
    lr, kv, _ = forward(arch, w, kv, jnp.asarray([5], jnp.int32), 128)
    lc, kv_cp, _ = fwd(w_cp, kv_cp, jnp.asarray([5], jnp.int32), jnp.int32(128))
    np.testing.assert_allclose(np.asarray(lc), np.asarray(lr),
                               rtol=1e-4, atol=3e-4)


def test_cp_attention_op_parity():
    """attention_cp partial combine vs full-cache attention_jnp."""
    import jax
    from functools import partial
    from jax.sharding import NamedSharding, PartitionSpec as P
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        from jax.experimental.shard_map import shard_map
    from ntransformer_tpu.ops.layers import attention_cp, attention_jnp
    from ntransformer_tpu.parallel.cp import CP_AXIS, make_cp_mesh

    rng = np.random.default_rng(0)
    T, Hq, Hkv, S, D = 4, 8, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((T, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((Hkv, S, D)), jnp.float32)
    pos, scale = 200, 0.125
    ref = attention_jnp(q, k, v, pos, T, scale)

    mesh = make_cp_mesh(8)
    f = shard_map(
        partial(attention_cp, pos_start=pos, q_len=T, scale=scale,
                cp_axis=CP_AXIS, s_local=S // 8),
        mesh=mesh,
        in_specs=(P(None, None, None), P(None, CP_AXIS, None),
                  P(None, CP_AXIS, None)),
        out_specs=P(None, None, None), check_rep=False)
    out = f(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_cp_engine_generate_matches_resident(model):
    """CPEngine (r3: CP is now an ENGINE, not just a library) reproduces
    resident greedy generation through the shared chunked-prefill loop."""
    from ntransformer_tpu.inference.engine import CPEngine, Engine, GenerateConfig
    cfg = GenerateConfig(max_tokens=8, temperature=0.0, repeat_penalty=1.0)
    ref = Engine(model)
    want, _ = ref.generate("alpha beta gamma", cfg)
    eng = CPEngine(model, make_cp_mesh(4))
    # the full host weight copy is dropped once device shards exist
    # (~35 GB at 70B; same discipline as TPEngine/BatchServer)
    assert eng.model.weights is None
    got, stats = eng.generate("alpha beta gamma", cfg)
    assert got == want, (got, want)
    assert stats.decode_tokens > 0


def test_cp_engine_long_prompt_chunks(model, monkeypatch):
    """A prompt longer than PREFILL_CHUNK runs the shared chunk loop with
    shard-boundary-crossing writes."""
    from ntransformer_tpu.inference.engine import CPEngine, Engine, GenerateConfig
    monkeypatch.setattr(Engine, "PREFILL_CHUNK", 64)
    cfg = GenerateConfig(max_tokens=4, temperature=0.0, repeat_penalty=1.0)
    prompt = " ".join(["alpha beta gamma delta"] * 40)  # >> 64 ids
    ref = Engine(model)
    want, _ = ref.generate(prompt, cfg)
    eng = CPEngine(model, make_cp_mesh(4))
    got, _ = eng.generate(prompt, cfg)
    assert got == want, (got, want)


def test_cp_tp_engine_generate_matches_resident(model):
    """CPEngine over a (cp, tp) mesh — the --cp N --tp M CLI composition
    (previously --tp was silently ignored under --cp) — reproduces
    resident greedy generation: weights megatron-shard on tp, KV shards
    on BOTH axes."""
    from ntransformer_tpu.inference.engine import (CPEngine, Engine,
                                                   GenerateConfig)
    from ntransformer_tpu.parallel.cp import make_cp_tp_mesh
    cfg = GenerateConfig(max_tokens=6, temperature=0.0, repeat_penalty=1.0)
    ref = Engine(model)
    want, _ = ref.generate("compose cp tp", cfg)
    eng = CPEngine(model, make_cp_tp_mesh(cp=4, tp=2))
    got, stats = eng.generate("compose cp tp", cfg)
    assert got == want, (got, want)
    assert stats.decode_tokens > 0


def test_cp_tp_compose_parity(model):
    """CP×TP: heads shard on tp, sequence on cp — one forward matches the
    unsharded model (r2 weak #6: compose test)."""
    from ntransformer_tpu.parallel.cp import (make_cp_tp_forward,
                                              make_cp_tp_mesh, shard_cp_tp)
    arch, w = model.arch, model.weights
    mesh = make_cp_tp_mesh(cp=4, tp=2)  # tiny model: Hkv=2 caps tp
    w_sh, kv_sh = shard_cp_tp(w, KVCache.create(arch), mesh, arch)
    fwd = make_cp_tp_forward(mesh, arch, weights_template=w)
    kv = KVCache.create(arch)
    for toks, pos in [([1, 5, 9, 2, 7, 3, 8, 4], 0),
                      ([6, 6, 2, 9], 124)]:
        t = jnp.asarray(toks, jnp.int32)
        lr, kv, _ = forward(arch, w, kv, t, pos)
        lc, kv_sh, _ = fwd(w_sh, kv_sh, t, jnp.int32(pos))
        np.testing.assert_allclose(np.asarray(lc), np.asarray(lr),
                                   rtol=1e-4, atol=3e-4)


def test_cp_flash_partials_matches_jnp_combine():
    """attention_cp_flash (Pallas partials, interpret mode) vs attention_cp
    (jnp partials) under the same sequence sharding — CP no longer
    forfeits the flash kernel (r2 weak #6)."""
    import jax
    from functools import partial
    from jax.sharding import PartitionSpec as P
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        from jax.experimental.shard_map import shard_map
    from ntransformer_tpu.ops.layers import attention_cp, attention_cp_flash
    from ntransformer_tpu.parallel.cp import CP_AXIS, make_cp_mesh

    rng = np.random.default_rng(7)
    T, Hq, Hkv, S, D = 8, 4, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((T, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((Hkv, S, D)), jnp.float32)
    mesh = make_cp_mesh(4)
    for pos in (0, 100, 248):  # incl. positions before/after shard bounds
        outs = {}
        for name, fn in (("jnp", attention_cp), ("flash", attention_cp_flash)):
            f = shard_map(
                partial(fn, pos_start=pos, q_len=T, scale=0.125,
                        cp_axis=CP_AXIS, s_local=S // 4),
                mesh=mesh,
                in_specs=(P(None, None, None), P(None, CP_AXIS, None),
                          P(None, CP_AXIS, None)),
                out_specs=P(None, None, None), check_rep=False)
            outs[name] = np.asarray(f(q, k, v))
        np.testing.assert_allclose(outs["flash"], outs["jnp"],
                                   rtol=2e-5, atol=2e-5)
