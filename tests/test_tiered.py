"""Tiered streaming (SLEP) tests: pack roundtrip, tier assignment, and
tiered-vs-resident forward parity — the reference validates streaming by
bit-identical output vs resident mode (docs/DEVELOPMENT.md:185; SURVEY §4).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from ntransformer_tpu.core.dtypes import DType
from ntransformer_tpu.core.gguf import GGUFReader
from ntransformer_tpu.memory.pack import PackWriter, PackReader, ensure_pack
from ntransformer_tpu.memory.tiers import TierConfig
from ntransformer_tpu.models.llama import KVCache, forward
from ntransformer_tpu.models.loader import load_layer_host, load_model
from ntransformer_tpu.models.tiered import (TieredKV, forward_tiered,
                                            load_model_tiered)
from tools.make_test_gguf import write_model

GB = 1 << 30


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny_q8.gguf"
    write_model(str(path), "tiny", "q8_0", seed=3)
    return str(path)


@pytest.fixture(scope="module")
def resident_model(tiny_gguf):
    return load_model(tiny_gguf, compute="quant")


def _tiered(tiny_gguf, max_hbm, max_ram, **kw):
    return load_model_tiered(tiny_gguf, max_hbm_layers=max_hbm,
                             max_ram_layers=max_ram,
                             hbm_bytes=64 * GB, ram_bytes=64 * GB, **kw)


# --- tier sizing -------------------------------------------------------------

def test_tier_config_auto():
    tc = TierConfig.compute(80, 1 * GB, reserve_bytes=2 * GB,
                            hbm_bytes=16 * GB, ram_bytes=40 * GB)
    assert tc.n_hbm > 0 and tc.n_hbm <= 14
    assert tc.n_ram > 0
    assert tc.n_hbm + tc.n_ram + tc.n_disk == 80
    assert tc.tier_of(0) == "hbm" and tc.tier_of(79) in ("ram", "disk")


def test_tier_config_env_overrides(monkeypatch):
    monkeypatch.setenv("NT_MAX_HBM_LAYERS", "2")
    monkeypatch.setenv("NT_MAX_RAM_LAYERS", "3")
    tc = TierConfig.compute(10, GB, 0, hbm_bytes=64 * GB, ram_bytes=64 * GB)
    assert (tc.n_hbm, tc.n_ram, tc.n_disk) == (2, 3, 5)


# --- pack --------------------------------------------------------------------

def test_pack_roundtrip(tiny_gguf, tmp_path):
    reader = GGUFReader(tiny_gguf)
    pack = PackWriter(reader).write(str(tmp_path / "t.ntp"))
    assert pack.n_layers == 4
    blob = pack.read_layer(2)
    lw = pack.layer_weights(2, blob)
    ref = load_layer_host(reader, 2)
    for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        got, want = getattr(lw, name), getattr(ref, name)
        assert got.dtype == want.dtype
        for pn in want.planes:
            np.testing.assert_array_equal(got.planes[pn], want.planes[pn])
    np.testing.assert_allclose(np.asarray(lw.attn_norm),
                               np.asarray(ref.attn_norm))


def test_device_unpacker_bit_parity(tiny_gguf, tmp_path):
    """The coalesced-H2D on-device unpacker (one DMA per layer, planes
    rebuilt by slice+bitcast) reproduces every plane of every dtype
    BIT-EXACTLY vs the host numpy views — this locks the bitcast byte
    order (little-endian minor-dim packing) on the current backend."""
    from ntransformer_tpu.memory.pack import (make_device_unpacker,
                                              unpacker_signature)
    reader = GGUFReader(tiny_gguf)
    pack = PackWriter(reader).write(str(tmp_path / "u.ntp"))
    meta = pack.layer_meta(1)
    blob = pack.read_layer(1)
    want = pack.layer_weights(1, blob)
    got = make_device_unpacker(meta)(jnp.asarray(blob[: meta["size"]]))
    for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        g, w = getattr(got, name), getattr(want, name)
        assert (g.dtype, g.k, g.n) == (w.dtype, w.k, w.n)
        for pn in w.planes:
            assert str(g.planes[pn].dtype) == str(w.planes[pn].dtype)
            np.testing.assert_array_equal(np.asarray(g.planes[pn]),
                                          w.planes[pn])
    np.testing.assert_array_equal(np.asarray(got.attn_norm), want.attn_norm)
    np.testing.assert_array_equal(np.asarray(got.ffn_norm), want.ffn_norm)
    # layers of a uniform model share one unpacker compilation
    assert unpacker_signature(meta) == unpacker_signature(pack.layer_meta(2))


def test_tiered_planes_h2d_fallback_parity(tiny_gguf, resident_model,
                                           monkeypatch):
    """NT_H2D=planes (the per-plane device_put fallback) still produces
    bit-identical tiered output."""
    monkeypatch.setenv("NT_H2D", "planes")
    tm = _tiered(tiny_gguf, max_hbm=1, max_ram=1)
    assert tm.streamer.coalesce is False
    tokens = jnp.asarray([1, 5, 9, 2], jnp.int32)
    _parity(tm, resident_model, tokens)


def test_ensure_pack_caches(tiny_gguf):
    p1 = ensure_pack(GGUFReader(tiny_gguf), tiny_gguf)
    p2 = ensure_pack(GGUFReader(tiny_gguf), tiny_gguf)
    assert p1.path == p2.path


def test_pack_requant(tmp_path):
    path = str(tmp_path / "tiny_q6.gguf")
    write_model(path, "tiny", "q6_k", seed=4)
    reader = GGUFReader(path)
    pack = PackWriter(reader, requant=DType.Q4_K).write(str(tmp_path / "r.ntp"))
    lw = pack.layer_weights(0, pack.read_layer(0))
    assert lw.wq.dtype == DType.Q4_K  # Q6_K → Q4_K on stage
    # requantized pack is smaller
    plain = PackWriter(reader).write(str(tmp_path / "p.ntp"))
    assert pack.max_layer_nbytes < plain.max_layer_nbytes


# --- tiered forward parity ----------------------------------------------------

def _parity(tm, rm, tokens, atol=2e-4):
    kv_t = TieredKV.create(tm.arch, tm.tiers)
    lt, kv_t, _ = forward_tiered(tm, kv_t, tokens, 0)
    lr, _, _ = forward(rm.arch, rm.weights, KVCache.create(rm.arch), tokens, 0)
    np.testing.assert_allclose(np.asarray(lt), np.asarray(lr),
                               rtol=1e-4, atol=atol)
    return kv_t


def test_tiered_ram_parity(tiny_gguf, resident_model):
    tm = _tiered(tiny_gguf, max_hbm=1, max_ram=8)
    assert (tm.tiers.n_hbm, tm.tiers.n_ram, tm.tiers.n_disk) == (1, 3, 0)
    tokens = jnp.asarray([1, 5, 9, 2], jnp.int32)
    _parity(tm, resident_model, tokens)


def test_tiered_disk_parity(tiny_gguf, resident_model):
    tm = _tiered(tiny_gguf, max_hbm=1, max_ram=1)
    assert tm.tiers.n_disk == 2
    tokens = jnp.asarray([1, 5, 9, 2], jnp.int32)
    _parity(tm, resident_model, tokens)


def test_tiered_zero_resident(tiny_gguf, resident_model):
    tm = _tiered(tiny_gguf, max_hbm=0, max_ram=8)
    tokens = jnp.asarray([3, 7], jnp.int32)
    _parity(tm, resident_model, tokens)


def test_tiered_decode_sequence(tiny_gguf, resident_model):
    """Multi-step decode through the tiered pipeline matches resident."""
    rm = resident_model
    tm = _tiered(tiny_gguf, max_hbm=2, max_ram=1)  # hbm+ram+disk all in play
    toks = [1, 5, 9]
    kv_t = TieredKV.create(tm.arch, tm.tiers)
    kv_r = KVCache.create(rm.arch)
    lt, kv_t, _ = forward_tiered(tm, kv_t, jnp.asarray(toks, jnp.int32), 0)
    lr, kv_r, _ = forward(rm.arch, rm.weights, kv_r,
                          jnp.asarray(toks, jnp.int32), 0)
    for step in range(3):
        nt = int(jnp.argmax(lt[0]))
        nr = int(jnp.argmax(lr[0]))
        assert nt == nr
        tok = jnp.asarray([nt], jnp.int32)
        lt, kv_t, _ = forward_tiered(tm, kv_t, tok, 3 + step)
        lr, kv_r, _ = forward(rm.arch, rm.weights, kv_r, tok, 3 + step)
        np.testing.assert_allclose(np.asarray(lt), np.asarray(lr),
                                   rtol=1e-4, atol=2e-4)


def test_tiered_draft_only(tiny_gguf, resident_model):
    """draft_only == forward over the resident prefix (forward_draft,
    transformer.cpp:1067-1125)."""
    rm = resident_model
    tm = _tiered(tiny_gguf, max_hbm=2, max_ram=8)
    tokens = jnp.asarray([1, 5], jnp.int32)
    kv_t = TieredKV.create(tm.arch, tm.tiers)
    lt, _, _ = forward_tiered(tm, kv_t, tokens, 0, draft_only=True)
    lr, _, _ = forward(rm.arch, rm.weights, KVCache.create(rm.arch), tokens,
                       0, layer_sel=jnp.asarray([0, 1], jnp.int32))
    np.testing.assert_allclose(np.asarray(lt), np.asarray(lr),
                               rtol=1e-4, atol=2e-4)


def test_tiered_skip(tiny_gguf, resident_model):
    """Skipping a streamed layer == layer_sel without it
    (transformer.cpp:831-835)."""
    rm = resident_model
    tm = _tiered(tiny_gguf, max_hbm=1, max_ram=8)
    tokens = jnp.asarray([1, 5], jnp.int32)
    kv_t = TieredKV.create(tm.arch, tm.tiers)
    lt, _, _ = forward_tiered(tm, kv_t, tokens, 0, skip=frozenset({2}))
    lr, _, _ = forward(rm.arch, rm.weights, KVCache.create(rm.arch), tokens,
                       0, layer_sel=jnp.asarray([0, 1, 3], jnp.int32))
    np.testing.assert_allclose(np.asarray(lt), np.asarray(lr),
                               rtol=1e-4, atol=2e-4)


def test_tiered_cosine_calibration(tiny_gguf):
    tm = _tiered(tiny_gguf, max_hbm=1, max_ram=8)
    tokens = jnp.asarray([1, 5], jnp.int32)
    kv_t = TieredKV.create(tm.arch, tm.tiers)
    _, _, cos = forward_tiered(tm, kv_t, tokens, 0, with_cosine=True)
    assert cos.shape == (4,)
    assert np.all(np.abs(cos) <= 1.0 + 1e-5)


def test_tiered_early_exit(tiny_gguf, resident_model):
    """Early exit breaks the streamed loop after n_layers/2 when the cosine
    clears the threshold — the remaining layers' I/O is skipped
    (transformer.cpp:961-977)."""
    rm = resident_model
    tm = _tiered(tiny_gguf, max_hbm=1, max_ram=8)
    tokens = jnp.asarray([1], jnp.int32)
    kv_t = TieredKV.create(tm.arch, tm.tiers)
    lt, _, _ = forward_tiered(tm, kv_t, tokens, 0, early_exit_threshold=1e-9)
    # exit triggers at layer 2 (first streamed layer >= n_layers/2=2):
    # layers 0..2 ran, layer 3 skipped
    lr, _, _ = forward(rm.arch, rm.weights, KVCache.create(rm.arch), tokens,
                       0, layer_sel=jnp.asarray([0, 1, 2], jnp.int32))
    np.testing.assert_allclose(np.asarray(lt), np.asarray(lr),
                               rtol=1e-4, atol=2e-4)


def test_tiered_int8_kv_close_to_bf16(tiny_gguf, resident_model):
    """int8 KV on the TIERED path (r1 verdict item 7): logits stay within
    the documented ~0.3% error of the bf16-cache tiered forward, across a
    prefill + decode step through hbm/ram/disk tiers."""
    rm = resident_model
    tm = _tiered(tiny_gguf, max_hbm=2, max_ram=1)  # all three tiers in play
    toks = jnp.asarray([1, 5, 9], jnp.int32)
    kv_q = TieredKV.create(tm.arch, tm.tiers, quant=True)
    assert kv_q.res.quantized and kv_q.str.quantized
    lq, kv_q, _ = forward_tiered(tm, kv_q, toks, 0)
    lr, kv_r, _ = forward(rm.arch, rm.weights, KVCache.create(rm.arch),
                          toks, 0)
    rel = float(jnp.max(jnp.abs(lq - lr)) / (jnp.max(jnp.abs(lr)) + 1e-9))
    assert rel < 0.02, rel
    nxt = int(jnp.argmax(lr[0]))
    lq2, kv_q, _ = forward_tiered(tm, kv_q, jnp.asarray([nxt], jnp.int32), 3)
    lr2, _, _ = forward(rm.arch, rm.weights, kv_r,
                        jnp.asarray([nxt], jnp.int32), 3)
    rel2 = float(jnp.max(jnp.abs(lq2 - lr2)) / (jnp.max(jnp.abs(lr2)) + 1e-9))
    assert rel2 < 0.02, rel2


def test_tiered_int8_kv_with_skip(tiny_gguf, resident_model):
    """layer_sel gather/scatter works on the (codes, scales) tuple cache."""
    rm = resident_model
    tm = _tiered(tiny_gguf, max_hbm=2, max_ram=8)
    toks = jnp.asarray([1, 5], jnp.int32)
    kv_q = TieredKV.create(tm.arch, tm.tiers, quant=True)
    lq, _, _ = forward_tiered(tm, kv_q, toks, 0, skip=frozenset({1}))
    lr, _, _ = forward(rm.arch, rm.weights, KVCache.create(rm.arch), toks,
                       0, layer_sel=jnp.asarray([0, 2, 3], jnp.int32))
    rel = float(jnp.max(jnp.abs(lq - lr)) / (jnp.max(jnp.abs(lr)) + 1e-9))
    assert rel < 0.02, rel


def test_tiered_int8_kv_tp_parity(tiny_gguf, resident_model):
    """int8 KV × TP on the TIERED path (r2 verdict item 4 — the 70B
    multi-chip configuration: tiering exists because HBM is tight, which
    is exactly when the KV halving matters). Codes and scales both shard
    on the head axis; logits stay within the documented int8-KV error of
    the unsharded bf16 resident forward across prefill + decode."""
    from ntransformer_tpu.parallel.multihost import make_mesh
    from jax.sharding import Mesh
    import numpy as _np
    mesh = make_mesh(tp=2, dp=4)
    tp_mesh = Mesh(_np.asarray(mesh.devices)[0], ("tp",))

    tm = load_model_tiered(tiny_gguf, max_hbm_layers=1, max_ram_layers=1,
                           hbm_bytes=64 * GB, ram_bytes=64 * GB,
                           mesh=tp_mesh)
    assert tm.tp is not None and tm.tiers.n_disk >= 1
    rm = resident_model
    kv_q = TieredKV.create(tm.arch, tm.tiers, tp=tm.tp, quant=True)
    assert kv_q.res.quantized and kv_q.str.quantized

    toks = jnp.asarray([1, 5, 9], jnp.int32)
    lq, kv_q, _ = forward_tiered(tm, kv_q, toks, 0)
    lr, kv_r, _ = forward(rm.arch, rm.weights, KVCache.create(rm.arch),
                          toks, 0)
    rel = float(jnp.max(jnp.abs(lq - lr)) / (jnp.max(jnp.abs(lr)) + 1e-9))
    assert rel < 0.02, rel
    nxt = int(jnp.argmax(lr[0]))
    lq2, kv_q, _ = forward_tiered(tm, kv_q, jnp.asarray([nxt], jnp.int32), 3)
    lr2, _, _ = forward(rm.arch, rm.weights, kv_r,
                        jnp.asarray([nxt], jnp.int32), 3)
    rel2 = float(jnp.max(jnp.abs(lq2 - lr2)) / (jnp.max(jnp.abs(lr2)) + 1e-9))
    assert rel2 < 0.02, rel2


def test_tiered_chunked_prefill_matches_single_shot(tiny_gguf, resident_model):
    """TieredEngine inherits the shared PREFILL_CHUNK loop (r1 verdict item
    8): a prompt longer than the chunk size prefills in chunks and matches
    the resident single-shot forward."""
    from ntransformer_tpu.inference.engine import TieredEngine
    rm = resident_model
    tm = _tiered(tiny_gguf, max_hbm=1, max_ram=8)
    eng = TieredEngine(tm)
    eng.PREFILL_CHUNK = 8  # force chunking on the tiny model
    ids = [(i * 7 + 3) % 50 for i in range(20)]
    kv = eng._make_kv()
    logits, kv, _ = eng._prefill(kv, ids)
    lr, _, _ = forward(rm.arch, rm.weights, KVCache.create(rm.arch),
                       jnp.asarray(ids, jnp.int32), 0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(lr),
                               rtol=1e-4, atol=5e-4)


def test_multihost_mesh_cpu():
    """make_mesh builds (dp, tp) with TP innermost on the 8-device CPU mesh."""
    from ntransformer_tpu.parallel.multihost import make_mesh, TP_AXIS, DP_AXIS
    m = make_mesh(tp=4, dp=2)
    assert m.shape[DP_AXIS] == 2 and m.shape[TP_AXIS] == 4
    m1 = make_mesh(tp=8)
    assert m1.axis_names == (TP_AXIS,)


def test_tiered_tp_parity(tiny_gguf, resident_model):
    """Tiered streaming over a TP mesh: each shard stages its slice of
    every streamed layer; output must match the unsharded resident forward
    (the multi-host streamed-layer design, SURVEY §7 hard parts)."""
    from ntransformer_tpu.parallel.multihost import make_mesh
    mesh = make_mesh(tp=2, dp=4)  # 8 CPU devices; use only the tp submesh
    from jax.sharding import Mesh
    import numpy as _np
    tp_mesh = Mesh(_np.asarray(mesh.devices)[0], ("tp",))

    tm = load_model_tiered(tiny_gguf, max_hbm_layers=1, max_ram_layers=1,
                           hbm_bytes=64 * GB, ram_bytes=64 * GB,
                           mesh=tp_mesh)
    assert tm.tp is not None and tm.tiers.n_disk >= 1
    rm = resident_model

    # bucketed prefill (n_valid) + decode step, vs unsharded resident
    tokens = [1, 5, 9]
    padded = np.zeros(8, np.int32)
    padded[:3] = tokens
    kv_t = TieredKV.create(tm.arch, tm.tiers, tp=tm.tp)
    lt, kv_t, _ = forward_tiered(tm, kv_t, jnp.asarray(padded), 0, n_valid=3)
    lr, kv_r, _ = forward(rm.arch, rm.weights, KVCache.create(rm.arch),
                          jnp.asarray(padded), 0, n_valid=3)
    np.testing.assert_allclose(np.asarray(lt), np.asarray(lr),
                               rtol=1e-4, atol=2e-4)
    nt = int(jnp.argmax(lt[0]))
    lt2, kv_t, _ = forward_tiered(tm, kv_t, jnp.asarray([nt], jnp.int32), 3)
    lr2, _, _ = forward(rm.arch, rm.weights, kv_r,
                        jnp.asarray([nt], jnp.int32), 3)
    np.testing.assert_allclose(np.asarray(lt2), np.asarray(lr2),
                               rtol=1e-4, atol=5e-4)


def test_staging_fence_survives_signal_compute_done(tiny_gguf, monkeypatch):
    """The staging-reuse fence must fire on the NEXT token's prefetch even
    though signal_compute_done cleared slot.device at the end of this
    token's forward (advisor finding r1: slot.host_src-based fencing was
    skipped across forward calls, letting the pread overwrite the staging
    buffer while the prior device_put was still in flight)."""
    from ntransformer_tpu.memory import streamer as streamer_mod

    tm = _tiered(tiny_gguf, max_hbm=1, max_ram=1)  # layer 3 = disk tier
    st = tm.streamer
    disk_layer = 3
    assert tm.tiers.tier_of(disk_layer) == "disk"

    fenced = []
    monkeypatch.setattr(streamer_mod, "_hard_fence",
                        lambda leaves: fenced.append(len(list(leaves))))

    # token 1: stage + H2D the disk layer through slot 0, then end-of-token
    st.prefetch_staging(disk_layer, 0)
    st.begin_h2d(disk_layer, 0)
    assert st.slots[0].staging_consumer is not None
    st.signal_compute_done(0)
    assert st.slots[0].device is None
    # the consumer record must survive the per-token clear
    assert st.slots[0].staging_consumer is not None

    # token 2: the next prefetch into the same staging buffer must fence
    # the prior H2D before the pread overwrites the buffer
    st.prefetch_staging(disk_layer, 0)
    st.pool.wait(st.slots[0].stage_job)
    st.slots[0].stage_job = None
    assert fenced, "prefetch_staging did not fence the prior staging H2D"
    assert st.slots[0].staging_consumer is None


def test_early_exit_then_next_forward_is_clean(tiny_gguf, resident_model):
    """After an early-exit break leaves a pending prefetch, the next
    forward must not race two writers on one staging buffer (code-review
    fix: prefetch_staging waits out leftover jobs)."""
    rm = resident_model
    tm = _tiered(tiny_gguf, max_hbm=1, max_ram=1)  # disk tier => staging used
    assert tm.tiers.n_disk == 2
    kv_t = TieredKV.create(tm.arch, tm.tiers)
    t = jnp.asarray([1], jnp.int32)
    # early exit fires at layer 2, leaving layer 3's prefetch pending
    _, kv_t, _ = forward_tiered(tm, kv_t, t, 0, early_exit_threshold=1e-9)
    # next forward (no early exit) must produce clean, correct weights
    kv_t2 = TieredKV.create(tm.arch, tm.tiers)
    lt, _, _ = forward_tiered(tm, kv_t2, t, 0)
    lr, _, _ = forward(rm.arch, rm.weights, KVCache.create(rm.arch), t, 0)
    np.testing.assert_allclose(np.asarray(lt), np.asarray(lr),
                               rtol=1e-4, atol=2e-4)


def test_pack_float_tensors_stream_bf16(tmp_path):
    """F16/F32 weight tensors pack as bf16 (2 B/elem) — r1 stored f32 and
    doubled an F16 model's streamed bytes (verdict weak #9)."""
    path = str(tmp_path / "tiny_f16.gguf")
    write_model(path, "tiny", "f16", seed=9)
    reader = GGUFReader(path)
    pack = PackWriter(reader).write(str(tmp_path / "f.ntp"))
    meta = pack.layer_meta(0)
    t = meta["tensors"]["wq"]
    assert t["qdtype"] == "BF16"
    assert t["planes"]["w"]["dtype"] == "bfloat16"
    k, n = t["k"], t["n"]
    # bytes: 2 per element, not 4
    assert t["planes"]["w"]["off"] + 0 >= 0
    lw = pack.layer_weights(0, pack.read_layer(0))
    assert lw.wq.planes["w"].dtype.name == "bfloat16"
    assert lw.wq.planes["w"].nbytes == 2 * k * n
    # parity: bf16-rounded dequant of the original
    import ml_dtypes
    from ntransformer_tpu.core.dequant import dequantize
    raw = reader.raw_bytes("blk.0.attn_q.weight")
    info = reader.info("blk.0.attn_q.weight")
    want = dequantize(raw, info.dtype, *info.shape).T.astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(lw.wq.planes["w"]).view(np.uint16),
        want.view(np.uint16))


def test_ensure_pack_content_stale_rebuilds(tmp_path):
    """A GGUF whose BYTES change but whose mtime looks old must trigger a
    pack rebuild — the old mtime-only check silently served stale weights
    (r2 weak #9). Staleness is now keyed on content (size + header hash)."""
    import os
    from ntransformer_tpu.memory.pack import gguf_content_key
    path = str(tmp_path / "m.gguf")
    write_model(path, "tiny", "q8_0", seed=31)
    p1 = ensure_pack(GGUFReader(path), path)
    key1 = gguf_content_key(path)
    assert PackReader(p1.path).header["src_key"] == key1

    # rewrite with different weights, then FORGE an ancient mtime
    write_model(path, "tiny", "q8_0", seed=32)
    os.utime(path, (0, 0))
    os.utime(p1.path, None)  # pack mtime is NEWER than the gguf
    assert gguf_content_key(path) != key1
    p2 = ensure_pack(GGUFReader(path), path)
    assert PackReader(p2.path).header["src_key"] == gguf_content_key(path)

    # unchanged content: cached pack reused (no rebuild)
    mt = os.path.getmtime(p2.path)
    p3 = ensure_pack(GGUFReader(path), path)
    assert os.path.getmtime(p3.path) == mt


def test_content_key_sees_data_beyond_header(tmp_path):
    """A same-size change ONLY in the tensor-data region — past the 4 MB
    header hash window — must flip the content key (a fine-tune re-export
    of a real model keeps the multi-MB metadata block byte-identical;
    advisor r3: the first-MB-only hash missed this entirely). The strided
    samples cover the data span start/middle/end."""
    from ntransformer_tpu.memory.pack import gguf_content_key
    path = str(tmp_path / "big.bin")
    size = 24 << 20
    with open(path, "wb") as f:
        f.write(b"\x7f" * size)
    key0 = gguf_content_key(path)
    head = 4 << 20
    # a fine-tune rewrites essentially every data byte; the sampled-window
    # guarantee is: changes at the span start, any stride point, or the
    # tail are seen
    for off in (head, head + (size - head) // 2 // (1 << 18) * (1 << 18),
                size - 1):
        with open(path, "r+b") as f:
            f.seek(off)
            f.write(b"\x00")
        key1 = gguf_content_key(path)
        assert key1 != key0, f"change at {off} not detected"
        with open(path, "r+b") as f:  # restore
            f.seek(off)
            f.write(b"\x7f")
        assert gguf_content_key(path) == key0


def test_kv_quant_shrinks_hbm_reserve(tiny_gguf):
    """The tier auto-sizer budgets the int8 KV cache at its real size
    (codes + f32 scales ~53% of bf16), so --kv-int8 frees HBM for more
    resident layers — the point of int8 KV on exactly the tiered configs."""
    from ntransformer_tpu.models.tiered import kv_cache_bytes
    probe = load_model_tiered(tiny_gguf, max_hbm_layers=4, max_ram_layers=8,
                              hbm_bytes=64 * GB, ram_bytes=64 * GB)
    arch = probe.arch
    bf16 = kv_cache_bytes(arch)
    q = kv_cache_bytes(arch, quant=True)
    assert q < bf16 * 0.6 and q > bf16 * 0.4  # ~53% at D=64..128

    # budget where the bf16 reserve fits strictly fewer resident layers
    lb = probe.pack.max_layer_nbytes
    embed_b = probe.resident.embed.nbytes
    tied = probe.resident.lm_head is probe.resident.embed
    head_b = 0 if tied else probe.resident.lm_head.nbytes
    from ntransformer_tpu.memory.streamer import coalesced_h2d_default
    from ntransformer_tpu.memory.tiers import HBM_MARGIN_BYTES
    workspace = 64 << 20
    slot_mult = 4 if coalesced_h2d_default() else 2
    base = embed_b + head_b + workspace + slot_mult * lb + HBM_MARGIN_BYTES
    # enough HBM for the quant reserve + 2 layers, but the bf16 reserve
    # eats into the layer budget
    hbm = base + q + 2 * lb + (bf16 - q) // 2
    t_bf = load_model_tiered(tiny_gguf, hbm_bytes=hbm, ram_bytes=64 * GB)
    t_q = load_model_tiered(tiny_gguf, hbm_bytes=hbm, ram_bytes=64 * GB,
                            kv_quant=True)
    assert t_q.tiers.n_hbm > t_bf.tiers.n_hbm, \
        (t_q.tiers.n_hbm, t_bf.tiers.n_hbm)


# --- runtime tier-B requant ----------------------------------------------

def test_runtime_ram_requant_serves_q4k_and_matches_offline(tmp_path):
    """RUNTIME tier-B requant (reference streamer.cu:45-153): Q6_K RAM
    copies requantize to Q4_K at load with NO pack rebuild — the RAM blob
    is byte-identical to the OFFLINE requant pack's blob (same dequant →
    quant chain), tier-C layers stay Q6_K, RAM + per-token H2D shrink."""
    from ntransformer_tpu.memory.pack import requant_layer_meta

    path = str(tmp_path / "t6.gguf")
    write_model(path, "tiny", "q6_k", seed=9)
    tm = load_model_tiered(path, max_hbm_layers=1, max_ram_layers=2,
                           hbm_bytes=64 * GB, ram_bytes=64 * GB,
                           requant_ram=DType.Q4_K)
    st = tm.streamer
    assert set(st.ram_meta) == {1, 2}          # the 2 RAM-tier layers
    assert st.layer_nbytes(1) < tm.pack.layer_nbytes(1)
    assert st.layer_nbytes(3) == tm.pack.layer_nbytes(3)  # disk untouched

    # byte parity vs the offline pack-build requant of the same layer
    reader = GGUFReader(path)
    off_pack = PackWriter(reader, requant=DType.Q4_K).write(
        str(tmp_path / "off.ntp"))
    size = st.ram_meta[1]["size"]
    assert size == off_pack.layer_meta(1)["size"]
    np.testing.assert_array_equal(st.ram_blobs[1][:size],
                                  off_pack.read_layer(1)[:size])

    # served dtypes: RAM layer -> Q4_K planes, disk layer -> Q6_K
    st.begin_h2d(1, 0)
    assert st.get_weights(0).wq.dtype == DType.Q4_K
    st.signal_compute_done(0)
    st.prefetch_staging(3, 0)
    st.begin_h2d(3, 0)
    assert st.get_weights(0).wq.dtype == DType.Q6_K
    st.signal_compute_done(0)

    # mixed-dtype streamed forward runs and matches itself deterministically
    kv = TieredKV.create(tm.arch, tm.tiers)
    toks = jnp.asarray([3, 5, 7], jnp.int32)
    logits, kv, _ = forward_tiered(tm, kv, toks, 0)
    assert np.isfinite(np.asarray(logits)).all()
    st.close()


def test_runtime_ram_requant_pure_streaming_bit_matches_offline(tmp_path):
    """With every layer in the RAM tier, runtime requant is BIT-IDENTICAL
    to decoding from the offline requant pack (same blobs, same compute):
    the runtime path buys the same result without the pack rebuild."""
    path = str(tmp_path / "t6b.gguf")
    write_model(path, "tiny", "q6_k", seed=11)
    toks = jnp.asarray([2, 9, 4, 8], jnp.int32)

    def decode(**kw):
        tm = load_model_tiered(path, max_hbm_layers=0, max_ram_layers=4,
                               hbm_bytes=64 * GB, ram_bytes=64 * GB, **kw)
        kv = TieredKV.create(tm.arch, tm.tiers)
        logits, kv, _ = forward_tiered(tm, kv, toks, 0)
        out = [int(jnp.argmax(logits[-1]))]
        for i in range(4):
            logits, kv, _ = forward_tiered(
                tm, kv, jnp.asarray([out[-1]], jnp.int32), 4 + i)
            out.append(int(jnp.argmax(logits[-1])))
        arr = np.asarray(logits)
        tm.streamer.close()
        return out, arr

    out_rt, lg_rt = decode(requant_ram=DType.Q4_K)
    out_off, lg_off = decode(requant=DType.Q4_K)
    assert out_rt == out_off
    np.testing.assert_array_equal(lg_rt, lg_off)


def test_requant_ram_sizer_budgets_smaller_layers(tmp_path):
    """The RAM-tier auto-sizer uses the REQUANTED per-layer size: with a
    budget that fits 2 requanted layers but only 1 at full size, requant
    gets both (the reference's motivation for requant-on-stage)."""
    from ntransformer_tpu.memory.pack import ensure_pack, requant_layer_meta
    path = str(tmp_path / "t6c.gguf")
    write_model(path, "tiny", "q6_k", seed=13)
    reader = GGUFReader(path)
    pack = ensure_pack(reader, path)
    full = pack.layer_meta(0)["size"]
    small = requant_layer_meta(pack.layer_meta(0), DType.Q4_K)["size"]
    assert small < full
    from ntransformer_tpu.memory.tiers import RAM_SAFETY_BYTES
    budget = RAM_SAFETY_BYTES + 2 * small + full // 8
    tm = load_model_tiered(path, max_hbm_layers=1, hbm_bytes=64 * GB,
                           ram_bytes=budget, requant_ram=DType.Q4_K)
    assert tm.tiers.n_ram == 2
    tm.streamer.close()
    tm2 = load_model_tiered(path, max_hbm_layers=1, hbm_bytes=64 * GB,
                            ram_bytes=budget)
    assert tm2.tiers.n_ram == 1
    if tm2.streamer:
        tm2.streamer.close()


# --- SWA families on the tiered path (r4 verdict item 4) ---------------------

@pytest.fixture(scope="module")
def gemma2_gguf(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "g2_q8.gguf"
    write_model(str(path), "deep", "q8_0", seed=31, arch="gemma2")
    return str(path)


@pytest.fixture(scope="module")
def gemma3_gguf(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "g3_q8.gguf"
    write_model(str(path), "deep", "q8_0", seed=32, arch="gemma3")
    return str(path)


def test_tiered_gemma2_parity(gemma2_gguf):
    """Sliding-window + softcap + post-norm layers stream bit-parity with
    the resident path: the streamed step carries the ABSOLUTE layer index
    (layer_step abs_layer) so SWA parity is preserved, and the v4 pack
    carries the post norms. 'deep' = 7 layers, so hbm=2/ram=2/disk=3 puts
    both local and global layers in every tier."""
    rm = load_model(gemma2_gguf, compute="quant")
    assert rm.arch.swa_pattern, "fixture must be an SWA model"
    tm = _tiered(gemma2_gguf, max_hbm=2, max_ram=2)
    assert tm.tiers.n_disk >= 1
    # long enough that positions fall OUT of the tiny window (16), so a
    # wrong window mask actually fails
    tokens = jnp.asarray(np.arange(24) % 64, jnp.int32)
    _parity(tm, rm, tokens)
    # decode continues past the window
    kv_t = TieredKV.create(tm.arch, tm.tiers)
    lt, kv_t, _ = forward_tiered(tm, kv_t, tokens, 0)
    kv_r = KVCache.create(rm.arch)
    lr, kv_r, _ = forward(rm.arch, rm.weights, kv_r, tokens, 0)
    for step in range(3):
        nxt = jnp.asarray([int(np.argmax(np.asarray(lr)[-1]))], jnp.int32)
        lt, kv_t, _ = forward_tiered(tm, kv_t, nxt, 24 + step)
        lr, kv_r, _ = forward(rm.arch, rm.weights, kv_r, nxt, 24 + step)
        np.testing.assert_allclose(np.asarray(lt), np.asarray(lr),
                                   rtol=1e-4, atol=2e-4)


def test_tiered_gemma3_parity(gemma3_gguf):
    """gemma3 adds the DUAL rope table (local layers rotate at their own
    base) — the tiered loader now builds the stacked [global, local]
    tables and the streamed step selects by absolute-layer parity."""
    rm = load_model(gemma3_gguf, compute="quant")
    assert rm.arch.rope_local_theta
    tm = _tiered(gemma3_gguf, max_hbm=2, max_ram=2)
    assert tm.resident.rope_cos.ndim == 3
    tokens = jnp.asarray(np.arange(24) % 64, jnp.int32)
    _parity(tm, rm, tokens)


def test_tiered_gemma3_tp_refused(gemma3_gguf):
    """gemma3 x TP tiered is a documented loud refusal (dual-rope specs)."""
    import jax as _jax
    from jax.sharding import Mesh
    from ntransformer_tpu.parallel.tp import TP_AXIS
    mesh = Mesh(np.asarray(_jax.devices()[:2]), (TP_AXIS,))
    with pytest.raises(NotImplementedError, match="dual rope"):
        load_model_tiered(gemma3_gguf, max_hbm_layers=2, max_ram_layers=2,
                          hbm_bytes=64 * GB, ram_bytes=64 * GB, mesh=mesh)


def test_tiered_requant_ram_tp_parity(tmp_path_factory):
    """requant_ram x TP (r4 verdict item 7): RAM-tier layers requantize
    Q6_K->Q4_K at load AND shard over a TP-2 mesh (each shard device_puts
    its slice of the requanted planes via structure-matched shardings).
    Logits must match the unrequanted TP run within quant tolerance."""
    import jax as _jax
    from jax.sharding import Mesh
    from ntransformer_tpu.parallel.tp import TP_AXIS

    path = str(tmp_path_factory.mktemp("models") / "t512_q6k.gguf")
    write_model(path, "tiny512", "q6_k", seed=17)
    mesh = Mesh(np.asarray(_jax.devices()[:2]), (TP_AXIS,))

    def run(requant_ram, use_mesh):
        tm = load_model_tiered(path, max_hbm_layers=0, max_ram_layers=2,
                               hbm_bytes=64 * GB, ram_bytes=64 * GB,
                               mesh=mesh if use_mesh else None,
                               requant_ram=requant_ram)
        assert tm.tiers.n_ram == 2
        if requant_ram is not None:
            assert tm.streamer.ram_meta, "requant must actually trigger"
        kv = TieredKV.create(tm.arch, tm.tiers, tp=tm.tp)
        toks = jnp.asarray([1, 5, 9, 2], jnp.int32)
        logits, kv, _ = forward_tiered(tm, kv, toks, 0)
        out = np.asarray(logits)
        tm.streamer.close()
        return out

    # the REAL parity: TP requant_ram == single-chip requant_ram (same
    # requant numerics, sharded compute); and it genuinely requantized
    single = run(DType.Q4_K, use_mesh=False)
    tp2 = run(DType.Q4_K, use_mesh=True)
    np.testing.assert_allclose(tp2, single, rtol=1e-4, atol=5e-4)
    unreq = run(None, use_mesh=True)
    assert not np.allclose(tp2, unreq)  # different bits after requant
