"""Batched flash-decode kernel parity (interpret mode on CPU).

The kernel (ops/pallas/batched_attention.py) must match the jnp reference
bit-for-tolerance on both the bf16 and int8 caches, including: the
DEFERRED-WRITE contract (cache keys [0, pos-1] + the current row as a
virtual block ≡ write-then-attend keys [0, pos]), per-sequence positions
(block skipping), garbage beyond each position, GQA groups, stacked-layer
indexing, and the bulk in-place append kernel.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ntransformer_tpu.models.batched import batched_attention
from ntransformer_tpu.ops.pallas.batched_attention import (_pick_block_s,
                                                           flash_decode_batched)


def _mk(B, Hq, Hkv, S, D, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, Hq, D)).astype(np.float32)
    k = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    kn = rng.standard_normal((B, Hkv, 1, D)).astype(np.float32)
    vn = rng.standard_normal((B, Hkv, 1, D)).astype(np.float32)
    return q, k, v, kn, vn


@pytest.mark.parametrize("group", [1, 4])
def test_flash_decode_batched_bf16(group):
    """Kernel (cache [0, pos-1] + virtual new row) ≡ jnp reference with the
    row written at pos (keys [0, pos])."""
    B, Hkv, S, D = 3, 2, 64, 32
    Hq = Hkv * group
    q, k, v, kn, vn = _mk(B, Hq, Hkv, S, D)
    pos = np.array([0, 17, 63], np.int32)
    # poison every position at/beyond pos[b] in the KERNEL's cache — those
    # keys must come from the virtual row / be skipped, never the cache
    kk, vv = k.copy(), v.copy()
    for b in range(B):
        kk[b, :, pos[b]:] = 100.0
        vv[b, :, pos[b]:] = 100.0
    scale = 1.0 / math.sqrt(D)
    got = np.asarray(flash_decode_batched(
        jnp.asarray(q), jnp.asarray(kk, jnp.bfloat16),
        jnp.asarray(vv, jnp.bfloat16), jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(pos), scale, interpret=True))
    # reference: write the (bf16-cast) row at pos, then attend [0, pos]
    ref_k, ref_v = k.copy(), v.copy()
    knb = np.asarray(jnp.asarray(kn, jnp.bfloat16).astype(jnp.float32))
    vnb = np.asarray(jnp.asarray(vn, jnp.bfloat16).astype(jnp.float32))
    for b in range(B):
        ref_k[b, :, pos[b]] = knb[b, :, 0]
        ref_v[b, :, pos[b]] = vnb[b, :, 0]
    want = np.asarray(batched_attention(
        jnp.asarray(q), jnp.asarray(ref_k, jnp.bfloat16),
        jnp.asarray(ref_v, jnp.bfloat16), jnp.asarray(pos), scale))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_flash_decode_batched_int8():
    B, Hkv, S, D = 4, 2, 128, 32
    Hq = Hkv * 2
    q, k, v, kn, vn = _mk(B, Hq, Hkv, S, D, seed=3)
    pos = np.array([5, 0, 100, 127], np.int32)

    def quant(x):
        s = np.abs(x).max(-1, keepdims=True) / 127.0 + 1e-9
        return np.round(x / s).astype(np.int8), s.astype(np.float32)

    kc, ks = quant(k)
    vc, vs = quant(v)
    knc, kns = quant(kn)
    vnc, vns = quant(vn)
    scale = 1.0 / math.sqrt(D)
    got = np.asarray(flash_decode_batched(
        jnp.asarray(q),
        (jnp.asarray(kc), jnp.asarray(ks)), (jnp.asarray(vc), jnp.asarray(vs)),
        (jnp.asarray(knc), jnp.asarray(kns)),
        (jnp.asarray(vnc), jnp.asarray(vns)),
        jnp.asarray(pos), scale, interpret=True))
    # f32 reference on the EXACT dequantized values, row merged at pos
    kf = kc.astype(np.float32) * ks
    vf = vc.astype(np.float32) * vs
    for b in range(B):
        kf[b, :, pos[b]] = (knc.astype(np.float32) * kns)[b, :, 0]
        vf[b, :, pos[b]] = (vnc.astype(np.float32) * vns)[b, :, 0]
    from ntransformer_tpu.ops.layers import attention_jnp
    att = jax.vmap(attention_jnp, (0, 0, 0, 0, None, None))(
        jnp.asarray(q).reshape(B, 1, Hq, D), jnp.asarray(kf),
        jnp.asarray(vf), jnp.asarray(pos), 1, scale)
    want = np.asarray(att.reshape(B, Hq, D))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_flash_decode_batched_stacked_layer():
    """Stacked [L, B, Hkv, S, D] cache with a traced layer index (scalar
    prefetch) selects the right layer's keys — zero-slice design."""
    B, Hkv, S, D, L = 2, 2, 32, 32, 3
    Hq = 4
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    k = rng.standard_normal((L, B, Hkv, S, D)).astype(np.float32)
    v = rng.standard_normal((L, B, Hkv, S, D)).astype(np.float32)
    kn = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)), jnp.float32)
    pos = jnp.asarray([10, 31], jnp.int32)
    scale = 1.0 / math.sqrt(D)
    for li in range(L):
        got = np.asarray(flash_decode_batched(
            q, jnp.asarray(k, jnp.bfloat16), jnp.asarray(v, jnp.bfloat16),
            kn, vn, pos, scale, layer=jnp.int32(li), interpret=True))
        want = np.asarray(flash_decode_batched(
            q, jnp.asarray(k[li], jnp.bfloat16),
            jnp.asarray(v[li], jnp.bfloat16),
            kn, vn, pos, scale, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_deferred_step_matches_jnp_step(tmp_path):
    """The full deferred-write decode step (stacked-cache kernel reads +
    virtual rows + post-scan bulk append) reproduces the jnp path's logits
    AND cache contents on a tiny model — INCLUDING an inactive slot, whose
    logits must come from the frozen cache with the virtual row masked.

    The implementations are selected via the STATIC `impl` argument (a
    real retrace per choice); the old env-flip + _clear_cache() harness
    was vacuous — jax 0.9's global trace cache ignores clear_cache, so
    both calls silently reused the first-traced path."""
    from ntransformer_tpu.models.batched import BatchedKV, batched_decode_step
    from ntransformer_tpu.models.loader import load_model
    from tools.make_test_gguf import write_model
    path = str(tmp_path / "t.gguf")
    write_model(path, "tiny", "q8_0", seed=17)
    m = load_model(path)
    arch, w = m.arch, m.weights
    B = 3
    tokens = jnp.asarray([3, 7, 11], jnp.int32)
    pos = jnp.asarray([0, 5, 63], jnp.int32)
    active = jnp.asarray([True, True, False])
    l_ref, kv_ref = batched_decode_step(arch, w, BatchedKV.create(arch, B),
                                        tokens, pos, active, impl="jnp")
    l_k, kv_k = batched_decode_step(arch, w, BatchedKV.create(arch, B),
                                    tokens, pos, active, impl="kernel")
    np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_ref),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(
        np.asarray(kv_k.k).astype(np.float32),
        np.asarray(kv_ref.k).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(kv_k.v).astype(np.float32),
        np.asarray(kv_ref.v).astype(np.float32))


def test_deferred_step_inactive_nonzero_cache(tmp_path):
    """Same parity with an inactive slot whose frozen cache region is
    NON-zero (the slot decoded earlier, then was retired): the kernel
    must attend rows [0, pos] of the frozen cache, not the virtual row."""
    from ntransformer_tpu.models.batched import BatchedKV, batched_decode_step
    from ntransformer_tpu.models.loader import load_model
    from tools.make_test_gguf import write_model
    path = str(tmp_path / "ti.gguf")
    write_model(path, "tiny", "q8_0", seed=23)
    m = load_model(path)
    arch, w = m.arch, m.weights
    B = 2
    tokens = jnp.asarray([3, 7], jnp.int32)
    # two all-active warm steps fill rows 0-1 of both slots
    kv_j = BatchedKV.create(arch, B)
    kv_n = BatchedKV.create(arch, B)
    act1 = jnp.asarray([True, True])
    for p in range(2):
        pv = jnp.full((B,), p, jnp.int32)
        _, kv_j = batched_decode_step(arch, w, kv_j, tokens, pv, act1,
                                      impl="jnp")
        _, kv_n = batched_decode_step(arch, w, kv_n, tokens, pv, act1,
                                      impl="kernel")
    # now slot 1 goes inactive at pos=2 (frozen rows 0-1 are non-zero)
    pos = jnp.asarray([2, 2], jnp.int32)
    active = jnp.asarray([True, False])
    l_ref, kv_j = batched_decode_step(arch, w, kv_j, tokens, pos, active,
                                      impl="jnp")
    l_k, kv_n = batched_decode_step(arch, w, kv_n, tokens, pos, active,
                                    impl="kernel")
    np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_ref),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(
        np.asarray(kv_n.k).astype(np.float32),
        np.asarray(kv_j.k).astype(np.float32))


def test_pick_block_s():
    # 8B shapes: Hkv=8, D=128 → 2048 B/pos bf16 → 1024-pos blocks at 2 MB
    assert _pick_block_s(4096, 8 * 128 * 2) == 1024
    # int8 halves the per-position bytes → blocks double
    assert _pick_block_s(4096, 8 * 128 * 1) == 2048
    assert _pick_block_s(64, 8 * 128 * 2) == 64
    # non-power-of-two S still finds a divisor
    assert _pick_block_s(96, 1) in (8, 16, 32, 96)


def test_kv_append_rows_matches_scatter():
    """Pallas in-place row append (interpret mode) ≡ the vmap'd
    dynamic-update-slice it replaces: rows land at per-sequence positions,
    inactive slots and all other positions stay bit-identical."""
    from ntransformer_tpu.ops.pallas.kv_update import append_rows
    rng = np.random.default_rng(11)
    B, Hkv, S, D = 4, 2, 32, 16
    kc = rng.integers(-100, 100, (B, Hkv, S, D)).astype(np.int8)
    ks = rng.standard_normal((B, Hkv, S, 1)).astype(np.float32)
    row_c = rng.integers(-100, 100, (B, Hkv, 1, D)).astype(np.int8)
    row_s = rng.standard_normal((B, Hkv, 1, 1)).astype(np.float32)
    pos = np.array([0, 7, 31, 7], np.int32)
    active = np.array([True, False, True, True])

    got_c, got_s = append_rows(
        (jnp.asarray(kc), jnp.asarray(ks)),
        (jnp.asarray(row_c), jnp.asarray(row_s)),
        jnp.asarray(pos), jnp.asarray(active), interpret=True)

    want_c, want_s = kc.copy(), ks.copy()
    for b in range(B):
        if active[b]:
            want_c[b, :, pos[b]] = row_c[b, :, 0]
            want_s[b, :, pos[b]] = row_s[b, :, 0]
    np.testing.assert_array_equal(np.asarray(got_c), want_c)
    np.testing.assert_array_equal(np.asarray(got_s), want_s)


def test_kv_append_stacked_all_layers():
    """The bulk whole-L append (one grid step per sequence) lands every
    layer's row and freezes inactive slots."""
    from ntransformer_tpu.ops.pallas.kv_update import append_rows_stacked
    rng = np.random.default_rng(4)
    L, B, Hkv, S, D = 3, 4, 2, 32, 16
    cache = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)), jnp.bfloat16)
    rows = jnp.asarray(rng.standard_normal((L, B, Hkv, 1, D)), jnp.float32)
    pos = np.array([0, 9, 31, 9], np.int32)
    active = np.array([True, True, False, True])
    (got,) = append_rows_stacked((cache,), (rows,), jnp.asarray(pos),
                                 jnp.asarray(active), interpret=True)
    want = np.asarray(cache).copy()
    rb = np.asarray(rows.astype(jnp.bfloat16))
    for b in range(B):
        if active[b]:
            want[:, b, :, pos[b]] = rb[:, b, :, 0]
    np.testing.assert_array_equal(np.asarray(got), want)


def test_kv_append_bf16_cast():
    """f32 rows cast into a bf16 cache exactly like the scatter path."""
    from ntransformer_tpu.ops.pallas.kv_update import append_rows
    rng = np.random.default_rng(2)
    B, Hkv, S, D = 2, 2, 16, 8
    cache = jnp.asarray(rng.standard_normal((B, Hkv, S, D)), jnp.bfloat16)
    row = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)), jnp.float32)
    pos = jnp.asarray([3, 15], jnp.int32)
    act = jnp.asarray([True, True])
    (got,) = append_rows((cache,), (row,), pos, act, interpret=True)
    want = np.asarray(cache).copy()
    for b in range(B):
        want[b, :, int(pos[b])] = np.asarray(row.astype(jnp.bfloat16))[b, :, 0]
    np.testing.assert_array_equal(np.asarray(got), want)


def test_dus_append_matches_kernel_append(tmp_path):
    """kv_append="dus" (scalar-indexed XLA updates) must produce the same
    cache contents and logits as the Pallas tile-merge append. Selected
    via the static argument (see test_deferred_step_matches_jnp_step on
    why env flips were vacuous)."""
    from ntransformer_tpu.models.batched import BatchedKV, batched_decode_step
    from ntransformer_tpu.models.loader import load_model
    from tools.make_test_gguf import write_model
    path = str(tmp_path / "t2.gguf")
    write_model(path, "tiny", "q8_0", seed=19)
    m = load_model(path)
    arch, w = m.arch, m.weights
    B = 3
    tokens = jnp.asarray([2, 9, 13], jnp.int32)
    pos = jnp.asarray([1, 4, 32], jnp.int32)
    active = jnp.asarray([True, False, True])
    l_k, kv_k = batched_decode_step(arch, w, BatchedKV.create(arch, B),
                                    tokens, pos, active,
                                    impl="kernel", kv_append="kernel")
    l_d, kv_d = batched_decode_step(arch, w, BatchedKV.create(arch, B),
                                    tokens, pos, active,
                                    impl="kernel", kv_append="dus")
    np.testing.assert_allclose(np.asarray(l_d), np.asarray(l_k),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(kv_d.k).astype(np.float32),
        np.asarray(kv_k.k).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(kv_d.v).astype(np.float32),
        np.asarray(kv_k.v).astype(np.float32))


def test_bulk_append_int8_scales_mixed():
    """Mixed stacked append: 5D int8 code caches (sublane merge) + 4D
    S-minor f32 scale buffers (lane merge) — interpret-mode twin of the
    TPU test; also covers the dus variant."""
    import numpy as np
    from ntransformer_tpu.ops.pallas.kv_update import (
        append_rows_stacked, append_rows_stacked_dus)

    L, B, Hkv, S, D = 3, 4, 2, 128, 32
    rng = np.random.default_rng(13)
    kc = rng.integers(-127, 127, (L, B, Hkv, S, D)).astype(np.int8)
    ks = (rng.random((L, B, Hkv, S)) + 0.5).astype(np.float32)
    rows_c = rng.integers(-127, 127, (L, B, Hkv, 1, D)).astype(np.int8)
    rows_s = (rng.random((L, B, Hkv, 1, 1)) + 0.5).astype(np.float32)
    pos = np.array([0, 40, 127, 64], np.int32)
    active = np.array([True, False, True, True])
    want_c, want_s = kc.copy(), ks.copy()
    for b in range(B):
        if active[b]:
            want_c[:, b, :, pos[b]] = rows_c[:, b, :, 0]
            want_s[:, b, :, pos[b]] = rows_s[:, b, :, 0, 0]
    for fn in (lambda *a: append_rows_stacked(*a, interpret=True),
               append_rows_stacked_dus):
        got_c, got_s = fn((jnp.asarray(kc), jnp.asarray(ks)),
                          (jnp.asarray(rows_c), jnp.asarray(rows_s)),
                          jnp.asarray(pos), jnp.asarray(active))
        np.testing.assert_array_equal(np.asarray(got_c), want_c)
        np.testing.assert_array_equal(np.asarray(got_s), want_s)


# --- speculative verify window (T virtual rows) ------------------------------

def _mk_win(B, Hq, Hkv, S, D, T, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, T, Hq, D)).astype(np.float32)
    k = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    kn = rng.standard_normal((B, Hkv, T, D)).astype(np.float32)
    vn = rng.standard_normal((B, Hkv, T, D)).astype(np.float32)
    return q, k, v, kn, vn


@pytest.mark.parametrize("group", [1, 4])
def test_flash_verify_batched_bf16(group):
    """Kernel (cache [0, pos-1] + T CAUSAL virtual rows) ≡ jnp reference
    with the rows written at [pos, pos+T) (attention_jnp masks by
    position: window token t attends keys [0, pos+t])."""
    from ntransformer_tpu.ops.layers import attention_jnp
    from ntransformer_tpu.ops.pallas.batched_attention import \
        flash_verify_batched
    B, Hkv, S, D, T = 3, 2, 64, 32, 3
    Hq = Hkv * group
    q, k, v, kn, vn = _mk_win(B, Hq, Hkv, S, D, T)
    pos = np.array([0, 17, 61], np.int32)
    kk, vv = k.copy(), v.copy()
    for b in range(B):
        kk[b, :, pos[b]:] = 100.0   # poison: must come from virtual rows
        vv[b, :, pos[b]:] = 100.0
    scale = 1.0 / math.sqrt(D)
    got = np.asarray(flash_verify_batched(
        jnp.asarray(q), jnp.asarray(kk, jnp.bfloat16),
        jnp.asarray(vv, jnp.bfloat16), jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(pos), scale, interpret=True))
    ref_k, ref_v = k.copy(), v.copy()
    knb = np.asarray(jnp.asarray(kn, jnp.bfloat16).astype(jnp.float32))
    vnb = np.asarray(jnp.asarray(vn, jnp.bfloat16).astype(jnp.float32))
    for b in range(B):
        ref_k[b, :, pos[b]:pos[b] + T] = knb[b]
        ref_v[b, :, pos[b]:pos[b] + T] = vnb[b]
    want = np.asarray(jax.vmap(
        attention_jnp, (0, 0, 0, 0, None, None, None, None))(
        jnp.asarray(q), jnp.asarray(ref_k, jnp.bfloat16),
        jnp.asarray(ref_v, jnp.bfloat16), jnp.asarray(pos), T, scale,
        None, 0.0))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_flash_verify_batched_int8_window_softcap_inactive():
    """int8 cache + sliding window + softcap + an INACTIVE slot: frozen
    rows [0, pos+t] attended per window token, virtual rows masked."""
    from ntransformer_tpu.ops.layers import attention_jnp
    from ntransformer_tpu.ops.pallas.batched_attention import \
        flash_verify_batched
    B, Hkv, S, D, T, group = 3, 2, 64, 32, 3, 2
    Hq = Hkv * group
    q, k, v, kn, vn = _mk_win(B, Hq, Hkv, S, D, T, seed=5)
    pos = np.array([2, 30, 59], np.int32)
    act = np.array([1, 0, 1], np.int32)
    win, cap = 24, 30.0
    scale = 1.0 / math.sqrt(D)

    def quant(x):
        s = np.abs(x).max(-1, keepdims=True) / 127.0 + 1e-9
        return np.round(x / s).astype(np.int8), s.astype(np.float32)

    kc, ks = quant(k)
    vc, vs = quant(v)
    knc, kns = quant(kn)
    vnc, vns = quant(vn)
    kcp, vcp = kc.copy(), vc.copy()
    for b in range(B):
        if act[b]:   # inactive slots DO attend their frozen rows >= pos
            kcp[b, :, pos[b]:] = 127
            vcp[b, :, pos[b]:] = 127
    got = np.asarray(flash_verify_batched(
        jnp.asarray(q),
        (jnp.asarray(kcp), jnp.asarray(ks.reshape(B, Hkv, S))),
        (jnp.asarray(vcp), jnp.asarray(vs.reshape(B, Hkv, S))),
        (jnp.asarray(knc), jnp.asarray(kns)),
        (jnp.asarray(vnc), jnp.asarray(vns)),
        jnp.asarray(pos), scale, active=jnp.asarray(act),
        window=jnp.int32(win), softcap=cap, interpret=True))
    ref_kf = kc.astype(np.float32) * ks
    ref_vf = vc.astype(np.float32) * vs
    for b in range(B):
        if act[b]:
            ref_kf[b, :, pos[b]:pos[b] + T] = knc[b].astype(np.float32) * kns[b]
            ref_vf[b, :, pos[b]:pos[b] + T] = vnc[b].astype(np.float32) * vns[b]
    want = np.asarray(jax.vmap(
        attention_jnp, (0, 0, 0, 0, None, None, None, None))(
        jnp.asarray(q),
        jnp.asarray(ref_kf, jnp.bfloat16).astype(jnp.float32),
        jnp.asarray(ref_vf, jnp.bfloat16).astype(jnp.float32),
        jnp.asarray(pos), T, scale, jnp.int32(win), cap))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("quant", [False, True])
def test_deferred_verify_step_matches_jnp_step(tmp_path, quant):
    """The full deferred-write VERIFY step (stacked-cache kernel + causal
    virtual block + post-scan T-row bulk append) reproduces the jnp
    write-then-attend path's logits AND cache contents — including an
    inactive slot with non-zero frozen rows."""
    from ntransformer_tpu.models.batched import (BatchedKV,
                                                 batched_decode_step,
                                                 batched_verify_step)
    from ntransformer_tpu.models.loader import load_model
    from tools.make_test_gguf import write_model
    path = str(tmp_path / "tv.gguf")
    write_model(path, "tiny", "q8_0", seed=31)
    m = load_model(path)
    arch, w = m.arch, m.weights
    B, T = 3, 4
    tokens = jnp.asarray([[3, 7, 11, 2], [5, 1, 9, 4], [8, 8, 2, 6]],
                         jnp.int32)
    # warm both caches with two all-active decode steps (non-zero frozen
    # rows for the inactive slot below)
    kv_j = BatchedKV.create(arch, B, quant=quant)
    kv_n = BatchedKV.create(arch, B, quant=quant)
    act1 = jnp.asarray([True, True, True])
    dtok = jnp.asarray([3, 7, 11], jnp.int32)
    for p in range(2):
        pv = jnp.full((B,), p, jnp.int32)
        _, kv_j = batched_decode_step(arch, w, kv_j, dtok, pv, act1,
                                      impl="jnp")
        _, kv_n = batched_decode_step(arch, w, kv_n, dtok, pv, act1,
                                      impl="kernel")
    pos = jnp.asarray([2, 2, 2], jnp.int32)
    active = jnp.asarray([True, True, False])
    l_ref, kv_j = batched_verify_step(arch, w, kv_j, tokens, pos, active,
                                      impl="jnp")
    l_k, kv_n = batched_verify_step(arch, w, kv_n, tokens, pos, active,
                                    impl="kernel")
    # int8 gets the looser int8-kernel tolerance (the jnp path attends
    # bf16-DEQUANTIZED codes; the kernel folds scales exactly in f32 —
    # activations diverge at bf16 rounding scale, and the re-quantized
    # rows of later layers can flip codes by ±1), matching the wrapper
    # tests above; bf16 caches must agree bitwise.
    tol = 2e-2 if quant else 5e-3
    np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_ref),
                               rtol=tol, atol=tol)
    if quant:
        kd_n = np.asarray(kv_n.k, np.float32) * np.asarray(kv_n.ks)[..., None]
        kd_j = np.asarray(kv_j.k, np.float32) * np.asarray(kv_j.ks)[..., None]
        vd_n = np.asarray(kv_n.v, np.float32) * np.asarray(kv_n.vs)[..., None]
        vd_j = np.asarray(kv_j.v, np.float32) * np.asarray(kv_j.vs)[..., None]
        np.testing.assert_allclose(kd_n, kd_j, atol=2e-2)
        np.testing.assert_allclose(vd_n, vd_j, atol=2e-2)
    else:
        np.testing.assert_array_equal(
            np.asarray(kv_n.k).astype(np.float32),
            np.asarray(kv_j.k).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(kv_n.v).astype(np.float32),
            np.asarray(kv_j.v).astype(np.float32))


def test_flash_decode_s_live_bucket():
    """s_live (the static live-prefix bucket) must be output-identical to
    the full-S dispatch when every attended key fits the bucket — the
    serving loop's bucketed dispatch contract, including a non-2^n rung
    and the inactive-slot frozen-row reach (pos + 1 <= s_live)."""
    B, Hkv, S, D = 3, 2, 512, 32
    group = 2
    Hq = Hkv * group
    q, k, v, kn, vn = _mk(B, Hq, Hkv, S, D, seed=3)
    pos = np.array([0, 101, 183], np.int32)
    scale = 1.0 / math.sqrt(D)
    active = jnp.asarray([True, True, False])
    args = (jnp.asarray(q), jnp.asarray(k, jnp.bfloat16),
            jnp.asarray(v, jnp.bfloat16), jnp.asarray(kn), jnp.asarray(vn),
            jnp.asarray(pos))
    full = np.asarray(flash_decode_batched(
        *args, scale, active=active, interpret=True))
    for s_live in (192, 256, 384):   # 192/384: non-power-of-two rungs
        got = np.asarray(flash_decode_batched(
            *args, scale, active=active, interpret=True, s_live=s_live))
        np.testing.assert_allclose(got, full, rtol=1e-6, atol=1e-6,
                                   err_msg=f"s_live={s_live}")


def test_decode_step_s_live_parity(tmp_path):
    """Production decode step with an s_live bucket ≡ unbucketed, logits
    and caches, int8 KV, over a chained run (the B-scaling fix's
    correctness contract)."""
    from ntransformer_tpu.models.batched import (BatchedKV,
                                                 batched_decode_step)
    from ntransformer_tpu.models.synth import synth_model

    cfg, arch, w = synth_model("tiny", "q8_0", max_seq_len=512)
    B = 2
    kv_a = BatchedKV.create(arch, B, quant=True)
    kv_b = BatchedKV.create(arch, B, quant=True)
    toks = jnp.asarray([3, 7], jnp.int32)
    act = jnp.ones(B, bool)
    for p in range(3):
        pv = jnp.full((B,), 40 + p, jnp.int32)
        la, kv_a = batched_decode_step(arch, w, kv_a, toks, pv, act,
                                       impl="kernel")
        lb, kv_b = batched_decode_step(arch, w, kv_b, toks, pv, act,
                                       impl="kernel", s_live=128)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    np.testing.assert_array_equal(np.asarray(kv_a.k), np.asarray(kv_b.k))
    np.testing.assert_array_equal(np.asarray(kv_a.ks), np.asarray(kv_b.ks))
