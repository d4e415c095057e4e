"""Parity: Pallas flash attention (interpret mode) vs the jnp reference.

Covers decode (T=1), prefill (T>1), GQA groups, nonzero pos, and the
partially-masked last block — the cases the reference exercises through
attention.cu's decode/prefill kernels.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ntransformer_tpu.ops.layers import attention_jnp
from ntransformer_tpu.ops.pallas.attention import flash_attention


def _mk(seed, t, hq, hkv, s, d, cache_dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((t, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((hkv, s, d)), cache_dtype)
    v = jnp.asarray(rng.standard_normal((hkv, s, d)), cache_dtype)
    return q, k, v


@pytest.mark.parametrize("t,pos", [(1, 0), (1, 17), (1, 255), (8, 0),
                                   (8, 100), (16, 240)])
def test_flash_vs_jnp_f32(t, pos):
    hq, hkv, s, d = 8, 4, 256, 128
    q, k, v = _mk(0, t, hq, hkv, s, d)
    scale = 1.0 / np.sqrt(d)
    ref = attention_jnp(q, k, v, pos, t, scale)
    out = flash_attention(q, k, v, pos, t, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_gqa_group1_and_8():
    s, d = 128, 64
    for hq, hkv in [(4, 4), (8, 1)]:
        q, k, v = _mk(1, 4, hq, hkv, s, d)
        ref = attention_jnp(q, k, v, 31, 4, 0.125)
        out = flash_attention(q, k, v, 31, 4, 0.125, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_flash_bf16_cache():
    q, k, v = _mk(2, 1, 8, 2, 256, 128, cache_dtype=jnp.bfloat16)
    ref = attention_jnp(q, k, v, 60, 1, 0.1)
    out = flash_attention(q, k, v, 60, 1, 0.1, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


def test_flash_traced_pos():
    """pos must be traceable (it is traced inside the decode scan)."""
    q, k, v = _mk(3, 1, 4, 2, 128, 64)

    @jax.jit
    def f(pos):
        return flash_attention(q, k, v, pos, 1, 0.2, interpret=True)

    ref = attention_jnp(q, k, v, 42, 1, 0.2)
    np.testing.assert_allclose(np.asarray(f(jnp.int32(42))), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("t,pos,window", [(1, 100, 16), (8, 64, 16),
                                          (16, 240, 32), (8, 0, 8),
                                          (1, 7, 64)])  # window > pos+1
def test_flash_sliding_window(t, pos, window):
    """Sliding-window masking (gemma2 local layers): the window is a
    DYNAMIC kernel operand, and blocks entirely below the window must be
    skipped without corrupting the online softmax."""
    hq, hkv, s, d = 8, 4, 256, 64
    q, k, v = _mk(3, t, hq, hkv, s, d)
    scale = 1.0 / np.sqrt(d)
    ref = attention_jnp(q, k, v, pos, t, scale, window=window)
    out = flash_attention(q, k, v, pos, t, scale, interpret=True,
                          window=window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_softcap():
    """Attention-score softcapping (gemma2): cap*tanh(s/cap) pre-mask."""
    hq, hkv, s, d = 8, 4, 256, 64
    q, k, v = _mk(4, 8, hq, hkv, s, d)
    # big q values so tanh saturation is visible
    q = q * 8.0
    scale = 1.0 / np.sqrt(d)
    ref = attention_jnp(q, k, v, 100, 8, scale, softcap=50.0)
    out = flash_attention(q, k, v, 100, 8, scale, interpret=True,
                          softcap=50.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # and it genuinely differs from the uncapped result
    un = flash_attention(q, k, v, 100, 8, scale, interpret=True)
    assert not np.allclose(np.asarray(out), np.asarray(un), atol=1e-4)


def test_flash_traced_window_one_program():
    """gemma2's per-layer local/global alternation must reuse ONE compiled
    program: window rides the SMEM operand, so tracing with different
    traced window values compiles once (mirrors test_flash_traced_pos)."""
    hq, hkv, s, d = 4, 4, 128, 64
    q, k, v = _mk(5, 1, hq, hkv, s, d)

    calls = []

    @jax.jit
    def f(window):
        calls.append(1)
        return flash_attention(q, k, v, 90, 1, 0.125, interpret=True,
                               window=window)

    o_local = f(jnp.int32(16))
    o_global = f(jnp.int32(2**30))
    assert len(calls) == 1  # one trace → one program
    ref_l = attention_jnp(q, k, v, 90, 1, 0.125, window=jnp.int32(16))
    ref_g = attention_jnp(q, k, v, 90, 1, 0.125)
    np.testing.assert_allclose(np.asarray(o_local), np.asarray(ref_l),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(o_global), np.asarray(ref_g),
                               rtol=2e-5, atol=2e-5)
