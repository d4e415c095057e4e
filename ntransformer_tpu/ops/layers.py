"""Elementwise transformer ops: RMSNorm, RoPE, SwiGLU, attention (jnp).

These are deliberately plain jnp — XLA fuses them into adjacent matmuls
(SURVEY.md §7: "RMSNorm/RoPE/SwiGLU → jnp ops fused by XLA"). Attention has
a Pallas flash path in ops/pallas/attention.py; this module holds the
reference jnp implementation used on CPU and for parity tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """RMSNorm in f32 accumulation (ref: src/cuda/rmsnorm.cu)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)).astype(x.dtype)


def rope_table(max_seq: int, head_dim: int, theta: float,
               freq_factors=None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Precomputed (cos, sin) tables [max_seq, head_dim//2], f32.

    freq_factors [head_dim//2]: per-frequency divisors from the GGUF's
    `rope_freqs.weight` tensor (llama.cpp's baked Llama-3.1 long-context
    rope scaling) — the reference ignores this tensor; real 3.1 models
    need it beyond the original 8K context."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    if freq_factors is not None:
        inv_freq = inv_freq / jnp.asarray(freq_factors, jnp.float32)
    t = jnp.arange(max_seq, dtype=jnp.float32)
    ang = jnp.outer(t, inv_freq)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
               interleaved: bool = False) -> jnp.ndarray:
    """Rotary embedding. x [T, H, D]; cos/sin [T, D/2].

    interleaved=False: HALF-SPLIT pairs (i, i+D/2) — HF rotate_half /
    ggml ROPE_TYPE_NEOX (qwen2, gpt-neox, this repo's own unpermuted
    writers). interleaved=True: ADJACENT pairs (2i, 2i+1) — ggml
    ROPE_TYPE_NORM, the order llama.cpp's converter permutes llama q/k
    rows into. The per-arch default lives in models/config.py
    from_gguf_metadata; kernel shapes match ref src/cuda/rotary.cu.
    """
    d2 = x.shape[-1] // 2
    xf = x.astype(jnp.float32)
    c = cos[:, None, :]
    s = sin[:, None, :]
    if interleaved:
        x0 = xf[..., 0::2]
        x1 = xf[..., 1::2]
        r0 = x0 * c - x1 * s
        r1 = x0 * s + x1 * c
        out = jnp.stack([r0, r1], axis=-1).reshape(x.shape)
    else:
        x0 = xf[..., :d2]
        x1 = xf[..., d2:]
        r0 = x0 * c - x1 * s
        r1 = x0 * s + x1 * c
        out = jnp.concatenate([r0, r1], axis=-1)
    return out.astype(x.dtype)


def swiglu(gate: jnp.ndarray, up: jnp.ndarray,
           act: str = "silu") -> jnp.ndarray:
    """act(gate) * up. silu (llama/qwen2, ref src/cuda/gemm.cu:699-725)
    or gelu_tanh (gemma — ggml's GELU is the tanh approximation)."""
    g = gate.astype(jnp.float32)
    if act == "gelu_tanh":
        return jax.nn.gelu(g, approximate=True) * up.astype(jnp.float32)
    return (g * jax.nn.sigmoid(g) * up.astype(jnp.float32))


def attention_jnp(q: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                  pos_start, q_len: int, scale: float,
                  window=None, softcap: float = 0.0) -> jnp.ndarray:
    """Masked GQA attention over the full KV cache buffer.

    q [T, Hq, D]; k_cache/v_cache [Hkv, S, D] (padded to max_seq).
    Causal: query t attends keys [0, pos_start + t]. Returns [T, Hq, D] f32.

    window (traced int scalar or None): sliding-window attention — query t
    additionally attends only keys > q_pos - window (gemma2 local layers).
    softcap (static float): scores become softcap*tanh(scores/softcap)
    BEFORE masking (gemma2 attn_logit_softcapping).
    """
    T, Hq, D = q.shape
    Hkv, S, _ = k_cache.shape
    group = Hq // Hkv
    qf = q.astype(jnp.float32).reshape(T, Hkv, group, D)
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)
    scores = jnp.einsum("thgd,hsd->hgts", qf, kf) * scale  # [Hkv, g, T, S]
    if softcap:
        scores = softcap * jnp.tanh(scores / softcap)
    key_pos = jnp.arange(S)[None, :]
    q_pos = pos_start + jnp.arange(T)[:, None]
    mask = key_pos <= q_pos  # [T, S]
    if window is not None:
        mask = mask & (key_pos > q_pos - window)
    scores = jnp.where(mask[None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hgts,hsd->thgd", probs, vf)
    return out.reshape(T, Hq, D)


def attention_cp(q: jnp.ndarray, k_local: jnp.ndarray, v_local: jnp.ndarray,
                 pos_start, q_len: int, scale: float, cp_axis: str,
                 s_local: int) -> jnp.ndarray:
    """Context-parallel GQA attention: the KV cache is sharded along the
    SEQUENCE axis over `cp_axis` (each shard holds s_local positions);
    shards compute local online-softmax partials and combine them exactly
    with two psums — context length is then bounded by the mesh's aggregate
    HBM, not one chip's. (Blockwise-parallel attention over ICI; no ring
    needed for the decode/prefill pattern since KV is static per step.)

    q [T, Hq, D] replicated; k_local/v_local [Hkv, s_local, D].
    Returns [T, Hq, D] f32 replicated.
    """
    T, Hq, D = q.shape
    Hkv = k_local.shape[0]
    group = Hq // Hkv
    shard = jax.lax.axis_index(cp_axis)
    qf = q.astype(jnp.float32).reshape(T, Hkv, group, D)
    kf = k_local.astype(jnp.float32)
    vf = v_local.astype(jnp.float32)
    scores = jnp.einsum("thgd,hsd->hgts", qf, kf) * scale  # [Hkv,g,T,Sl]
    key_pos = shard * s_local + jnp.arange(s_local)[None, :]
    q_pos = pos_start + jnp.arange(T)[:, None]
    scores = jnp.where((key_pos <= q_pos)[None, None], scores, -jnp.inf)
    m_local = jnp.max(scores, axis=-1)                      # [Hkv,g,T]
    m = jax.lax.pmax(m_local, cp_axis)
    # guard fully-masked shards (exp(-inf - m) -> 0 works; m can't be -inf
    # globally because key 0 is always valid)
    p = jnp.exp(scores - m[..., None])
    l = jax.lax.psum(jnp.sum(p, axis=-1), cp_axis)          # [Hkv,g,T]
    o = jax.lax.psum(jnp.einsum("hgts,hsd->thgd", p, vf), cp_axis)
    out = o / jnp.transpose(l, (2, 0, 1))[..., None]
    return out.reshape(T, Hq, D)


def attention_cp_flash(q, k_local, v_local, pos_start, q_len: int,
                       scale: float, cp_axis: str, s_local: int):
    """Flash attention under context parallelism: each shard runs the
    Pallas kernel over its LOCAL cache slice (global key positions =
    shard*s_local + i, with the kernel's causal block-skip intact), then
    the shards combine their UNNORMALIZED partials exactly — pmax for the
    global max, two psums for denominator and accumulator. Same math as
    attention_cp with the per-shard score materialization replaced by the
    blockwise kernel, so CP no longer forfeits flash (r2 weak #6)."""
    from .pallas.attention import flash_attention_partials
    shard = jax.lax.axis_index(cp_axis)
    acc, m, l = flash_attention_partials(q, k_local, v_local, pos_start,
                                         scale, kpos_offset=shard * s_local)
    m_g = jax.lax.pmax(m, cp_axis)                       # [T, Hq]
    w = jnp.exp(m - m_g)
    l_g = jax.lax.psum(l * w, cp_axis)
    out = jax.lax.psum(acc * w[..., None], cp_axis)
    return out / l_g[..., None]


def attention_cp_dispatch(q, k_local, v_local, pos_start, q_len: int,
                          scale: float, cp_axis: str, s_local: int):
    """CP attention dispatch, mirroring `attention`: the flash kernel for
    prefill-sized q on TPU, the jnp partial combine otherwise."""
    from .linear import use_pallas_default
    if use_pallas_default() and q_len >= 64:
        return attention_cp_flash(q, k_local, v_local, pos_start, q_len,
                                  scale, cp_axis, s_local)
    return attention_cp(q, k_local, v_local, pos_start, q_len, scale,
                        cp_axis, s_local)


def attention(q: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
              pos_start, q_len: int, scale: float,
              use_flash: bool | None = None,
              window=None, softcap: float = 0.0) -> jnp.ndarray:
    """Attention dispatch: Pallas flash kernel on TPU for prefill-sized q
    (blocked q×kv, causal block skipping); jnp for decode-sized q, where the
    [T, S] score tile is small and XLA's fused path measured faster, and as
    the CPU reference. window/softcap (gemma2) route through the flash
    kernel's masked path too — window rides the scalar-prefetch operand, so
    one compiled kernel serves both SWA parities of the layer scan."""
    if use_flash is None:
        from .linear import use_pallas_default
        use_flash = use_pallas_default() and q_len >= 64
    if use_flash:
        from .pallas.attention import flash_attention
        return flash_attention(q, k_cache, v_cache, pos_start, q_len, scale,
                               window=window, softcap=softcap)
    return attention_jnp(q, k_cache, v_cache, pos_start, q_len, scale,
                         window=window, softcap=softcap)
