"""Batched decode: B sequences, one token each, per-sequence positions.

The reference is strictly batch-1 (SURVEY §0: even prefill loops GEMV per
token); on TPU, batching decode is THE way to move the quantized matmuls
from memory-bound matvecs toward MXU utilization — a batch of B decode
tokens is a [B, K] × [K, N] matmul through the SAME fused dequant kernels
(the weight read is amortized over B sequences). This module is the compute
core for the continuous-batching server (inference/serve.py).

Two step implementations, identical semantics (parity-tested):

  * KERNEL path (TPU): attention reads the STACKED [L, B, Hkv, S, D] cache
    directly inside the batched flash-decode kernel (layer index scalar-
    prefetched — zero per-layer slice copies), the current token's k/v
    rides into the kernel as a virtual block, and ALL layers' cache writes
    happen in ONE bulk in-place Pallas append after the layer scan
    (ops/pallas/kv_update.append_rows_stacked). Writing one row per
    (layer, sequence) inside the scan was measured at 2/3 of the whole
    B=32 step — XLA's scatter lowering, then small-DMA latency, gate it.
  * JNP path (CPU tests / reference semantics): per-layer vmap'd
    dynamic-update-slice write followed by vmap'd attention over the
    full cache.

Inactive slots keep their cache rows frozen via the active mask.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.layers import apply_rope, attention_jnp, rms_norm, swiglu
from ..ops.linear import embed_lookup, qmatmul, use_pallas_default
from .llama import (Arch, KVCache, LayerWeights, ModelWeights, _register,
                    layer_window, moe_ffn)


def _batched_kernels_on() -> bool:
    """The deferred-write kernel path (NT_BATCHED_FLASH=off forces the
    jnp scatter path — A/B harness)."""
    import os
    mode = os.environ.get("NT_BATCHED_FLASH", "auto")
    return use_pallas_default() if mode == "auto" else mode == "on"


def batched_attention(q, kv_k, kv_v, pos, scale, window=None,
                      softcap: float = 0.0):
    """jnp reference attention for a decode batch: q [B, Hq, D]; kv either
    [B, Hkv, S, D] arrays or (codes, scales) tuples for the int8 cache
    (dequantized through bf16 — the kernel path never materializes this);
    pos [B] (the current row is already written: keys [0, pos] live).
    window (traced scalar, shared by the batch — it's a LAYER property) /
    softcap: gemma2/3 sliding-window and score capping.
    Returns [B, Hq, D] f32."""
    B, Hq, D = q.shape
    if isinstance(kv_k, tuple):
        kc, ksc = kv_k
        vc, vsc = kv_v
        if ksc.ndim == kc.ndim - 1:   # S-minor scales [.., Hkv, S]
            ksc, vsc = ksc[..., None], vsc[..., None]
        kf = kc.astype(jnp.bfloat16) * ksc.astype(jnp.bfloat16)
        vf = vc.astype(jnp.bfloat16) * vsc.astype(jnp.bfloat16)
    else:
        kf, vf = kv_k, kv_v
    att = jax.vmap(attention_jnp, (0, 0, 0, 0, None, None, None, None))(
        q.reshape(B, 1, Hq, D), kf, vf, pos, 1, scale, window,
        softcap)                                           # [B, 1, Hq, D]
    return att.reshape(B, Hq, D)


@_register
@dataclass
class BatchedKV:
    k: jnp.ndarray  # [L, B, Hkv, S, D]
    v: jnp.ndarray
    # int8-quantized cache (quant=True): codes int8 + per-(seq, head,
    # position) absmax scales [L, B, Hkv, S] f32 — halves the dominant
    # HBM cost of large-B serving (r1 verdict item 7). S is the MINOR
    # axis on purpose: a trailing size-1 axis ([.., S, 1]) forces the TPU
    # T(8,128) tiled layout to lane-pad it 128x — a 32 MB scale buffer
    # ballooning to a 4 GB layout copy (measured: it alone OOM'd the
    # B=32 step's compile).
    ks: jnp.ndarray | None = None
    vs: jnp.ndarray | None = None

    @classmethod
    def create(cls, arch: Arch, batch: int, dtype=jnp.bfloat16,
               quant: bool = False):
        shape = (arch.n_layers, batch, arch.n_kv_heads, arch.max_seq_len,
                 arch.head_dim)
        if quant:
            sshape = shape[:-1]
            return cls(jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                       jnp.zeros(sshape, jnp.float32),
                       jnp.zeros(sshape, jnp.float32))
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    @property
    def quantized(self) -> bool:
        return self.ks is not None

    def insert(self, slot, kv: KVCache) -> "BatchedKV":
        """Place a single-sequence cache (from prefill) into batch slot
        `slot` IN PLACE (jitted with donation — a host-side .at[].set would
        copy the whole batched cache). The inserted cache's quantization
        must match (both int8 or both bf16)."""
        assert kv.quantized == self.quantized, \
            "prefill cache quantization must match the batched cache"
        return _insert(self, kv, slot)


def _qkv_rows(arch: Arch, x, lw: LayerWeights, cos_t, sin_t, layer):
    """Shared front half of a batched layer: norm + (fused) QKV matmuls +
    rope. x [B, H] (decode) or [B, T, H] (a speculative verify window).
    Returns (q [B,T,Hq,D], k_t [B,Hkv,T,D] f32, v_t [B,Hkv,T,D] f32),
    T=1 for decode; cos_t/sin_t [B, T(, 2 for gemma3's dual tables), d2]."""
    B = x.shape[0]
    T = 1 if x.ndim == 2 else x.shape[1]
    Hq, Hkv, D = arch.n_heads, arch.n_kv_heads, arch.head_dim

    def norm_w(w):
        if layer is not None:
            w = jax.lax.dynamic_index_in_dim(w, layer, 0, keepdims=False)
        # gemma scales by (1 + w); static branch, llama graphs unchanged
        return w if arch.norm_bias == 0.0 else w + arch.norm_bias

    h = rms_norm(x, norm_w(lw.attn_norm), arch.norm_eps).astype(jnp.bfloat16)
    h = h.reshape(B * T, -1)  # matmuls see plain [rows, K]
    if lw.wqkv is not None:
        # fused QKV: one kernel call, slice the concatenated lanes
        qkv = qmatmul(h, lw.wqkv, layer=layer)
        nq, nkv = Hq * D, Hkv * D
        q = qkv[:, :nq].reshape(B, T, Hq, D)
        k = qkv[:, nq: nq + nkv].reshape(B, T, Hkv, D)
        v = qkv[:, nq + nkv:].reshape(B, T, Hkv, D)
    elif lw.wqk is not None:
        qk = qmatmul(h, lw.wqk, layer=layer)
        nq = Hq * D
        q = qk[:, :nq].reshape(B, T, Hq, D)
        k = qk[:, nq:].reshape(B, T, Hkv, D)
        v = qmatmul(h, lw.wv, layer=layer).reshape(B, T, Hkv, D)
    else:
        q = qmatmul(h, lw.wq, layer=layer).reshape(B, T, Hq, D)
        k = qmatmul(h, lw.wk, layer=layer).reshape(B, T, Hkv, D)
        v = qmatmul(h, lw.wv, layer=layer).reshape(B, T, Hkv, D)
    def sel(w):  # layer-select WITHOUT the norm family offset
        if layer is None:
            return w
        return jax.lax.dynamic_index_in_dim(w, layer, 0, keepdims=False)

    if lw.bq is not None:
        # qwen2-family QKV biases, pre-RoPE (HF Qwen2Attention order)
        q = q + sel(lw.bq).reshape(Hq, D)
        k = k + sel(lw.bk).reshape(Hkv, D)
        v = v + sel(lw.bv).reshape(Hkv, D)
    if arch.qk_norm:
        # qwen3/gemma3: per-head RMSNorm over head_dim, pre-RoPE
        q = rms_norm(q, norm_w(lw.q_norm), arch.norm_eps)
        k = rms_norm(k, norm_w(lw.k_norm), arch.norm_eps)
    if cos_t.ndim == 4:
        # dual rope tables [B, 2, 1, d2] (gemma3): select the layer's row
        _, local = layer_window(arch, layer)
        r = jnp.where(local, 1, 0)
        cos_t = jax.lax.dynamic_index_in_dim(cos_t, r, 1, keepdims=False)
        sin_t = jax.lax.dynamic_index_in_dim(sin_t, r, 1, keepdims=False)
    q = jax.vmap(apply_rope, (0, 0, 0, None))(q, cos_t, sin_t,
                                              arch.rope_interleaved)
    k = jax.vmap(apply_rope, (0, 0, 0, None))(k, cos_t, sin_t,
                                              arch.rope_interleaved)
    k_t = jnp.swapaxes(k, 1, 2)  # [B, Hkv, 1, D] f32
    v_t = jnp.swapaxes(v, 1, 2)
    return q, k_t, v_t


def _ffn_tail(arch: Arch, x, att, lw: LayerWeights, layer,
              tp_axis: str | None):
    """Shared back half: o-proj, residual, FFN."""
    B = x.shape[0]
    Hq, D = arch.n_heads, arch.head_dim

    def norm_w(w):
        if layer is not None:
            w = jax.lax.dynamic_index_in_dim(w, layer, 0, keepdims=False)
        # gemma scales by (1 + w); static branch, llama graphs unchanged
        return w if arch.norm_bias == 0.0 else w + arch.norm_bias

    o = qmatmul(att.reshape(-1, Hq * D).astype(jnp.bfloat16), lw.wo,
                layer=layer)
    if tp_axis is not None:
        o = jax.lax.psum(o, tp_axis)
    o = o.reshape(x.shape)  # [B, H] decode / [B, T, H] verify window
    if arch.post_norms:
        # gemma2/3: normalize the block output before its residual add
        o = rms_norm(o, norm_w(lw.attn_post_norm), arch.norm_eps)
    x = x + o
    hf = rms_norm(x, norm_w(lw.ffn_norm), arch.norm_eps).astype(jnp.bfloat16)
    hf = hf.reshape(-1, hf.shape[-1])  # [B(*T), H] rows for the matmuls
    if arch.n_experts:
        # routed FFN: [B, H] plays [T, H]'s role — moe_ffn's dense
        # expert loop weights each sequence's row by its own routing
        # (B decode tokens spread over experts, so the dense loop's
        # weight reads amortize like the batched matmuls themselves)
        assert tp_axis is None, \
            "MoE × TP serving not supported — DP replicates and works"
        dn = moe_ffn(arch, hf, lw, layer)
    else:
        if lw.w_gate_up is not None:
            gu = qmatmul(hf, lw.w_gate_up, layer=layer)
            it = gu.shape[-1] // 2
            g, u = gu[:, :it], gu[:, it:]
        else:
            g = qmatmul(hf, lw.w_gate, layer=layer)
            u = qmatmul(hf, lw.w_up, layer=layer)
        dn = qmatmul(swiglu(g, u, arch.act).astype(jnp.bfloat16), lw.w_down,
                     layer=layer)
        if tp_axis is not None:
            dn = jax.lax.psum(dn, tp_axis)
    dn = dn.reshape(x.shape)
    if arch.post_norms:
        dn = rms_norm(dn, norm_w(lw.ffn_post_norm), arch.norm_eps)
    return x + dn


def _quantize_rows(k_t, v_t):
    """Per-(seq, head, position) absmax int8 quantization of new rows."""
    ks_new = jnp.max(jnp.abs(k_t), -1, keepdims=True) / 127.0 + 1e-9
    vs_new = jnp.max(jnp.abs(v_t), -1, keepdims=True) / 127.0 + 1e-9
    kq = jnp.round(k_t / ks_new).astype(jnp.int8)
    vq = jnp.round(v_t / vs_new).astype(jnp.int8)
    return kq, ks_new, vq, vs_new


def _batched_layer_step(arch: Arch, x, lw: LayerWeights, kv_k, kv_v, pos,
                        active, cos_t, sin_t, layer=None,
                        tp_axis: str | None = None):
    """JNP-path layer step: write rows into the per-layer cache (vmap'd
    dynamic-update-slice — XLA scatter), then attend the full cache.
    x [B, H]; kv [B, Hkv, S, D] (or (codes, scales)); pos/active [B]."""
    B = x.shape[0]
    Hkv, D = arch.n_kv_heads, arch.head_dim
    q, k_t, v_t = _qkv_rows(arch, x, lw, cos_t, sin_t, layer)

    def write(cache, new, p, act):
        # cache [Hkv, S, Dc]; new [Hkv, 1, Dc]; frozen when inactive
        dc = cache.shape[-1]
        cur = jax.lax.dynamic_slice(cache, (0, p, 0), (Hkv, 1, dc))
        return jax.lax.dynamic_update_slice(
            cache, jnp.where(act, new.astype(cache.dtype), cur), (0, p, 0))

    if isinstance(kv_k, tuple):
        kc, ksc = kv_k                      # ksc [B, Hkv, S] (S minor)
        vc, vsc = kv_v
        kq, ks_new, vq, vs_new = _quantize_rows(k_t, v_t)

        def write_sc(cache, new, p, act):
            # cache [Hkv, S]; new [Hkv, 1]; frozen when inactive
            cur = jax.lax.dynamic_slice(cache, (0, p), (Hkv, 1))
            return jax.lax.dynamic_update_slice(
                cache, jnp.where(act, new, cur), (0, p))

        kc = jax.vmap(write)(kc, kq, pos, active)
        ksc = jax.vmap(write_sc)(ksc, ks_new.reshape(B, Hkv, 1), pos, active)
        vc = jax.vmap(write)(vc, vq, pos, active)
        vsc = jax.vmap(write_sc)(vsc, vs_new.reshape(B, Hkv, 1), pos, active)
        kv_k, kv_v = (kc, ksc), (vc, vsc)
    else:
        kv_k = jax.vmap(write)(kv_k, k_t, pos, active)
        kv_v = jax.vmap(write)(kv_v, v_t, pos, active)

    Hq = arch.n_heads
    window, _ = layer_window(arch, layer)
    q_scale = arch.query_scale if arch.query_scale else 1.0 / math.sqrt(D)
    att = batched_attention(q.reshape(B, Hq, D), kv_k, kv_v, pos,
                            q_scale, window=window,
                            softcap=arch.attn_softcap)   # [B, Hq, D]
    x = _ffn_tail(arch, x, att, lw, layer, tp_axis)
    return x, kv_k, kv_v


def _batched_layer_step_deferred(arch: Arch, x, lw: LayerWeights, bkv, pos,
                                 active, cos_t, sin_t, layer,
                                 tp_axis: str | None = None,
                                 s_live: int | None = None):
    """KERNEL-path layer step: the flash kernel reads the STACKED cache
    (layer via scalar prefetch) plus the current token's row as a virtual
    block; NO cache write happens here — the new rows are returned for
    the post-scan bulk append. Returns (x, rows tuple)."""
    from ..ops.pallas.batched_attention import flash_decode_batched
    B = x.shape[0]
    Hq, D = arch.n_heads, arch.head_dim
    q, k_t, v_t = _qkv_rows(arch, x, lw, cos_t, sin_t, layer)
    scale = arch.query_scale if arch.query_scale else 1.0 / math.sqrt(D)
    window, _ = layer_window(arch, layer)
    if bkv.quantized:
        kq, ks_new, vq, vs_new = _quantize_rows(k_t, v_t)
        att = flash_decode_batched(
            q.reshape(B, Hq, D), (bkv.k, bkv.ks), (bkv.v, bkv.vs),
            (kq, ks_new), (vq, vs_new), pos, scale, layer=layer,
            active=active, window=window, softcap=arch.attn_softcap,
            s_live=s_live)
        rows = (kq, ks_new, vq, vs_new)
    else:
        att = flash_decode_batched(
            q.reshape(B, Hq, D), bkv.k, bkv.v, k_t, v_t, pos, scale,
            layer=layer, active=active, window=window,
            softcap=arch.attn_softcap, s_live=s_live)
        rows = (k_t, v_t)
    x = _ffn_tail(arch, x, att, lw, layer, tp_axis)
    return x, rows


@partial(jax.jit, donate_argnames=("bkv",))
def _insert(bkv: "BatchedKV", kv: KVCache, slot):
    if bkv.ks is not None:
        # single-seq scales are [L, Hkv, S, 1]; the batched buffer keeps S
        # minor ([L, B, Hkv, S]) — dropping the trailing size-1 axis is
        # order-preserving
        return BatchedKV(bkv.k.at[:, slot].set(kv.k),
                         bkv.v.at[:, slot].set(kv.v),
                         bkv.ks.at[:, slot].set(kv.ks.reshape(kv.ks.shape[:-1])),
                         bkv.vs.at[:, slot].set(kv.vs.reshape(kv.vs.shape[:-1])))
    return BatchedKV(bkv.k.at[:, slot].set(kv.k),
                     bkv.v.at[:, slot].set(kv.v))


def _resolve_impl(impl: str | None, kv_append: str | None, batch: int = 0):
    """Resolve the implementation switches from the environment OUTSIDE
    any traced code. They become STATIC jit arguments — reading env vars
    inside the traced body latches the first-traced choice for the whole
    process (jax's global trace cache survives even Lowered.clear_cache),
    which made env-flip A/Bs silently compare one path against itself."""
    import os
    if impl is None:
        impl = "kernel" if _batched_kernels_on() else "jnp"
    if kv_append is None:
        # B=1 default is the scalar-indexed DUS (a single in-place row
        # write per cache — the r3 switch A/B measured it ahead on every
        # dtype at B=1); the Pallas tile merge wins at serving batch
        # sizes (3x at B=32) and stays the B>1 default.
        kv_append = os.environ.get("NT_KV_APPEND",
                                   "dus" if batch == 1 else "kernel")
    assert impl in ("kernel", "jnp") and kv_append in ("kernel", "dus")
    return impl, kv_append


def batched_decode_step(arch: Arch, weights: ModelWeights, kv: BatchedKV,
                        tokens: jnp.ndarray, pos: jnp.ndarray,
                        active: jnp.ndarray, tp_axis: str | None = None,
                        impl: str | None = None,
                        kv_append: str | None = None,
                        n_layers: int | None = None,
                        s_live: int | None = None):
    """One decode step for B sequences.

    tokens [B] int32; pos [B] int32 (per-sequence write offset);
    active [B] bool (inactive slots compute but neither write KV nor
    advance). impl: "kernel" (deferred-write Pallas path) | "jnp" |
    None (NT_BATCHED_FLASH / backend default); kv_append: "kernel" |
    "dus" | None (NT_KV_APPEND; default dus at B=1, kernel at B>1).
    n_layers: run only the first n layers (the speculative DRAFT through
    the resident prefix — reference engine.cpp:357-545's tier-A draft);
    KV rows are written for those layers only. s_live (STATIC): the
    live-prefix bucket — caller guarantees max(pos) < s_live (inactive
    slots stay <= s_live - 1 incl. their frozen row); attention then
    neither reads nor visits cache blocks past it (serving dispatches
    per-bucket variants as contexts fill). Returns (logits [B, V] f32,
    BatchedKV).
    """
    impl, kv_append = _resolve_impl(impl, kv_append, tokens.shape[0])
    return _batched_decode_step(arch, weights, kv, tokens, pos, active,
                                tp_axis, impl, kv_append, n_layers,
                                s_live)


def batched_decode_body(arch: Arch, weights: ModelWeights, kv: BatchedKV,
                        tokens, pos, active, tp_axis: str | None = None,
                        impl: str | None = None,
                        kv_append: str | None = None,
                        n_layers: int | None = None):
    """Un-jitted step body for callers that trace it inside their own
    transform (shard_map in parallel/dp.py). Env switches resolve at the
    caller's trace time. n_layers: resident-prefix DRAFT depth (sharded
    speculative serving)."""
    impl, kv_append = _resolve_impl(impl, kv_append, tokens.shape[0])
    return _step_body(arch, weights, kv, tokens, pos, active, tp_axis,
                      impl, kv_append, n_layers)


def batched_verify_body(arch: Arch, weights: ModelWeights, kv: BatchedKV,
                        tokens, pos, active, tp_axis: str | None = None,
                        impl: str | None = None):
    """Un-jitted verify-window body (shard_map callers; see
    batched_verify_step)."""
    impl, _ = _resolve_impl(impl, "dus", tokens.shape[0])
    return _batched_verify_step.__wrapped__(arch, weights, kv, tokens, pos,
                                            active, tp_axis, impl)


@partial(jax.jit, static_argnames=("arch", "tp_axis", "impl", "kv_append",
                                   "n_layers", "s_live"),
         donate_argnames=("kv",))
def _batched_decode_step(arch: Arch, weights: ModelWeights, kv: BatchedKV,
                         tokens: jnp.ndarray, pos: jnp.ndarray,
                         active: jnp.ndarray, tp_axis: str | None,
                         impl: str, kv_append: str,
                         n_layers: int | None = None,
                         s_live: int | None = None):
    return _step_body(arch, weights, kv, tokens, pos, active, tp_axis,
                      impl, kv_append, n_layers, s_live)


def _step_body(arch: Arch, weights: ModelWeights, kv: BatchedKV,
               tokens: jnp.ndarray, pos: jnp.ndarray,
               active: jnp.ndarray, tp_axis: str | None,
               impl: str, kv_append: str, n_layers: int | None = None,
               s_live: int | None = None):
    B = tokens.shape[0]
    x = embed_lookup(weights.embed, tokens, out_dtype=jnp.float32,
                     tp_axis=tp_axis)              # [B, H]
    if arch.embed_scale != 1.0:
        x = x * arch.embed_scale  # gemma: sqrt(hidden)
    d2 = arch.head_dim // 2

    if weights.rope_cos.ndim == 3:
        # dual tables [2, S, d2] (gemma3): per-seq rows of BOTH, the
        # layer step selects by SWA parity
        def rope_rows(p):
            c = jax.lax.dynamic_slice(weights.rope_cos, (0, p, 0),
                                      (2, 1, d2))
            s = jax.lax.dynamic_slice(weights.rope_sin, (0, p, 0),
                                      (2, 1, d2))
            return c, s
        cos_t, sin_t = jax.vmap(rope_rows)(pos)  # [B, 2, 1, d2]
    else:
        def rope_rows(p):
            c = jax.lax.dynamic_slice(weights.rope_cos, (p, 0), (1, d2))
            s = jax.lax.dynamic_slice(weights.rope_sin, (p, 0), (1, d2))
            return c, s
        cos_t, sin_t = jax.vmap(rope_rows)(pos)  # [B, 1, d2]

    n_sel = n_layers if n_layers is not None else arch.n_layers
    indices = jnp.arange(n_sel, dtype=jnp.int32)
    deferred = impl == "kernel"
    if deferred:
        from ..ops.pallas.kv_update import (append_rows_stacked,
                                            append_rows_stacked_dus,
                                            supports)
        caches = ((kv.k, kv.ks, kv.v, kv.vs) if kv.quantized
                  else (kv.k, kv.v))
        deferred = supports(caches)
        if kv_append == "dus" or n_sel < arch.n_layers:
            # a layer-prefix step (speculative draft) writes only its own
            # layers' rows — the DUS variant handles partial-L natively
            # experiment switch: XLA scalar-indexed DUS instead of the
            # Pallas tile merge (A/B for the append-cost bisect)
            def append_rows_stacked(cs, rs, p, a):  # noqa: F811
                return append_rows_stacked_dus(cs, rs, p, a)
    if deferred:
        def body(carry, li):
            x = carry
            x, rows = _batched_layer_step_deferred(
                arch, x, weights.layers, kv, pos, active, cos_t, sin_t,
                layer=li, tp_axis=tp_axis, s_live=s_live)
            return x, rows
        x, rows = jax.lax.scan(body, x, indices)   # rows: [L, B, Hkv, 1, Dc]
        if kv.quantized:
            kc, ksc, vc, vsc = append_rows_stacked(
                (kv.k, kv.ks, kv.v, kv.vs),
                (rows[0], rows[1], rows[2], rows[3]), pos, active)
            new_bkv = BatchedKV(kc, vc, ksc, vsc)
        else:
            nk, nv = append_rows_stacked((kv.k, kv.v), rows, pos, active)
            new_bkv = BatchedKV(nk, nv)
    else:
        def body(carry, inp):
            x = carry
            li, kk, vv = inp
            x, kk, vv = _batched_layer_step(arch, x, weights.layers, kk, vv,
                                            pos, active, cos_t, sin_t,
                                            layer=li, tp_axis=tp_axis)
            return x, (kk, vv)

        take = lambda a: a[:n_sel] if n_sel < arch.n_layers else a
        kv_k = ((take(kv.k), take(kv.ks)) if kv.quantized
                else take(kv.k))
        kv_v = ((take(kv.v), take(kv.vs)) if kv.quantized
                else take(kv.v))
        x, (new_k, new_v) = jax.lax.scan(body, x, (indices, kv_k, kv_v))
        if n_sel < arch.n_layers:
            # layer-prefix step (speculative draft): splice the written
            # prefix back over the untouched suffix
            cat = lambda n, c: jnp.concatenate([n, c[n_sel:]], axis=0)
            if kv.quantized:
                new_bkv = BatchedKV(cat(new_k[0], kv.k), cat(new_v[0], kv.v),
                                    cat(new_k[1], kv.ks),
                                    cat(new_v[1], kv.vs))
            else:
                new_bkv = BatchedKV(cat(new_k, kv.k), cat(new_v, kv.v))
        elif kv.quantized:
            new_bkv = BatchedKV(new_k[0], new_v[0], new_k[1], new_v[1])
        else:
            new_bkv = BatchedKV(new_k, new_v)

    x = rms_norm(x, weights.output_norm + arch.norm_bias
                 if arch.norm_bias != 0.0 else weights.output_norm,
                 arch.norm_eps)
    if tp_axis is not None:
        from ..ops.linear import plane_dims
        kloc, _ = plane_dims(weights.lm_head.planes, weights.lm_head.dtype)
        idx = jax.lax.axis_index(tp_axis)
        xs = jax.lax.dynamic_slice(x, (0, idx * kloc), (x.shape[0], kloc))
        logits = jax.lax.psum(
            qmatmul(xs.astype(jnp.bfloat16), weights.lm_head), tp_axis)
    else:
        logits = qmatmul(x.astype(jnp.bfloat16), weights.lm_head)
    if logits.shape[-1] > arch.vocab_size:
        logits = logits[:, : arch.vocab_size]  # lane-padded LM head
    if arch.final_softcap:
        logits = arch.final_softcap * jnp.tanh(logits / arch.final_softcap)
    return logits, new_bkv


# --- speculative verify window ----------------------------------------------

def _verify_layer_step(arch: Arch, x, lw: LayerWeights, kv_k, kv_v, pos,
                       active, cos_t, sin_t, layer,
                       tp_axis: str | None = None):
    """One layer of the speculative VERIFY window: write T new rows per
    sequence at [pos, pos+T), then attend the full cache (write-then-
    attend, matching the jnp decode path's semantics). x [B, T, H];
    kv [B, Hkv, S, Dc] (or (codes, S-minor scales)); pos/active [B]."""
    B, T, _ = x.shape
    Hkv, D = arch.n_kv_heads, arch.head_dim
    q, k_t, v_t = _qkv_rows(arch, x, lw, cos_t, sin_t, layer)

    def write(cache, new, p, act):
        # cache [Hkv, S, Dc]; new [Hkv, T, Dc]; frozen when inactive
        dc = cache.shape[-1]
        cur = jax.lax.dynamic_slice(cache, (0, p, 0), (Hkv, T, dc))
        return jax.lax.dynamic_update_slice(
            cache, jnp.where(act, new.astype(cache.dtype), cur), (0, p, 0))

    def write_sc(cache, new, p, act):
        # S-minor scale cache [Hkv, S]; new [Hkv, T]
        cur = jax.lax.dynamic_slice(cache, (0, p), (Hkv, T))
        return jax.lax.dynamic_update_slice(
            cache, jnp.where(act, new, cur), (0, p))

    if isinstance(kv_k, tuple):
        kc, ksc = kv_k
        vc, vsc = kv_v
        kq, ks_new, vq, vs_new = _quantize_rows(k_t, v_t)
        kc = jax.vmap(write)(kc, kq, pos, active)
        ksc = jax.vmap(write_sc)(ksc, ks_new.reshape(B, Hkv, T), pos, active)
        vc = jax.vmap(write)(vc, vq, pos, active)
        vsc = jax.vmap(write_sc)(vsc, vs_new.reshape(B, Hkv, T), pos, active)
        kv_k, kv_v = (kc, ksc), (vc, vsc)
        kf = kc.astype(jnp.bfloat16) * ksc[..., None].astype(jnp.bfloat16)
        vf = vc.astype(jnp.bfloat16) * vsc[..., None].astype(jnp.bfloat16)
    else:
        kv_k = jax.vmap(write)(kv_k, k_t, pos, active)
        kv_v = jax.vmap(write)(kv_v, v_t, pos, active)
        kf, vf = kv_k, kv_v

    window, _ = layer_window(arch, layer)
    q_scale = arch.query_scale if arch.query_scale else 1.0 / math.sqrt(D)
    att = jax.vmap(attention_jnp, (0, 0, 0, 0, None, None, None, None))(
        q, kf, vf, pos, T, q_scale, window, arch.attn_softcap)  # [B, T, Hq, D]
    x = _ffn_tail(arch, x, att, lw, layer, tp_axis)
    return x, kv_k, kv_v


def _verify_layer_step_deferred(arch: Arch, x, lw: LayerWeights, bkv, pos,
                                active, cos_t, sin_t, layer,
                                tp_axis: str | None = None,
                                s_live: int | None = None):
    """KERNEL-path verify layer: the flash kernel reads the STACKED cache
    (layer via scalar prefetch) plus the window's T k/v rows as a CAUSAL
    virtual block; no cache write happens here — rows are returned for the
    post-scan bulk append (the decode path's deferred-write contract,
    generalized to T rows). Returns (x [B, T, H], rows tuple)."""
    from ..ops.pallas.batched_attention import flash_verify_batched
    q, k_t, v_t = _qkv_rows(arch, x, lw, cos_t, sin_t, layer)
    D = arch.head_dim
    scale = arch.query_scale if arch.query_scale else 1.0 / math.sqrt(D)
    window, _ = layer_window(arch, layer)
    if bkv.quantized:
        kq, ks_new, vq, vs_new = _quantize_rows(k_t, v_t)
        att = flash_verify_batched(
            q, (bkv.k, bkv.ks), (bkv.v, bkv.vs),
            (kq, ks_new), (vq, vs_new), pos, scale, layer=layer,
            active=active, window=window, softcap=arch.attn_softcap,
            s_live=s_live)
        rows = (kq, ks_new, vq, vs_new)
    else:
        att = flash_verify_batched(
            q, bkv.k, bkv.v, k_t, v_t, pos, scale, layer=layer,
            active=active, window=window, softcap=arch.attn_softcap,
            s_live=s_live)
        rows = (k_t, v_t)
    x = _ffn_tail(arch, x, att, lw, layer, tp_axis)
    return x, rows


def batched_verify_step(arch: Arch, weights: ModelWeights, kv: BatchedKV,
                        tokens: jnp.ndarray, pos: jnp.ndarray,
                        active: jnp.ndarray, tp_axis: str | None = None,
                        impl: str | None = None,
                        s_live: int | None = None):
    """Speculative VERIFY over the whole batch: tokens [B, T] =
    [anchor, draft_0..draft_{T-2}] per sequence, written/attended at
    positions [pos, pos+T). Returns (logits [B, T, V] f32, BatchedKV).

    The anchor re-feed protocol (reference engine.cpp:150-351): rows past
    each sequence's accepted prefix are dead, never attended (attention
    masks by pos) and overwritten by subsequent steps — no KV rollback.

    impl: "kernel" (flash kernel attends the stacked cache + a CAUSAL
    T-row virtual block, ONE bulk T-row append after the scan) | "jnp"
    (per-layer write-then-attend) | None (NT_BATCHED_FLASH / backend
    default — same switch as the decode step).
    """
    impl, _ = _resolve_impl(impl, "dus", tokens.shape[0])
    return _batched_verify_step(arch, weights, kv, tokens, pos, active,
                                tp_axis, impl, s_live)


@partial(jax.jit, static_argnames=("arch", "tp_axis", "impl", "s_live"),
         donate_argnames=("kv",))
def _batched_verify_step(arch: Arch, weights: ModelWeights, kv: BatchedKV,
                         tokens: jnp.ndarray, pos: jnp.ndarray,
                         active: jnp.ndarray, tp_axis: str | None,
                         impl: str, s_live: int | None = None):
    B, T = tokens.shape
    x = embed_lookup(weights.embed, tokens.reshape(-1),
                     out_dtype=jnp.float32, tp_axis=tp_axis)
    x = x.reshape(B, T, -1)
    if arch.embed_scale != 1.0:
        x = x * arch.embed_scale
    d2 = arch.head_dim // 2

    if weights.rope_cos.ndim == 3:
        def rope_rows(p):
            c = jax.lax.dynamic_slice(weights.rope_cos, (0, p, 0),
                                      (2, T, d2))
            s = jax.lax.dynamic_slice(weights.rope_sin, (0, p, 0),
                                      (2, T, d2))
            return c, s
        cos_t, sin_t = jax.vmap(rope_rows)(pos)  # [B, 2, T, d2]
    else:
        def rope_rows(p):
            c = jax.lax.dynamic_slice(weights.rope_cos, (p, 0), (T, d2))
            s = jax.lax.dynamic_slice(weights.rope_sin, (p, 0), (T, d2))
            return c, s
        cos_t, sin_t = jax.vmap(rope_rows)(pos)  # [B, T, d2]

    indices = jnp.arange(arch.n_layers, dtype=jnp.int32)
    deferred = impl == "kernel"
    if deferred:
        from ..ops.pallas.kv_update import append_rows_stacked_dus

        def body(carry, li):
            x = carry
            x, rows = _verify_layer_step_deferred(
                arch, x, weights.layers, kv, pos, active, cos_t, sin_t,
                layer=li, tp_axis=tp_axis, s_live=s_live)
            return x, rows

        # rows: [L, B, Hkv, T, Dc] (+[L, B, Hkv, T, 1] scales) — ONE
        # contiguous T-row DUS per cache after the scan (the Pallas tile
        # merge is a single-row kernel; a T-row window can straddle
        # sublane tiles)
        x, rows = jax.lax.scan(body, x, indices)
        if kv.quantized:
            kc, ksc, vc, vsc = append_rows_stacked_dus(
                (kv.k, kv.ks, kv.v, kv.vs),
                (rows[0], rows[1], rows[2], rows[3]), pos, active)
            new_bkv = BatchedKV(kc, vc, ksc, vsc)
        else:
            nk, nv = append_rows_stacked_dus((kv.k, kv.v), rows, pos,
                                             active)
            new_bkv = BatchedKV(nk, nv)
    else:
        def body(carry, inp):
            x = carry
            li, kk, vv = inp
            x, kk, vv = _verify_layer_step(arch, x, weights.layers, kk, vv,
                                           pos, active, cos_t, sin_t,
                                           layer=li, tp_axis=tp_axis)
            return x, (kk, vv)

        kv_k = (kv.k, kv.ks) if kv.quantized else kv.k
        kv_v = (kv.v, kv.vs) if kv.quantized else kv.v
        x, (new_k, new_v) = jax.lax.scan(body, x, (indices, kv_k, kv_v))
        if kv.quantized:
            new_bkv = BatchedKV(new_k[0], new_v[0], new_k[1], new_v[1])
        else:
            new_bkv = BatchedKV(new_k, new_v)

    x = rms_norm(x, weights.output_norm + arch.norm_bias
                 if arch.norm_bias != 0.0 else weights.output_norm,
                 arch.norm_eps)
    logits = qmatmul(x.reshape(B * T, -1).astype(jnp.bfloat16),
                     weights.lm_head)
    if logits.shape[-1] > arch.vocab_size:
        logits = logits[:, : arch.vocab_size]  # lane-padded LM head
    if arch.final_softcap:
        logits = arch.final_softcap * jnp.tanh(logits / arch.final_softcap)
    return logits.reshape(B, T, -1), new_bkv
