"""Blockwise flash attention Pallas kernel (decode + prefill, GQA).

TPU-native replacement for the reference's smem-softmax attention kernels
(src/cuda/attention.cu:108-311). The reference holds one head's full score
row in shared memory, hard-capping context at ~16K positions (SURVEY §5.7);
here both the query and KV dimensions are blocked and the KV cache streams
through VMEM with an online softmax (the math of the reference's unused
`flash_decode_kernel`, attention.cu:22-101), so context is bounded only by
HBM capacity.

Layout: the KV cache is stored [Hkv, S, D] so each (head, kv-block) tile is
a natural (block_s, D) VMEM tile — no transposes on the hot path. All
`group = Hq/Hkv` query heads of one KV head are processed together as a
[group*block_t, D] q tile, so GQA costs one pass over the cache per KV head
(the reference maps kv_head = head/group per block, attention.cu:122).

Grid (Hkv, T/block_t, S/block_s): KV blocks innermost; running (m, l, acc)
live in VMEM scratch across the KV-block loop and reset at each new q block.
Causal masking is positional (key_pos <= pos + t); KV blocks entirely past a
q block's last position are skipped with pl.when, so causal prefill does
~half the block work and decode at position p touches ceil((p+1)/block_s)
blocks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _attn_kernel(pos_ref, *refs, scale, block_t, block_s, n_kv_blocks, group,
                 partials, softcap):
    if partials:
        q_ref, k_ref, v_ref, o_ref, mo_ref, lo_ref, m_ref, l_ref, acc_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref = refs
    i = pl.program_id(1)          # q block
    j = pl.program_id(2)          # kv block
    gt = group * block_t

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pos = pos_ref[0]
    # keys in this cache are GLOBAL positions offset + local index (offset
    # is nonzero under context parallelism: sequence-sharded cache)
    offset = pos_ref[1]
    # sliding window (dynamic: gemma2 alternates local/global per layer
    # inside one scan body — a "global" layer passes a huge window).
    # Query t sees keys in (qpos - window, qpos].
    window = pos_ref[2]
    # last valid key for this q block: pos + i*block_t + block_t - 1
    max_kpos = pos + (i + 1) * block_t - 1
    # first key any query in this block can see: lowest qpos - window + 1
    min_kpos = pos + i * block_t - window + 1

    @pl.when((offset + j * block_s <= max_kpos)
             & (offset + (j + 1) * block_s - 1 >= min_kpos))
    def _block():
        q = q_ref[0].reshape(gt, q_ref.shape[-1])   # [g*BT, D]
        k = k_ref[0]                                # [BS, D]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=F32) * scale     # [g*BT, BS]
        if softcap:
            s = softcap * jnp.tanh(s * (1.0 / softcap))
        kpos = (offset + j * block_s
                + jax.lax.broadcasted_iota(jnp.int32, (gt, block_s), 1))
        # row r = g*BT + t ; query position = pos + i*block_t + (r % BT)
        qpos = (pos + i * block_t
                + jax.lax.broadcasted_iota(jnp.int32, (gt, block_s), 0) % block_t)
        s = jnp.where((kpos <= qpos) & (kpos > qpos - window), s, NEG_INF)

        m_prev = m_ref[:][:, :1]                          # [gT, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_ref[:][:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=F32)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == n_kv_blocks - 1)
    def _finish():
        if partials:
            # UNNORMALIZED accumulator + (m, l) rows — the caller combines
            # shards exactly (ops/layers.attention_cp_flash); a shard whose
            # keys are all masked exports acc=0, m=NEG_INF, l=0 and drops
            # out of the psum combine with no NaN.
            o_ref[0] = acc_ref[:].reshape(o_ref.shape[1:]).astype(o_ref.dtype)
            mo_ref[0] = m_ref[:][:, :1].reshape(mo_ref.shape[1:])
            lo_ref[0] = l_ref[:][:, :1].reshape(lo_ref.shape[1:])
        else:
            out = acc_ref[:] / l_ref[:][:, :1]
            o_ref[0] = out.reshape(o_ref.shape[1:]).astype(o_ref.dtype)


def _pick_block(s: int, candidates) -> int:
    for c in candidates:
        if s % c == 0:
            return c
    raise ValueError(f"dim {s} not tileable by {candidates}")


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "partials",
                                             "softcap"))
def _flash_impl(q, k_cache, v_cache, pos, *, scale, interpret,
                kpos_offset=0, partials=False, window=None, softcap=0.0):
    hkv, group, t, d = q.shape
    _, s, _ = k_cache.shape
    block_s = _pick_block(s, (512, 256, 128, 64, 32, 16, 8))
    # cap the q tile so (group*block_t) x block_s f32 scores stay ~2 MB.
    # Mosaic wants sublane blocks divisible by 8 or spanning the whole dim —
    # odd T (decode T=1, unbucketed prefill) uses one whole-T block.
    bt_max = max(8, 1024 // group)
    if t % 8 == 0:
        block_t = _pick_block(t, tuple(c for c in (256, 128, 64, 32, 16, 8)
                                       if c <= bt_max))
    else:
        block_t = t
    n_kv_blocks = s // block_s
    grid = (hkv, t // block_t, n_kv_blocks)

    kernel = functools.partial(_attn_kernel, scale=scale, block_t=block_t,
                               block_s=block_s, n_kv_blocks=n_kv_blocks,
                               group=group, partials=partials,
                               softcap=softcap)
    o_spec = pl.BlockSpec((1, group, block_t, d),
                          lambda h, i, j: (h, 0, i, 0),
                          memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((hkv, group, t, d), F32)
    if partials:
        ml_spec = pl.BlockSpec((1, group, block_t, 1),
                               lambda h, i, j: (h, 0, i, 0),
                               memory_space=pltpu.VMEM)
        ml_shape = jax.ShapeDtypeStruct((hkv, group, t, 1), F32)
        out_shape = (out_shape, ml_shape, ml_shape)
        out_specs = (o_spec, ml_spec, ml_spec)
    else:
        out_specs = o_spec
    # no window = a window larger than any context (masks nothing)
    w = jnp.int32(2**30) if window is None else jnp.asarray(window, jnp.int32)
    pos_arr = jnp.stack([jnp.asarray(pos, jnp.int32),
                         jnp.asarray(kpos_offset, jnp.int32), w])
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # [pos, kpos_offset]
            pl.BlockSpec((1, group, block_t, d), lambda h, i, j: (h, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_s, d), lambda h, i, j: (h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_s, d), lambda h, i, j: (h, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((group * block_t, 128), F32),  # running max
            pltpu.VMEM((group * block_t, 128), F32),  # running denom
            pltpu.VMEM((group * block_t, d), F32),    # output accumulator
        ],
        interpret=interpret,
    )(pos_arr, q, k_cache, v_cache)
    return out


def flash_attention(q: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                    pos, q_len: int, scale: float, *,
                    interpret: bool | None = None,
                    window=None, softcap: float = 0.0) -> jnp.ndarray:
    """Causal GQA flash attention over the full cache buffer.

    q [T, Hq, D] (any float dtype); k_cache/v_cache [Hkv, S, D];
    pos = write offset of q[0] in the cache. Returns [T, Hq, D] f32.

    window (traced int scalar or None): sliding-window attention — query t
    sees keys in (qpos - window, qpos]. Dynamic (SMEM operand) so gemma2's
    per-layer local/global alternation shares one compiled kernel; KV
    blocks fully outside [qpos-window+1, qpos] are skipped either way.
    softcap (static float): softcap*tanh(scores/softcap) pre-masking.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t, hq, d = q.shape
    hkv = k_cache.shape[0]
    group = hq // hkv
    # [T, Hq, D] -> [Hkv, group, T, D]
    qr = jnp.swapaxes(q, 0, 1).reshape(hkv, group, t, d).astype(k_cache.dtype)
    out = _flash_impl(qr, k_cache, v_cache, pos, scale=scale,
                      interpret=interpret, window=window, softcap=softcap)
    # [Hkv, group, T, D] -> [T, Hq, D]
    return jnp.swapaxes(out.reshape(hq, t, d), 0, 1)


def flash_attention_partials(q, k_local, v_local, pos, scale: float, *,
                             kpos_offset, interpret: bool | None = None):
    """One shard's flash pass over a sequence-sharded cache: keys in
    k_local are GLOBAL positions kpos_offset + i. Returns UNNORMALIZED
    (acc [T, Hq, D], m [T, Hq], l [T, Hq]) f32 for the exact cross-shard
    online-softmax combine (ops/layers.attention_cp_flash)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t, hq, d = q.shape
    hkv = k_local.shape[0]
    group = hq // hkv
    qr = jnp.swapaxes(q, 0, 1).reshape(hkv, group, t, d).astype(k_local.dtype)
    acc, m, l = _flash_impl(qr, k_local, v_local, pos, scale=scale,
                            interpret=interpret, kpos_offset=kpos_offset,
                            partials=True)

    def back(x):  # [Hkv, group, T, c] -> [T, Hq, c]
        return jnp.swapaxes(x.reshape(hq, t, x.shape[-1]), 0, 1)
    return back(acc), back(m)[..., 0], back(l)[..., 0]
