"""Batched flash-decode Pallas kernel: B sequences, one query token each,
per-sequence positions — the serving path's attention (models/batched.py).

The reference cannot batch at all (SURVEY §0: strictly batch-1; its unused
online-softmax math is src/cuda/attention.cu:22-101). This kernel is the
TPU-native design for continuous batching:

  * grid (B, S/block_s) with the KV-block loop innermost. Each grid step
    streams one [Hkv, block_s, D] K tile + V tile for one sequence; all
    Hkv heads are processed in-step (unrolled), so per-grid-step DMA stays
    MB-scale and the ~1.5 us/step grid overhead is amortized.
  * the cache may be STACKED over layers ([L, B, Hkv, S, D]) with the
    layer index scalar-prefetched into the index maps — the model's layer
    scan reads attention blocks straight from the stacked cache with zero
    per-layer slice copies (same trick as the stacked-plane matmuls).
  * per-sequence positions ride in as SCALAR PREFETCH: the K/V BlockSpec
    index maps clamp the block index to each sequence's own last live
    block, so KV blocks past a sequence's position repeat the previous
    block index and Mosaic ELIDES their DMA — a sequence at position p
    reads ceil(p/block_s) blocks, not S/block_s.
  * the CURRENT token's k/v row arrives as a separate tiny input (a
    "virtual block" folded into the online softmax at the last grid
    step) — the cache write itself is DEFERRED and batched across all
    layers by ops/pallas/kv_update.append_rows_stacked, because writing
    one row per (layer, sequence) inside the scan is latency-bound
    (measured 2/3 of the whole B=32 step).
  * int8 KV cache: the kernel dots the int8 CODES directly and folds the
    per-position scales into the score columns (k) and prob columns (v) —
    exact, because the scales are per (head, position):
        q·(codes_k ⊙ s_k) = (q·codes_k) ⊙ s_k^T
        p·(codes_v ⊙ s_v) = (p ⊙ s_v^T)·codes_v
    No dequantized cache is ever materialized.

Scales are stored S-MINOR as [.., Hkv, S]: each tile is a natural
[block_s]-lane vector, and — critically — the layout is compact. A
trailing size-1 axis ([.., S, 1]) makes the TPU T(8,128) tiling lane-pad
it 128x: a 32 MB scale buffer balloons to a 4 GB layout copy (measured —
it alone OOM'd the B=32 step's compile).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
I8 = jnp.int8
I32 = jnp.int32
NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _attn_dot_default() -> str:
    """Cache-dot implementation for the int8 cache (read at TRACE time):

      "f32"  — dequantize tiles on the VPU, f32 MXU dots (exact given the
               int8 cache; bit-matches the jnp path).
      "int8" — dot the int8 CODES on the MXU: q quantized per row for the
               score dot, p (with the v scales folded in) quantized per row
               for the output dot; the softmax max/denominator stay exact
               f32. Removes the per-tile int8->f32 cast — the measured
               VPU bottleneck at large B (experiments/b64_bisect.py: the
               cast is ~3 us/grid-step, attention 7.4 of the 22.8 ms B=64
               step). Adds ~0.4% relative error on the attention output —
               the same order as the int8 cache quantization itself.
    """
    import os
    return os.environ.get("NT_ATTN_DOT", "f32")


def _pick_block_s(s: int, per_pos_bytes: int, target_bytes: int | None = None) -> int:
    """Largest power-of-two divisor of S whose K tile stays ~target_bytes
    (bigger blocks amortize grid overhead; smaller blocks skip more dead
    positions via the index-map clamp's DMA elision). Read at TRACE time;
    NT_ATTN_BLOCK_TARGET (bytes) overrides for A/B sweeps."""
    if target_bytes is None:
        import os
        target_bytes = int(os.environ.get("NT_ATTN_BLOCK_TARGET", 1 << 21))
    if s * per_pos_bytes <= target_bytes:
        return s  # one whole-prefix block (s_live buckets need not be 2^n)
    best = None
    c = 8
    while c <= s:
        if s % c == 0 and (best is None or c * per_pos_bytes <= target_bytes):
            best = c
        c *= 2
    if best is None:
        best = s  # tiny caches (tests): one whole-S block
    return best


def _kernel(scal_ref, *refs, scale, block_s, n_blocks, hkv, group, quant,
            softcap, n_virtual=1, dot_impl="f32"):
    """n_virtual = T new (not-yet-written) rows per sequence. T=1 is the
    decode step; T>1 is the speculative VERIFY window: query rows are
    token-major ([T*group] per head), row r belongs to window token
    r // group (at position pos + r//group), and virtual row i is visible
    to window tokens >= i (causal within the window).

    ALL Hkv heads are processed in ONE dot pair per grid step: q rows of
    every head stack into [Hkv*rows, D], the K/V tiles flatten into
    [Hkv*block_s, D] (leading-dim merges — free in VMEM), and a
    block-diagonal head-match mask drives the cross-head score columns to
    exp(NEG_INF)=0, so one [R, Hkv*block_s] score dot and one
    [R, Hkv*block_s]x[Hkv*block_s, D] output dot replace 2*Hkv small
    dots. The cross-head MXU work is ~Hkv x but decode dots are tiny
    (~0.3 us/step at 8 heads); what it buys is ~8x fewer VPU ops and
    full-sublane [32+, lanes] vectors instead of [4, lanes] — the
    per-grid-step fixed cost was the measured bottleneck at serving batch
    sizes (experiments/attn_variants.py: 5.5 ms for a 4.4 GB B=64 scan =
    803 GB/s, DMA-bound only at whole-S blocks; smaller blocks were
    step-overhead-bound, killing the dead-position DMA elision)."""
    if quant:
        (q_ref, k_ref, v_ref, ks_ref, vs_ref, kn_ref, vn_ref, kns_ref,
         vns_ref, o_ref, m_ref, l_ref, acc_ref) = refs
    else:
        q_ref, k_ref, v_ref, kn_ref, vn_ref, o_ref, m_ref, l_ref, acc_ref = refs
        ks_ref = vs_ref = kns_ref = vns_ref = None
    rows = group * n_virtual
    R = hkv * rows
    C = hkv * block_s
    b = pl.program_id(0)
    j = pl.program_id(1)
    d = q_ref.shape[-1]

    def flat_kv(ref):
        """[.., hkv, block_s, D] tile -> [hkv*block_s, D] (leading merge)."""
        return ref[0, 0].reshape(C, d) if len(ref.shape) == 5 \
            else ref[0].reshape(C, d)

    def flat_sc(ref):
        """[.., hkv, block_s] scale tile -> [1, hkv*block_s]."""
        return ref[0, 0].reshape(1, C) if len(ref.shape) == 4 \
            else ref[0].reshape(1, C)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pos = scal_ref[1, b]  # the window base; cache keys are < pos
    # active flag: ACTIVE slots attend cache [0, pos-1] plus the virtual
    # rows; INACTIVE slots attend the FROZEN cache (window token t sees
    # [0, pos+t]) and the virtual rows are masked out — bit-matching the
    # jnp path's masked-write-then-attend semantics (the write kernel
    # also freezes inactive rows).
    act = scal_ref[2, b]
    # sliding window (dynamic — gemma2/3 alternate local/global per layer
    # inside one scan body): the query at pos+t sees keys in
    # (pos + t - win, pos + t]. Global layers pass a huge window.
    win = scal_ref[3, b]
    # last cache key any query row may attend (union over window tokens)
    last = pos - act + (1 - act) * (n_virtual - 1)

    @pl.when((j * block_s <= last)
             & ((j + 1) * block_s - 1 >= pos - win + 1))
    def _block():
        # column c = head (c // block_s), key position (c % block_s);
        # row r = head (r // rows), window token ((r % rows) // group)
        kpos = j * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (R, C), 1) % block_s
        qtok = (jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) % rows) \
            // group
        qpos = pos + qtok
        hmatch = (jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) // rows
                  == jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
                  // block_s)
        # active rows never attend cache keys >= pos (those arrive as
        # virtual rows); inactive (frozen) rows attend [0, qpos]
        live = (kpos <= jnp.where(act == 1, pos - 1, qpos)) \
            & (kpos > qpos - win) & hmatch
        int8_s = quant and dot_impl in ("int8", "int8_s")
        int8_v = quant and dot_impl in ("int8", "int8_v")
        cast_dt = jnp.bfloat16 if dot_impl == "bf16" else F32
        q = q_ref[0].reshape(R, d).astype(F32)           # [R, D]
        if int8_s:
            # MXU eats the int8 K codes directly: quantize q per row,
            # dot int8 x int8 -> i32, fix up with (q row scale * k
            # position scale). Removes the [C, D] VPU cast.
            qm = jnp.max(jnp.abs(q), -1, keepdims=True) + 1e-30
            q_i8 = jnp.round(q * (127.0 / qm)).astype(I8)
            s = jax.lax.dot_general(
                q_i8, flat_kv(k_ref), (((1,), (1,)), ((), ())),
                preferred_element_type=I32).astype(F32)
            s = s * (qm * (scale / 127.0))               # [R, 1] bcast
            s = s * flat_sc(ks_ref).astype(F32)          # [1, C] bcast
        else:
            k = flat_kv(k_ref).astype(cast_dt)           # [C, D]
            s = jax.lax.dot_general(
                q.astype(cast_dt), k, (((1,), (1,)), ((), ())),
                preferred_element_type=F32) * scale      # [R, C]
            if quant:
                s = s * flat_sc(ks_ref).astype(F32)
        if softcap:
            # after the int8 scale fold — tanh needs TRUE score values
            s = softcap * jnp.tanh(s * (1.0 / softcap))
        s = jnp.where(live, s, NEG_INF)
        m_prev = m_ref[:, :1]                            # [R, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:] = jnp.broadcast_to(
            alpha * l_ref[:, :1] + jnp.sum(p, -1, keepdims=True),
            l_ref.shape)
        if int8_v:
            # fold the per-position v scales into p, quantize p per row
            # (p <= 1 after the online-softmax shift), dot codes on the
            # MXU. The denominator above used EXACT f32 p.
            pv = p * flat_sc(vs_ref).astype(F32)
            pm = jnp.max(pv, -1, keepdims=True) + 1e-30
            p_i8 = jnp.round(pv * (127.0 / pm)).astype(I8)
            o = jax.lax.dot_general(
                p_i8, flat_kv(v_ref), (((1,), (0,)), ((), ())),
                preferred_element_type=I32).astype(F32)
            acc_ref[:] = acc_ref[:] * alpha + o * (pm * (1.0 / 127.0))
        else:
            if quant:
                p = p * flat_sc(vs_ref).astype(F32)
            v = flat_kv(v_ref).astype(cast_dt)
            acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                p.astype(cast_dt), v, (((1,), (0,)), ((), ())),
                preferred_element_type=F32)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(j == n_blocks - 1)
    def _finish():
        # virtual block: the T new tokens' k/v rows (not yet written to
        # the cache; row i sits at pos+i, visible to window tokens >= i),
        # then normalize. Same head-merged one-dot layout, C_v = hkv*T.
        Cv = hkv * n_virtual
        vcol = jax.lax.broadcasted_iota(jnp.int32, (R, Cv), 1) % n_virtual
        t_r = (jax.lax.broadcasted_iota(jnp.int32, (R, Cv), 0) % rows) \
            // group
        hmatch = (jax.lax.broadcasted_iota(jnp.int32, (R, Cv), 0) // rows
                  == jax.lax.broadcasted_iota(jnp.int32, (R, Cv), 1)
                  // n_virtual)
        vis = (act == 1) & (vcol <= t_r) & (vcol > t_r - win) & hmatch
        q = q_ref[0].reshape(R, d).astype(F32)           # [R, D]
        kn = kn_ref[0].reshape(Cv, d).astype(F32)        # [Cv, D]
        vn = vn_ref[0].reshape(Cv, d).astype(F32)
        s = jax.lax.dot_general(
            q, kn, (((1,), (1,)), ((), ())),
            preferred_element_type=F32) * scale          # [R, Cv]
        if quant:
            s = s * kns_ref[0].astype(F32)               # [1, Cv]
        if softcap:
            s = softcap * jnp.tanh(s * (1.0 / softcap))
        s = jnp.where(vis, s, NEG_INF)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, -1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                           # [R, Cv]
        l = alpha * l_ref[:, :1] + jnp.sum(p, -1, keepdims=True)
        if quant:
            p = p * vns_ref[0].astype(F32)               # [1, Cv]
        acc = acc_ref[:] * alpha + jax.lax.dot_general(
            p, vn, (((1,), (0,)), ((), ())), preferred_element_type=F32)
        o_ref[0] = (acc / l).reshape(hkv, rows, d).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("scale", "quant", "stacked", "interpret",
                                    "softcap", "n_virtual", "dot_impl",
                                    "s_live"))
def _impl(q, k, v, ks, vs, kn, vn, kns, vns, scal, *, scale, quant, stacked,
          interpret, softcap=0.0, n_virtual=1, dot_impl="f32",
          s_live=None):
    b, hkv, rows, d = q.shape
    group = rows // n_virtual
    s = k.shape[-2]
    # s_live (static): the live-prefix bucket — every attended key sits in
    # [0, s_live), so the grid only VISITS blocks below it: at half-fill
    # this halves both the cache DMA and the grid steps (the per-step
    # ~1.5 us floor made per-sequence index-map elision net-negative —
    # measured, experiments/attn_variants.py). Rounded up to a 128
    # multiple: block_s lands on the LANE axis of the S-minor scale
    # tiles, where Mosaic requires 128-divisibility.
    if s_live is None or s_live > s:
        s_live = s
    else:
        s_live = min(s, (s_live + 127) // 128 * 128)
    itemsize = 1 if quant else k.dtype.itemsize
    block_s = _pick_block_s(s_live, hkv * d * itemsize)
    n_blocks = s_live // block_s
    grid = (b, n_blocks)

    # index maps: scal[0,0] = layer (stacked caches), scal[1,:] = pos,
    # scal[2,:] = active, scal[3,:] = window. Blocks past a sequence's
    # last live key — or entirely below its window — clamp to a
    # neighboring index so Mosaic ELIDES their DMA (active: pos-1 is the
    # last cache key — the T new rows arrive as the virtual block;
    # inactive: the frozen rows at [pos, pos+T-1] ARE attended).
    # max(.., 0)/clip keep pos=0 and huge windows in range.
    def _clamp(j, sref, bi):
        p, a = sref[1, bi], sref[2, bi]
        last = jnp.maximum(p - a + (1 - a) * (n_virtual - 1), 0)
        first = jnp.clip(p - sref[3, bi] + 1, 0, last)
        return jnp.clip(j, first // block_s, last // block_s)

    def kv_map(bi, j, sref):
        jl = _clamp(j, sref, bi)
        return ((sref[0, 0], bi, 0, jl, 0) if stacked else (bi, 0, jl, 0))

    def sc_map(bi, j, sref):
        jl = _clamp(j, sref, bi)
        return ((sref[0, 0], bi, 0, jl) if stacked else (bi, 0, jl))

    def b_map(bi, j, sref):
        return (bi, 0, 0, 0)

    def b3_map(bi, j, sref):
        return (bi, 0, 0)

    lead = (1, 1) if stacked else (1,)
    kv_sp = pl.BlockSpec(lead + (hkv, block_s, d), kv_map,
                         memory_space=pltpu.VMEM)
    # scales are one rank lower (S minor): tile [.., hkv, block_s]
    sc_sp = pl.BlockSpec(lead + (hkv, block_s), sc_map,
                         memory_space=pltpu.VMEM)
    q_sp = pl.BlockSpec((1, hkv, rows, d), b_map, memory_space=pltpu.VMEM)
    row_sp = pl.BlockSpec((1, hkv, n_virtual, d), b_map,
                          memory_space=pltpu.VMEM)
    # virtual-row scales arrive PRE-FLATTENED [B, 1, hkv*n_virtual]: the
    # [hkv, T] -> [1, hkv*T] sublane->lane merge does not lower in-kernel
    rsc_sp = pl.BlockSpec((1, 1, hkv * n_virtual), b3_map,
                          memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, scale=scale, block_s=block_s,
                               n_blocks=n_blocks, hkv=hkv, group=group,
                               quant=quant, softcap=softcap,
                               n_virtual=n_virtual, dot_impl=dot_impl)
    if quant:
        in_specs = [q_sp, kv_sp, kv_sp, sc_sp, sc_sp, row_sp, row_sp,
                    rsc_sp, rsc_sp]
        inputs = [q, k, v, ks, vs, kn, vn,
                  kns.reshape(b, 1, hkv * n_virtual),
                  vns.reshape(b, 1, hkv * n_virtual)]
    else:
        in_specs = [q_sp, kv_sp, kv_sp, row_sp, row_sp]
        inputs = [q, k, v, kn, vn]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hkv, rows, d), b_map,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hkv * rows, 128), F32),  # running max
            pltpu.VMEM((hkv * rows, 128), F32),  # running denom
            pltpu.VMEM((hkv * rows, d), F32),    # output accumulator
        ])
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hkv, rows, d), F32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(scal, *inputs)


def flash_decode_batched(q: jnp.ndarray, k_cache, v_cache, k_new, v_new,
                         pos: jnp.ndarray, scale: float, *,
                         layer=None, active=None,
                         window=None, softcap: float = 0.0,
                         interpret: bool | None = None,
                         dot_impl: str | None = None,
                         s_live: int | None = None) -> jnp.ndarray:
    """Batched decode attention over per-sequence caches plus the CURRENT
    token's (not-yet-written) k/v row.

    s_live (STATIC int, default whole cache): the live-prefix bucket —
    the caller guarantees max(pos) < s_live (inactive slots:
    max(pos)+T <= s_live); the kernel then neither reads nor visits
    cache blocks past it. Serving dispatches per-bucket compiled
    variants as the batch's contexts fill.

    q [B, Hq, D]; pos [B] = each sequence's current position (cache keys
    [0, pos-1] are live; the new row logically sits at pos and is passed
    separately). k_cache/v_cache: [B, Hkv, S, D] float tensors or (codes
    int8, scales f32 [B, Hkv, S] — S minor; a legacy trailing size-1 axis
    is dropped) tuples; with `layer` given, the cache carries a leading
    [L] axis and the kernel indexes it via scalar prefetch (no slice
    copies). k_new/v_new: [B, Hkv, D] floats or (codes [B, Hkv, D],
    scales [B, Hkv, 1]) matching the cache.
    active [B] bool (default all-active): INACTIVE slots attend the
    frozen cache rows [0, pos] and the virtual row is masked out, exactly
    matching the jnp path's masked-write-then-attend semantics.
    window (traced int scalar or None): sliding-window attention — the
    query sees keys in (pos - window, pos]. Dynamic (scalar prefetch) so
    gemma2/3's per-layer local/global alternation shares one compiled
    kernel; cache blocks fully below a sequence's window skip their DMA
    via the index-map clamp. softcap (static float): gemma2's
    softcap*tanh(s/softcap) on scores, applied after the int8 scale fold.
    Returns [B, Hq, D] f32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    quant = isinstance(k_cache, tuple)
    stacked = layer is not None
    if quant:
        k, ks = k_cache
        v, vs = v_cache
        # scales arrive S-minor ([.., Hkv, S]); a legacy [.., Hkv, S, 1]
        # is normalized by dropping the trailing size-1 axis (an
        # order-preserving reshape)
        if ks.ndim == k.ndim:
            ks = ks.reshape(ks.shape[:-1])
            vs = vs.reshape(vs.shape[:-1])
        kn, kns = k_new
        vn, vns = v_new
        b, hkv, d = kn.shape[0], kn.shape[1], kn.shape[-1]
        kn = kn.reshape(b, hkv, 1, d)
        vn = vn.reshape(b, hkv, 1, d)
        kns = kns.reshape(b, hkv, 1)
        vns = vns.reshape(b, hkv, 1)
    else:
        k, v = k_cache, v_cache
        ks = vs = kns = vns = None
        kn, vn = k_new, v_new
        b, hkv, d = kn.shape[0], kn.shape[1], kn.shape[-1]
        kn = kn.reshape(b, hkv, 1, d).astype(k.dtype)
        vn = vn.reshape(b, hkv, 1, d).astype(v.dtype)
    hq = q.shape[1]
    group = hq // hkv
    qr = q.reshape(b, hkv, group, d)
    li = jnp.full((b,), 0 if layer is None else layer, jnp.int32)
    act = (jnp.ones((b,), jnp.int32) if active is None
           else jnp.asarray(active, jnp.int32))
    win = jnp.full((b,), 2**30 if window is None else window, jnp.int32)
    scal = jnp.stack([li, jnp.asarray(pos, jnp.int32), act, win])
    if dot_impl is None:
        dot_impl = _attn_dot_default()
    if interpret:
        dot_impl = "f32"  # the int8 path is a TPU-Mosaic trade
    out = _impl(qr, k, v, ks, vs, kn, vn, kns, vns, scal, scale=scale,
                quant=quant, stacked=stacked, interpret=interpret,
                softcap=softcap, dot_impl=dot_impl, s_live=s_live)
    return out.reshape(b, hq, d)


def flash_verify_batched(q: jnp.ndarray, k_cache, v_cache, k_new, v_new,
                         pos: jnp.ndarray, scale: float, *,
                         layer=None, active=None,
                         window=None, softcap: float = 0.0,
                         interpret: bool | None = None,
                         dot_impl: str | None = None,
                         s_live: int | None = None) -> jnp.ndarray:
    """Speculative VERIFY window attention: T new tokens per sequence over
    per-sequence caches, the T new k/v rows riding in as a causal virtual
    block (deferred write — the same protocol as flash_decode_batched,
    generalized to T query rows per head group).

    q [B, T, Hq, D]; pos [B] = each sequence's window base (cache keys
    [0, pos-1] are live; window token t sits at pos+t and its k/v row is
    virtual row t, visible to window tokens >= t). k_new/v_new:
    [B, Hkv, T, D] floats or (codes [B, Hkv, T, D], scales [B, Hkv, T, 1]
    or [B, Hkv, T]) matching the cache. Caches/active/window/softcap as
    in flash_decode_batched; INACTIVE slots attend the frozen cache rows
    [0, pos+t] per window token and every virtual row is masked — exactly
    the jnp verify path's masked-write-then-attend semantics.
    Returns [B, T, Hq, D] f32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    quant = isinstance(k_cache, tuple)
    stacked = layer is not None
    b, t, hq, d = q.shape
    if quant:
        k, ks = k_cache
        v, vs = v_cache
        if ks.ndim == k.ndim:   # legacy [.., Hkv, S, 1] scales
            ks = ks.reshape(ks.shape[:-1])
            vs = vs.reshape(vs.shape[:-1])
        kn, kns = k_new
        vn, vns = v_new
        hkv = kn.shape[1]
        kns = kns.reshape(b, hkv, t)
        vns = vns.reshape(b, hkv, t)
    else:
        k, v = k_cache, v_cache
        ks = vs = kns = vns = None
        kn, vn = k_new, v_new
        hkv = kn.shape[1]
        kn = kn.astype(k.dtype)
        vn = vn.astype(v.dtype)
    group = hq // hkv
    # token-major rows: row r = t*group + g belongs to window token t
    qr = (q.reshape(b, t, hkv, group, d)
           .transpose(0, 2, 1, 3, 4)
           .reshape(b, hkv, t * group, d))
    li = jnp.full((b,), 0 if layer is None else layer, jnp.int32)
    act = (jnp.ones((b,), jnp.int32) if active is None
           else jnp.asarray(active, jnp.int32))
    win = jnp.full((b,), 2**30 if window is None else window, jnp.int32)
    scal = jnp.stack([li, jnp.asarray(pos, jnp.int32), act, win])
    if dot_impl is None:
        dot_impl = _attn_dot_default()
    if interpret:
        dot_impl = "f32"  # the int8 path is a TPU-Mosaic trade
    out = _impl(qr, k, v, ks, vs, kn, vn, kns, vns, scal, scale=scale,
                quant=quant, stacked=stacked, interpret=interpret,
                softcap=softcap, n_virtual=t, dot_impl=dot_impl,
                s_live=s_live)
    return (out.reshape(b, hkv, t, group, d)
               .transpose(0, 2, 1, 3, 4)
               .reshape(b, t, hq, d))
