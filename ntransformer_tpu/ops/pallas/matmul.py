"""Fused dequant + matmul Pallas kernels — the TPU equivalent of the
reference's warp-per-row quantized GEMV family (src/cuda/gemm.cu).

Design (see core/layout.py for the plane layouts):
  * grid (nT, nN, nK), K innermost, f32 accumulation into the output block
    revisited across K steps — Mosaic keeps it resident in VMEM;
  * quantized planes stream HBM→VMEM tile by tile (auto double-buffered by
    the Pallas pipeline); dequant is pure vectorized and/shift/convert/mul
    on the VPU — zero lane shuffles by layout construction;
  * activations arrive pre-split (x_lo/x_hi reshape outside the kernel), so
    nibble planes dot against contiguous activation halves;
  * scales broadcast along sublanes via reshape (granularities 16/32/128).

Decode (T=1) is HBM-bandwidth-bound: the kernel's job is to keep the qs
plane streaming at full bandwidth while the VPU dequant (2-5 ops/weight)
hides under the DMA. Prefill reuses the same kernel with T tiles, where the
MXU dots amortize the dequant across tokens.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.dtypes import DType
from ..f16bits import f16_bits_to_f32
from ..linear import QLinear, plane_dims, split_x_jnp

F32 = jnp.float32

# MXU precision for the in-kernel dots. The MXU multiplies bf16 natively;
# DEFAULT lowers an f32 dot to one bf16 pass (~0.5-1% product rounding —
# the industry-standard precision of TPU inference; activations enter the
# kernels as bf16 anyway). HIGHEST (3-pass decomposition) was measured at
# -30-55% decode throughput — the operand hi/lo split is large VPU work —
# so exactness is an opt-in: NT_DOT_PRECISION=highest. f32 ACCUMULATION is
# unaffected (preferred_element_type stays f32 either way).
import os as _os

DOT_PRECISION = (jax.lax.Precision.HIGHEST
                 if _os.environ.get("NT_DOT_PRECISION", "").lower() == "highest"
                 else jax.lax.Precision.DEFAULT)

# K-quant decode tiles: move the per-element scale multiply off the VPU
# via group-partial MXU dots (see _q4_k_tile). MEASURED AND DEFAULT-OFF
# (r4): the isolated kernel wins +13% (58.3 vs 66.1 us on the gate/up
# shape — the VPU saving is real), but the IN-MODEL A/B loses 2-3%
# consistently (Q4_K_M 81.4/82.8 vs 85.0/84.3 tok/s, two interleaved
# pairs): inside the layer scan the added MXU dots contend with the
# NEIGHBORING kernels' dots, which an isolated loop never sees — the
# same transfer failure as the r2 tile sweep. Kept as an opt-in
# (NT_KQ_GROUP_DOT=1) because it documents where the exact-dequant
# ceiling lives: per-element VPU work cannot move to the MXU for free
# when the MXU is already pipelined across kernels.
GROUP_DOT = _os.environ.get("NT_KQ_GROUP_DOT", "0") == "1"


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=F32,
                   precision=DOT_PRECISION)


def _largest_tile(dim: int, candidates) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    raise ValueError(f"dim {dim} not tileable by {candidates}")


def _rep_sublanes(a, rep: int, rows: int, cols: int):
    """Broadcast [rows/rep? ...] — expand a [rows//rep, cols] tile to
    [rows, cols] by repeating each sublane `rep` times (reshape-broadcast)."""
    g = a.reshape(rows // rep, 1, cols)
    g = jnp.broadcast_to(g, (rows // rep, rep, cols))
    return g.reshape(rows, cols)


# --- per-dtype kernel bodies -------------------------------------------------
# Each takes LOADED arrays (x halves + planes) and returns the f32 partial
# product for this (T, N) tile at this K step.

def _q8_0_tile(vals, tkh, tn):
    x, qs, d = vals
    w = qs.astype(F32) * _rep_sublanes(f16_bits_to_f32(d), 32, tkh, tn)
    return _dot(x.astype(F32), w)


def _q4_0_tile(vals, tkh, tn):
    """Symmetric 4-bit: w = (nib - 8)·d — the r1 form, kept after two
    measured r2 regressions: (a) moving the -8 into a correction dot like
    the K-quants: 91.5 -> 66 tok/s (Q4_0's 16-row scale granularity makes
    the added group-sum dot cost more than the subtract it removes; the
    K-quants already pay that dot for their affine terms, so folding is
    pure win only there); (b) folding just the hi shift: 91.5 -> 87.7
    (both nibbles share ONE broadcast d when the shift stays; the fold
    needs a second materialized d/16 broadcast — net +1 op)."""
    x_lo, x_hi, qs, d = vals
    q = qs.astype(jnp.int32)  # Mosaic has no 8-bit shifts
    deff = _rep_sublanes(f16_bits_to_f32(d), 16, tkh, tn)
    w_lo = ((q & 0x0F) - 8).astype(F32) * deff
    w_hi = ((q >> 4) - 8).astype(F32) * deff
    return (_dot(x_lo.astype(F32), w_lo)
            + _dot(x_hi.astype(F32), w_hi))
    # (a bf16 dequant variant measured SLOWER: 72 vs 92 tok/s on 8B — the
    # VPU does not pack bf16 elementwise ops 2x on this generation)


def _group_sums(xf, groups: int):
    """[T, Kh] → [T, groups] sums over contiguous lane groups, as a dot
    with an iota-built 0/1 grouping matrix (Mosaic rejects lane-splitting
    reshape-reductions; the MXU does this for free)."""
    t, kh = xf.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (kh, groups), 0) // (kh // groups)
    cols = jax.lax.broadcasted_iota(jnp.int32, (kh, groups), 1)
    gmat = (rows == cols).astype(F32)
    return _dot(xf, gmat)


def _group_partial_dot(xf, codes, groups: int, grp: int):
    """Per-group partial products P[g, n] = Σ_{k∈g} x_k·codes_{k,n} via ONE
    MXU dot: x expands into a 0/1-masked [g, kh] matrix (g·kh elements —
    `grp`x fewer than the [kh, tn] codes tile). The MXU does g·kh·tn MACs
    instead of kh·tn — idle capacity at T=1 decode."""
    t, kh = xf.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (groups, kh), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (groups, kh), 1) // grp
    mask = (rows == cols).astype(F32)
    return _dot(mask * xf, codes)


def _q4_k_tile(vals, tkh, tn):
    """Affine superblock dequant, restructured VPU-light:
    y = Σ x·q·s  −  Σ_g (Σ_{k∈g} x_k)·m_g.

    The hi nibble is NOT shifted down: (q & 0xF0) = 16·hi, and the /16 is
    folded into s_hi (exact — powers of two in f32; measured +18% kernel
    bandwidth, experiments/kquant_variants.py v1). At T=1 (decode) the
    per-element SCALE MULTIPLY also leaves the VPU: one masked MXU dot
    yields per-group partials P [g, tn] and the scales multiply P — per-
    element work drops to widen+and+convert (r4 shootout v7: 66.1 → 58.3
    us on the 4096x14336 shape, +13%). Numerically TIGHTER than scaling
    the weights (integer codes are exact bf16 dot operands; the f32 scale
    applies after accumulation instead of rounding q·s to bf16).
    NT_KQ_GROUP_DOT=0 forces the scale-on-weights form everywhere."""
    x_lo, x_hi, qs, sc_lo, sc_hi, mn_lo, mn_hi, d, dmin = vals
    q = qs.astype(jnp.int32)
    g = tkh // 32  # scale/min groups per half-tile (32 elements each)
    df = _rep_sublanes(f16_bits_to_f32(d), g // (tkh // 128), g, tn)
    dm = _rep_sublanes(f16_bits_to_f32(dmin), g // (tkh // 128), g, tn)
    s_lo = df * sc_lo.astype(jnp.int32).astype(F32)          # [g, tn]
    s_hi = (df * sc_hi.astype(jnp.int32).astype(F32)) * (1.0 / 16.0)
    m_lo = dm * mn_lo.astype(jnp.int32).astype(F32)
    m_hi = dm * mn_hi.astype(jnp.int32).astype(F32)
    xlf = x_lo.astype(F32)
    xhf = x_hi.astype(F32)
    corr = (_dot(_group_sums(xlf, g), m_lo)
            + _dot(_group_sums(xhf, g), m_hi))
    if x_lo.shape[0] == 1 and GROUP_DOT:
        p_lo = _group_partial_dot(xlf, (q & 0x0F).astype(F32), g, 32)
        p_hi = _group_partial_dot(xhf, (q & 0xF0).astype(F32), g, 32)
        acc = s_lo * p_lo + s_hi * p_hi                      # [g, tn]
        return jnp.sum(acc, axis=0, keepdims=True) - corr
    w_lo = (q & 0x0F).astype(F32) * _rep_sublanes(s_lo, 32, tkh, tn)
    w_hi = (q & 0xF0).astype(F32) * _rep_sublanes(s_hi, 32, tkh, tn)
    return (_dot(xlf, w_lo)
            + _dot(xhf, w_hi) - corr)


def _q5_k_tile(vals, tkh, tn):
    x_lo, x_hi, qs, qh, sc_lo, sc_hi, mn_lo, mn_hi, d, dmin = vals
    q = qs.astype(jnp.int32)
    # qh tile [tkh/4, tn]: per superblock (32 rows), bit 2c covers lo rows
    # [32c, 32c+32) — stack the 4 shifted views along sublanes.
    nsb = tkh // 128
    qh3 = qh.astype(jnp.int32).reshape(nsb, 32, tn)
    hb_lo = jnp.concatenate([(qh3 >> (2 * c)) & 1 for c in range(4)],
                            axis=1).reshape(tkh, tn)
    hb_hi = jnp.concatenate([(qh3 >> (2 * c + 1)) & 1 for c in range(4)],
                            axis=1).reshape(tkh, tn)
    g = tkh // 32
    df = _rep_sublanes(f16_bits_to_f32(d), g // (tkh // 128), g, tn)
    dm = _rep_sublanes(f16_bits_to_f32(dmin), g // (tkh // 128), g, tn)
    s_lo = df * sc_lo.astype(jnp.int32).astype(F32)
    # hi kept at 16x: (q & 0xF0) + (hb << 8) = 16*val, /16 folded into the
    # scale (exact; kills the >>4 — measured win, kquant_variants v1)
    s_hi = (df * sc_hi.astype(jnp.int32).astype(F32)) * (1.0 / 16.0)
    m_lo = dm * mn_lo.astype(jnp.int32).astype(F32)
    m_hi = dm * mn_hi.astype(jnp.int32).astype(F32)
    xlf = x_lo.astype(F32)
    xhf = x_hi.astype(F32)
    corr = (_dot(_group_sums(xlf, g), m_lo)
            + _dot(_group_sums(xhf, g), m_hi))
    if x_lo.shape[0] == 1 and GROUP_DOT:
        # decode: scale multiplies the [g, tn] group partials, not the
        # [tkh, tn] weights (see _q4_k_tile)
        p_lo = _group_partial_dot(
            xlf, ((q & 0x0F) + (hb_lo << 4)).astype(F32), g, 32)
        p_hi = _group_partial_dot(
            xhf, ((q & 0xF0) + (hb_hi << 8)).astype(F32), g, 32)
        acc = s_lo * p_lo + s_hi * p_hi
        return jnp.sum(acc, axis=0, keepdims=True) - corr
    w_lo = ((q & 0x0F) + (hb_lo << 4)).astype(F32) * _rep_sublanes(s_lo, 32, tkh, tn)
    w_hi = ((q & 0xF0) + (hb_hi << 8)).astype(F32) * _rep_sublanes(s_hi, 32, tkh, tn)
    return (_dot(xlf, w_lo)
            + _dot(xhf, w_hi) - corr)


def _q6_k_tile(vals, tkh, tn):
    """w = ((ql | hb<<4) - 32) · s. The −32 leaves as a group-sum
    correction dot; scales combine at 16-element granularity.

    Restructured per the measured shootout (experiments/kquant_variants.py
    q6k v3 + hi fold: 439 → 600+ GB/s): the 2-bit hb fields are masked and
    shifted INTO PLACE in one op each (no extract-then-reshift); the hi
    value is kept at 16x ((ql & 0xF0) | hb<<8) with the /16 folded into
    s_hi (exact); the scale multiply broadcasts via a [g, 16, tn] reshape
    instead of a materialized repeat."""
    x_lo, x_hi, ql, qh, sc_lo, sc_hi, d = vals
    # qh tile [tkh/2, tn]: per half-block (32 rows), bitpair 0 covers lo rows
    # [64H, 64H+32), bitpair 1 covers [64H+32, 64H+64).
    nh = tkh // 64
    qh3 = qh.reshape(nh, 32, tn).astype(jnp.int32)
    hb_lo = jnp.concatenate([(qh3 & 0x03) << 4, (qh3 & 0x0C) << 2],
                            axis=1).reshape(tkh, tn)
    hb_hi16 = jnp.concatenate([(qh3 & 0x30) << 4, (qh3 & 0xC0) << 2],
                              axis=1).reshape(tkh, tn)
    qli = ql.astype(jnp.int32)
    lo = ((qli & 0x0F) | hb_lo).astype(F32)
    hi16 = ((qli & 0xF0) | hb_hi16).astype(F32)
    g = tkh // 16
    df = _rep_sublanes(f16_bits_to_f32(d), g // (tkh // 128), g, tn)
    s_lo = df * sc_lo.astype(jnp.int32).astype(F32)          # [g, tn]
    s_hi = df * sc_hi.astype(jnp.int32).astype(F32)
    s_hi16 = s_hi * (1.0 / 16.0)
    w_lo = (lo.reshape(g, 16, tn) * s_lo.reshape(g, 1, tn)).reshape(tkh, tn)
    w_hi = (hi16.reshape(g, 16, tn) * s_hi16.reshape(g, 1, tn)).reshape(tkh, tn)
    xlf = x_lo.astype(F32)
    xhf = x_hi.astype(F32)
    corr = 32.0 * (_dot(_group_sums(xlf, g), s_lo)
                   + _dot(_group_sums(xhf, g), s_hi))
    return (_dot(xlf, w_lo)
            + _dot(xhf, w_hi) - corr)


def _w4a8_tile(vals, tkh, tn):
    """w4a8 planes on the T>1 (prefill/verify) path: exact dequant + bf16
    MXU dot, amortized across tokens — the same structure as the K-quant
    tiles but with ready f32 scale/min planes (no f16-bit or 6-bit scale
    unpack). The hi shift folds into s_hi/16 (exact). The T=1 decode path
    uses the int8-MXU kernel in ops/pallas/w4a8.py instead."""
    x_lo, x_hi, qs, s_lo, s_hi, m_lo, m_hi = vals
    q = qs.astype(jnp.int32)
    g = tkh // 256
    s_hi16 = s_hi * (1.0 / 16.0)
    w_lo = ((q & 0x0F).astype(F32).reshape(g, 256, tn)
            * s_lo.reshape(g, 1, tn)).reshape(tkh, tn)
    w_hi = ((q & 0xF0).astype(F32).reshape(g, 256, tn)
            * s_hi16.reshape(g, 1, tn)).reshape(tkh, tn)
    xlf = x_lo.astype(F32)
    xhf = x_hi.astype(F32)
    corr = (_dot(_group_sums(xlf, g), m_lo)
            + _dot(_group_sums(xhf, g), m_hi))
    return _dot(xlf, w_lo) + _dot(xhf, w_hi) - corr


_TILE_FNS = {
    DType.Q8_0: _q8_0_tile,
    DType.Q4_0: _q4_0_tile,
    DType.Q4_K: _q4_k_tile,
    DType.Q5_K: _q5_k_tile,
    DType.Q6_K: _q6_k_tile,
    DType.W4A8: _w4a8_tile,
}

# plane order must match QLinear.plane_names / LAYOUTS
_PLANE_ROWS_DIV = {
    DType.Q8_0: {"qs": 1, "d": 32},
    DType.Q4_0: {"qs": 2, "d": 32},
    DType.Q4_K: {"qs": 2, "sc_lo": 64, "sc_hi": 64, "mn_lo": 64, "mn_hi": 64,
                 "d": 256, "dmin": 256},
    DType.Q5_K: {"qs": 2, "qh": 8, "sc_lo": 64, "sc_hi": 64, "mn_lo": 64,
                 "mn_hi": 64, "d": 256, "dmin": 256},
    DType.Q6_K: {"ql": 2, "qh": 4, "sc_lo": 32, "sc_hi": 32, "d": 256},
    DType.W4A8: {"qs": 2, "s_lo": 512, "s_hi": 512, "m_lo": 512,
                 "m_hi": 512},
}

_SPLIT = {DType.Q4_0, DType.Q4_K, DType.Q5_K, DType.Q6_K, DType.W4A8}

# Experiment hook: {(dtype, k, n): (tn, tk)} overrides for the shape sweep
# (experiments/shape_sweep.py); production choices live in _pick_tiles.
TILE_OVERRIDE: dict = {}

# Per-shape tile overrides. EMPTY by design after a measured negative
# result (r2): the isolated-loop shape sweep (experiments/shape_sweep.py)
# found kernel-level wins for smaller K tiles on several shapes (Q8_0 k/v
# +28%, down +30%, square matmuls +8%), but baking them made the IN-MODEL
# decode SLOWER (8B Q8_0 fused 77.1 → 74.8 tok/s): inside the layer scan,
# consecutive kernels pipeline against each other, and more grid steps per
# kernel add cross-kernel overhead the isolated loop never sees. The
# in-model number rules; defaults retained. Any future entry must be
# validated by an in-model A/B, not the sweep alone.
_TILE_TABLE: dict = {}


def _pick_tiles(dtype: DType, k: int, n: int) -> tuple[int, int]:
    """(tn, tk) for a [k → n] matmul. K tile in ELEMENT units (plane rows
    scale by rows_div). Sub-byte dtypes use bigger K tiles: per-grid-step
    overhead (~1.5 us) gates throughput when a step's qs DMA is small, so
    keep ≥1 MB per step. (K-quant d/dmin planes have rows tk/256, which
    must stay 8-divisible or span whole-K — hence multiples of 2048 or k
    itself; whole-K only while the tile's dequant temporaries fit the
    scoped-VMEM budget.)"""
    ov = TILE_OVERRIDE.get((dtype, k, n))
    if ov is not None:
        return ov
    baked = _TILE_TABLE.get((dtype, k, n))
    if baked is not None:
        return baked
    # sub-128-lane (or non-128-multiple) N: a block EQUAL to the whole dim
    # is always legal — small-kv-dim models (head_dim 32) hit this
    tn = n if n % 128 else _largest_tile(n, (512, 256, 128))
    if dtype == DType.W4A8:
        # s/m plane rows are tk/512 and must be 8-divisible or whole-K
        kcands = ((k,) if k <= 14336 else ()) + (8192, 4096)
        return tn, _largest_tile(k, kcands)
    if dtype != DType.Q8_0:
        kcands = ((k,) if k <= 14336 else ()) + (8192, 6144, 4096, 2048,
                                                 1024, 512, 256)
    else:
        kcands = (4096, 2048, 1024, 512, 256, 128)
    # the activation tile's LANE dim is tk (tk/2 split): it must be
    # 128-divisible or the whole K — small odd dims (tiny-model inter=192)
    # fall back to one whole-K block
    kcands = tuple(c for c in kcands if c % 128 == 0) + (k,)
    return tn, _largest_tile(k, kcands)


@functools.partial(jax.jit, static_argnames=("dtype", "k", "n", "out_dtype",
                                             "interpret", "stacked", "tiles"))
def _quant_matmul_impl(x, planes_tuple, dtype: DType, k: int, n: int,
                       out_dtype, interpret: bool, stacked: bool = False,
                       layer=None, tiles: tuple | None = None):
    """Fused dequant+matmul. With stacked=True, each plane carries a leading
    [L] dim and `layer` (scalar-prefetched) selects the layer INSIDE the
    kernel's index_map — the model's layer scan then reads weights straight
    from the stacked arrays with zero copies (profiling showed XLA's
    dynamic-slice of scan-carried weights costing ~55% of decode time).

    tiles: the (tn, tk) choice as a STATIC argument, resolved by the
    caller via _pick_tiles — it must be part of the jit cache key, or a
    TILE_OVERRIDE change between calls is invisible (jax's global trace
    cache survives clear_cache(), which made override A/B sweeps time the
    first-traced tiling under every label)."""
    t = x.shape[0]
    names = QLinear.plane_names(dtype)
    planes = dict(zip(names, planes_tuple))
    tn, tk = tiles if tiles is not None else _pick_tiles(dtype, k, n)
    # Mosaic requires the sublane block be a multiple of 8 or span the whole
    # dim — odd T (unbucketed prefill) falls back to one whole-T block.
    tt = _largest_tile(t, (256, 128, 64, 32, 16, 8)) if t % 8 == 0 else t
    grid = (t // tt, n // tn, k // tk)
    nk = k // tk

    split = dtype in _SPLIT
    if split:
        x_lo, x_hi = split_x_jnp(x, dtype)
        x_inputs = [x_lo, x_hi]
        tkh = tk // 2
    else:
        x_inputs = [x]
        tkh = tk
    n_x = len(x_inputs)

    if stacked:
        def x_map(ti, i, j, L):
            return (ti, j)
        x_specs = [pl.BlockSpec((tt, tkh), x_map,
                                memory_space=pltpu.VMEM)] * n_x
    else:
        x_specs = [pl.BlockSpec((tt, tkh), lambda ti, i, j: (ti, j),
                                memory_space=pltpu.VMEM)] * n_x

    plane_inputs = []
    plane_specs = []
    for nm in names:
        arr = planes[nm]
        div = _PLANE_ROWS_DIV[dtype][nm]
        rows = tk // div
        plane_inputs.append(arr)
        if stacked:
            plane_specs.append(pl.BlockSpec(
                (1, rows, tn), lambda ti, i, j, L: (L[0], j, i),
                memory_space=pltpu.VMEM))
        else:
            plane_specs.append(pl.BlockSpec(
                (rows, tn), lambda ti, i, j: (j, i),
                memory_space=pltpu.VMEM))

    tile_fn = _TILE_FNS[dtype]

    def kernel_body(*args):
        # layout: [layer_ref if stacked] x_refs... plane_refs... out_ref
        if stacked:
            args = args[1:]  # scalar-prefetch ref unused in the body
        *ins, out = args
        xs = [r[:] for r in ins[:n_x]]
        ps = [r[0] if stacked else r[:] for r in ins[n_x:]]
        k_step = pl.program_id(2)

        @pl.when(k_step == 0)
        def _():
            out[:] = jnp.zeros_like(out)

        out[:] += tile_fn(xs + ps, tkh, tn).astype(out.dtype)

    out_spec = (pl.BlockSpec((tt, tn), (lambda ti, i, j, L: (ti, i))
                             if stacked else (lambda ti, i, j: (ti, i)),
                             memory_space=pltpu.VMEM))
    # whole-K tiles of big matrices need more scoped VMEM than the 16 MB
    # default; the chip has far more (the pipeline still double-buffers)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    if stacked:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=x_specs + plane_specs, out_specs=out_spec)
        out = pl.pallas_call(
            kernel_body,
            out_shape=jax.ShapeDtypeStruct((t, n), F32),
            grid_spec=grid_spec,
            interpret=interpret,
            compiler_params=cparams,
        )(jnp.asarray(layer, jnp.int32).reshape(1), *x_inputs, *plane_inputs)
    else:
        out = pl.pallas_call(
            kernel_body,
            out_shape=jax.ShapeDtypeStruct((t, n), F32),
            grid=grid,
            in_specs=x_specs + plane_specs,
            out_specs=out_spec,
            interpret=interpret,
            compiler_params=cparams,
        )(*x_inputs, *plane_inputs)
    return out.astype(out_dtype)


def quant_matmul_pallas(x: jnp.ndarray, ql: QLinear, *,
                        out_dtype=jnp.float32,
                        interpret: bool | None = None,
                        layer=None) -> jnp.ndarray:
    """y[T, N] = x[T, K] @ dequant(W)^T via the fused Pallas kernel.

    layer: when the QLinear holds stacked planes ([L, rows, N]), a traced
    scalar selecting the layer — read directly by the kernel via scalar
    prefetch (no host-visible slice, no HBM copy)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    names = QLinear.plane_names(ql.dtype)
    planes_tuple = tuple(ql.planes[nm] for nm in names)
    stacked = layer is not None
    ref_planes = ql.planes
    if stacked:
        ref_planes = {nm: v[0] for nm, v in ql.planes.items()}
    k, n = plane_dims(ref_planes, ql.dtype)
    return _quant_matmul_impl(x, planes_tuple, ql.dtype, k, n,
                              out_dtype, interpret, stacked=stacked,
                              layer=layer,
                              tiles=_pick_tiles(ql.dtype, k, n))
