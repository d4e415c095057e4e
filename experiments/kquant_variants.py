"""K-quant kernel variant shootout (r2 verdict item 1): measure per-variant
effective HBM bandwidth of the fused dequant+matmul for Q4_K / Q6_K on the
real TPU, with true D2H fencing (block_until_ready returns early on this
rig — see docs/PERFORMANCE.md measurement rules).

Variants probe where the VPU time goes in ops/pallas/matmul.py:
  v0   current shipped tile body (baseline)
  v1   no-int32: nibble extract via uint8 `&` only; the hi-nibble shift is
       FOLDED INTO THE SCALE (s_hi/16 multiplies (q & 0xF0)) — kills the
       int32 widen + 2 shifts
  v2   3d-broadcast scale multiply: reshape [g,32,tn] * s[:,None,:] instead
       of materializing the broadcast with _rep_sublanes
  v3   v1 + v2 combined
  v4   v3 + single fused dot: concat(x_lo,x_hi) @ concat(w_lo,w_hi)
  v5   precombined-scale ceiling: s/m handed to the kernel as ready f32
       planes (simulates pack-time d*sc precombination; measures the most
       that verdict item 1a could buy)
  w6   (Q6_K only) widened int8 plane: ql|qh<<4 - 32 pre-unpacked to int8 at
       pack time (+~1 bpw) -> per-byte work identical to Q8_0

Run: python experiments/kquant_variants.py [q4_k|q6_k|all]
"""
import functools
import sys
import time

import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ntransformer_tpu.core import DType, quantize
from ntransformer_tpu.core.layout import relayout, split_x
from ntransformer_tpu.ops.f16bits import f16_bits_to_f32

F32 = jnp.float32
K, N = 4096, 14336  # 8B gate/up decode matmul
ITERS = 100


def _rep(a, rep, rows, cols):
    g = a.reshape(rows // rep, 1, cols)
    return jnp.broadcast_to(g, (rows // rep, rep, cols)).reshape(rows, cols)


def _group_sums(xf, groups):
    t, kh = xf.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (kh, groups), 0) // (kh // groups)
    cols = jax.lax.broadcasted_iota(jnp.int32, (kh, groups), 1)
    gmat = (rows == cols).astype(F32)
    return jnp.dot(xf, gmat, preferred_element_type=F32)


# ---------------------------------------------------------------------------
# Q4_K tile bodies. vals order: x_lo, x_hi, then planes (varies per variant).
# Every body returns the [T, tn] partial for one K step of tk elements.
# ---------------------------------------------------------------------------

def q4k_v0(vals, tkh, tn):
    x_lo, x_hi, qs, sc_lo, sc_hi, mn_lo, mn_hi, d, dmin = vals
    q = qs.astype(jnp.int32)
    g = tkh // 32
    df = _rep(f16_bits_to_f32(d), g // (tkh // 128), g, tn)
    dm = _rep(f16_bits_to_f32(dmin), g // (tkh // 128), g, tn)
    s_lo = df * sc_lo.astype(jnp.int32).astype(F32)
    s_hi = df * sc_hi.astype(jnp.int32).astype(F32)
    m_lo = dm * mn_lo.astype(jnp.int32).astype(F32)
    m_hi = dm * mn_hi.astype(jnp.int32).astype(F32)
    w_lo = (q & 0x0F).astype(F32) * _rep(s_lo, 32, tkh, tn)
    w_hi = (q >> 4).astype(F32) * _rep(s_hi, 32, tkh, tn)
    xlf = x_lo.astype(F32)
    xhf = x_hi.astype(F32)
    corr = (jnp.dot(_group_sums(xlf, g), m_lo, preferred_element_type=F32)
            + jnp.dot(_group_sums(xhf, g), m_hi, preferred_element_type=F32))
    return (jnp.dot(xlf, w_lo, preferred_element_type=F32)
            + jnp.dot(xhf, w_hi, preferred_element_type=F32) - corr)


def q4k_v1(vals, tkh, tn):
    x_lo, x_hi, qs, sc_lo, sc_hi, mn_lo, mn_hi, d, dmin = vals
    g = tkh // 32
    df = _rep(f16_bits_to_f32(d), g // (tkh // 128), g, tn)
    dm = _rep(f16_bits_to_f32(dmin), g // (tkh // 128), g, tn)
    s_lo = df * sc_lo.astype(jnp.int32).astype(F32)
    s_hi = (df * sc_hi.astype(jnp.int32).astype(F32)) * (1.0 / 16.0)
    m_lo = dm * mn_lo.astype(jnp.int32).astype(F32)
    m_hi = dm * mn_hi.astype(jnp.int32).astype(F32)
    # single int32 widen; no shift — the hi nibble keeps its <<4, which
    # the scale/16 cancels exactly (powers of two in f32)
    q = qs.astype(jnp.int32)
    w_lo = (q & 0x0F).astype(F32) * _rep(s_lo, 32, tkh, tn)
    w_hi = (q & 0xF0).astype(F32) * _rep(s_hi, 32, tkh, tn)
    xlf = x_lo.astype(F32)
    xhf = x_hi.astype(F32)
    corr = (jnp.dot(_group_sums(xlf, g), m_lo, preferred_element_type=F32)
            + jnp.dot(_group_sums(xhf, g), m_hi, preferred_element_type=F32))
    return (jnp.dot(xlf, w_lo, preferred_element_type=F32)
            + jnp.dot(xhf, w_hi, preferred_element_type=F32) - corr)


def q4k_v2(vals, tkh, tn):
    x_lo, x_hi, qs, sc_lo, sc_hi, mn_lo, mn_hi, d, dmin = vals
    q = qs.astype(jnp.int32)
    g = tkh // 32
    df = _rep(f16_bits_to_f32(d), g // (tkh // 128), g, tn)
    dm = _rep(f16_bits_to_f32(dmin), g // (tkh // 128), g, tn)
    s_lo = df * sc_lo.astype(jnp.int32).astype(F32)
    s_hi = df * sc_hi.astype(jnp.int32).astype(F32)
    m_lo = dm * mn_lo.astype(jnp.int32).astype(F32)
    m_hi = dm * mn_hi.astype(jnp.int32).astype(F32)
    lo3 = (q & 0x0F).astype(F32).reshape(g, 32, tn)
    hi3 = (q >> 4).astype(F32).reshape(g, 32, tn)
    w_lo = (lo3 * s_lo[:, None, :]).reshape(tkh, tn)
    w_hi = (hi3 * s_hi[:, None, :]).reshape(tkh, tn)
    xlf = x_lo.astype(F32)
    xhf = x_hi.astype(F32)
    corr = (jnp.dot(_group_sums(xlf, g), m_lo, preferred_element_type=F32)
            + jnp.dot(_group_sums(xhf, g), m_hi, preferred_element_type=F32))
    return (jnp.dot(xlf, w_lo, preferred_element_type=F32)
            + jnp.dot(xhf, w_hi, preferred_element_type=F32) - corr)


def q4k_v3(vals, tkh, tn):
    x_lo, x_hi, qs, sc_lo, sc_hi, mn_lo, mn_hi, d, dmin = vals
    g = tkh // 32
    df = _rep(f16_bits_to_f32(d), g // (tkh // 128), g, tn)
    dm = _rep(f16_bits_to_f32(dmin), g // (tkh // 128), g, tn)
    s_lo = df * sc_lo.astype(jnp.int32).astype(F32)
    s_hi = (df * sc_hi.astype(jnp.int32).astype(F32)) * (1.0 / 16.0)
    m_lo = dm * mn_lo.astype(jnp.int32).astype(F32)
    m_hi = dm * mn_hi.astype(jnp.int32).astype(F32)
    q = qs.astype(jnp.int32)
    lo3 = (q & 0x0F).astype(F32).reshape(g, 32, tn)
    hi3 = (q & 0xF0).astype(F32).reshape(g, 32, tn)
    w_lo = (lo3 * s_lo[:, None, :]).reshape(tkh, tn)
    w_hi = (hi3 * s_hi[:, None, :]).reshape(tkh, tn)
    xlf = x_lo.astype(F32)
    xhf = x_hi.astype(F32)
    corr = (jnp.dot(_group_sums(xlf, g), m_lo, preferred_element_type=F32)
            + jnp.dot(_group_sums(xhf, g), m_hi, preferred_element_type=F32))
    return (jnp.dot(xlf, w_lo, preferred_element_type=F32)
            + jnp.dot(xhf, w_hi, preferred_element_type=F32) - corr)


def q4k_v4(vals, tkh, tn):
    x_lo, x_hi, qs, sc_lo, sc_hi, mn_lo, mn_hi, d, dmin = vals
    g = tkh // 32
    df = _rep(f16_bits_to_f32(d), g // (tkh // 128), g, tn)
    dm = _rep(f16_bits_to_f32(dmin), g // (tkh // 128), g, tn)
    s_lo = df * sc_lo.astype(jnp.int32).astype(F32)
    s_hi = (df * sc_hi.astype(jnp.int32).astype(F32)) * (1.0 / 16.0)
    m_lo = dm * mn_lo.astype(jnp.int32).astype(F32)
    m_hi = dm * mn_hi.astype(jnp.int32).astype(F32)
    q = qs.astype(jnp.int32)
    lo3 = (q & 0x0F).astype(F32).reshape(g, 32, tn)
    hi3 = (q & 0xF0).astype(F32).reshape(g, 32, tn)
    w_lo = (lo3 * s_lo[:, None, :]).reshape(tkh, tn)
    w_hi = (hi3 * s_hi[:, None, :]).reshape(tkh, tn)
    xlf = x_lo.astype(F32)
    xhf = x_hi.astype(F32)
    xc = jnp.concatenate([xlf, xhf], axis=1)
    wc = jnp.concatenate([w_lo, w_hi], axis=0)
    corr = (jnp.dot(_group_sums(xlf, g), m_lo, preferred_element_type=F32)
            + jnp.dot(_group_sums(xhf, g), m_hi, preferred_element_type=F32))
    return jnp.dot(xc, wc, preferred_element_type=F32) - corr


def q4k_v7(vals, tkh, tn):
    """Group-partial dots (r4): the per-element SCALE MULTIPLY leaves the
    VPU. x expands into a 0/1-masked [g, tkh] matrix (g*tkh elements —
    32x fewer than the [tkh, tn] weight tile), one MXU dot per nibble
    half yields per-group partials P [g, tn], and the scales multiply P
    (again g*tn elements, 32x fewer). Per-element VPU work drops to
    widen+and+convert; the MXU does g x more MACs — idle capacity at
    T=1. Numerically TIGHTER than the scale-on-weights form: x*q
    products are exact in f32 (4-bit codes are exact bf16), and the f32
    scale applies after accumulation instead of rounding q*s to bf16."""
    x_lo, x_hi, qs, sc_lo, sc_hi, mn_lo, mn_hi, d, dmin = vals
    g = tkh // 32
    df = _rep(f16_bits_to_f32(d), g // (tkh // 128), g, tn)
    dm = _rep(f16_bits_to_f32(dmin), g // (tkh // 128), g, tn)
    s_lo = df * sc_lo.astype(jnp.int32).astype(F32)
    s_hi = (df * sc_hi.astype(jnp.int32).astype(F32)) * (1.0 / 16.0)
    m_lo = dm * mn_lo.astype(jnp.int32).astype(F32)
    m_hi = dm * mn_hi.astype(jnp.int32).astype(F32)
    q = qs.astype(jnp.int32)
    lo = (q & 0x0F).astype(F32)                    # [tkh, tn]
    hi = (q & 0xF0).astype(F32)
    xlf = x_lo.astype(F32)                         # [1, tkh]
    xhf = x_hi.astype(F32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (g, tkh), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, tkh), 1) // 32
    mask = (rows == cols).astype(F32)              # [g, tkh]
    p_lo = jnp.dot(mask * xlf, lo, preferred_element_type=F32)  # [g, tn]
    p_hi = jnp.dot(mask * xhf, hi, preferred_element_type=F32)
    acc = s_lo * p_lo + s_hi * p_hi
    y = jnp.sum(acc, axis=0, keepdims=True)        # sublane reduce [1, tn]
    corr = (jnp.dot(_group_sums(xlf, g), m_lo, preferred_element_type=F32)
            + jnp.dot(_group_sums(xhf, g), m_hi, preferred_element_type=F32))
    return y - corr


def q4k_v5(vals, tkh, tn):
    """Ceiling probe: scales/mins arrive as READY f32 [K/64, N] planes."""
    x_lo, x_hi, qs, s_lo_p, s_hi_p, m_lo_p, m_hi_p = vals
    g = tkh // 32
    q = qs.astype(jnp.int32)
    lo3 = (q & 0x0F).astype(F32).reshape(g, 32, tn)
    hi3 = (q & 0xF0).astype(F32).reshape(g, 32, tn)
    w_lo = (lo3 * s_lo_p.reshape(g, 1, tn)).reshape(tkh, tn)
    w_hi = (hi3 * s_hi_p.reshape(g, 1, tn)).reshape(tkh, tn)
    xlf = x_lo.astype(F32)
    xhf = x_hi.astype(F32)
    corr = (jnp.dot(_group_sums(xlf, g), m_lo_p, preferred_element_type=F32)
            + jnp.dot(_group_sums(xhf, g), m_hi_p, preferred_element_type=F32))
    return (jnp.dot(xlf, w_lo, preferred_element_type=F32)
            + jnp.dot(xhf, w_hi, preferred_element_type=F32) - corr)


# ---------------------------------------------------------------------------
# Q6_K bodies
# ---------------------------------------------------------------------------

def q6k_v0(vals, tkh, tn):
    x_lo, x_hi, ql, qh, sc_lo, sc_hi, d = vals
    q = ql.astype(jnp.int32)
    nh = tkh // 64
    qh3 = qh.reshape(nh, 32, tn).astype(jnp.int32)
    hb_lo = jnp.concatenate([(qh3 >> 0) & 3, (qh3 >> 2) & 3],
                            axis=1).reshape(tkh, tn)
    hb_hi = jnp.concatenate([(qh3 >> 4) & 3, (qh3 >> 6) & 3],
                            axis=1).reshape(tkh, tn)
    g = tkh // 16
    df = _rep(f16_bits_to_f32(d), g // (tkh // 128), g, tn)
    s_lo = df * sc_lo.astype(jnp.int32).astype(F32)
    s_hi = df * sc_hi.astype(jnp.int32).astype(F32)
    w_lo = ((q & 0x0F) | (hb_lo << 4)).astype(F32) * _rep(s_lo, 16, tkh, tn)
    w_hi = ((q >> 4) | (hb_hi << 4)).astype(F32) * _rep(s_hi, 16, tkh, tn)
    xlf = x_lo.astype(F32)
    xhf = x_hi.astype(F32)
    corr = 32.0 * (jnp.dot(_group_sums(xlf, g), s_lo, preferred_element_type=F32)
                   + jnp.dot(_group_sums(xhf, g), s_hi, preferred_element_type=F32))
    return (jnp.dot(xlf, w_lo, preferred_element_type=F32)
            + jnp.dot(xhf, w_hi, preferred_element_type=F32) - corr)


def q6k_v3(vals, tkh, tn):
    """uint8-& extraction + 3d broadcast; hi-bits still need the int32 path
    for qh (2-bit fields at 4 positions)."""
    x_lo, x_hi, ql, qh, sc_lo, sc_hi, d = vals
    nh = tkh // 64
    qh3 = qh.reshape(nh, 32, tn).astype(jnp.int32)
    hb_lo = jnp.concatenate([(qh3 & 0x03) << 4, (qh3 & 0x0C) << 2],
                            axis=1).reshape(tkh, tn)
    hb_hi = jnp.concatenate([(qh3 & 0x30), (qh3 & 0xC0) >> 2],
                            axis=1).reshape(tkh, tn)
    g = tkh // 16
    df = _rep(f16_bits_to_f32(d), g // (tkh // 128), g, tn)
    s_lo = df * sc_lo.astype(jnp.int32).astype(F32)
    s_hi = df * sc_hi.astype(jnp.int32).astype(F32)
    qli = ql.astype(jnp.int32)
    lo = ((qli & 0x0F) | hb_lo).astype(F32)
    hi = ((qli & 0xF0) >> 4 | hb_hi).astype(F32)
    gl = g
    w_lo = (lo.reshape(gl, 16, tn) * s_lo.reshape(gl, 1, tn)).reshape(tkh, tn)
    w_hi = (hi.reshape(gl, 16, tn) * s_hi.reshape(gl, 1, tn)).reshape(tkh, tn)
    xlf = x_lo.astype(F32)
    xhf = x_hi.astype(F32)
    corr = 32.0 * (jnp.dot(_group_sums(xlf, g), s_lo, preferred_element_type=F32)
                   + jnp.dot(_group_sums(xhf, g), s_hi, preferred_element_type=F32))
    return (jnp.dot(xlf, w_lo, preferred_element_type=F32)
            + jnp.dot(xhf, w_hi, preferred_element_type=F32) - corr)


def q6k_v7(vals, tkh, tn):
    """Group-partial dots for Q6_K (see q4k_v7): scales (16-elem groups,
    g = tkh/16) multiply [g, tn] partials instead of [tkh, tn] weights."""
    x_lo, x_hi, ql, qh, sc_lo, sc_hi, d = vals
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
    df = _rep(f16_bits_to_f32(d), g // (tkh // 128), g, tn)
    s_lo = df * sc_lo.astype(jnp.int32).astype(F32)
    s_hi = df * sc_hi.astype(jnp.int32).astype(F32)
    s_hi16 = s_hi * (1.0 / 16.0)
    xlf = x_lo.astype(F32)
    xhf = x_hi.astype(F32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (g, tkh), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, tkh), 1) // 16
    mask = (rows == cols).astype(F32)
    p_lo = jnp.dot(mask * xlf, lo, preferred_element_type=F32)
    p_hi = jnp.dot(mask * xhf, hi16, preferred_element_type=F32)
    acc = s_lo * p_lo + s_hi16 * p_hi
    y = jnp.sum(acc, axis=0, keepdims=True)
    corr = 32.0 * (jnp.dot(_group_sums(xlf, g), s_lo,
                           preferred_element_type=F32)
                   + jnp.dot(_group_sums(xhf, g), s_hi,
                             preferred_element_type=F32))
    return y - corr


def q6k_w6(vals, tkh, tn):
    """Widened: q int8 [K, N] (value - 32 pre-applied at pack), scales at
    16 granularity. tkh here = FULL tk (no nibble halves)."""
    x, q, s = vals  # s ready f32 [K/16, N]
    w = q.astype(F32) * (s.reshape(tkh // 16, 1, tn)
                         * jnp.ones((1, 16, 1), F32)).reshape(tkh, tn)
    return jnp.dot(x.astype(F32), w, preferred_element_type=F32)


def q6k_w6b(vals, tkh, tn):
    x, q, s = vals
    w = (q.astype(F32).reshape(tkh // 16, 16, tn)
         * s.reshape(tkh // 16, 1, tn)).reshape(tkh, tn)
    return jnp.dot(x.astype(F32), w, preferred_element_type=F32)


# ---------------------------------------------------------------------------
# Harness
# ---------------------------------------------------------------------------

def _stamp(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def run_variant(name, tile_fn, x_inputs, planes, rows_div, tk, tn=512,
                golden=None):
    _stamp(f"begin {name} tk={tk}")
    """x_inputs: list of [1, Kx] activation arrays; planes: list of
    [rows, N] arrays with rows = K // rows_div[i]."""
    t = 1
    grid = (N // tn, K // tk)
    tkh = tk // 2 if len(x_inputs) == 2 else tk
    n_x = len(x_inputs)

    x_specs = [pl.BlockSpec((t, tkh), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)] * n_x
    plane_specs = [pl.BlockSpec((tk // dv, tn), lambda i, j: (j, i),
                                memory_space=pltpu.VMEM) for dv in rows_div]

    def kernel(*args):
        *ins, out = args
        xs = [r[:] for r in ins[:n_x]]
        ps = [r[:] for r in ins[n_x:]]

        @pl.when(pl.program_id(1) == 0)
        def _():
            out[:] = jnp.zeros_like(out)
        out[:] += tile_fn(xs + ps, tkh, tn)

    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    # NOTE: the axon sitecustomize pins the TPU default backend even under
    # JAX_PLATFORMS=cpu — decide interpret mode explicitly via env
    import os
    interp = os.environ.get("KQV_INTERPRET", "0") == "1"

    def call(xs):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((t, N), F32),
            grid=grid,
            in_specs=x_specs + plane_specs,
            out_specs=pl.BlockSpec((t, tn), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM),
            compiler_params=cparams,
            interpret=interp,
        )(*xs, *planes)

    nbytes = sum(int(p.size) * p.dtype.itemsize for p in planes)

    import functools as _ft

    @_ft.partial(jax.jit, static_argnames=("iters",))
    def loop(xs, iters):
        def body(i, xs):
            y = call(xs)
            bump = 1e-30 * y[0, :xs[0].shape[1]].reshape(1, -1)
            return [xs[0] + bump] + list(xs[1:])
        return jax.lax.fori_loop(0, iters, body, list(xs))

    y = call(x_inputs)
    if golden is not None:
        err = float(jnp.abs(y - golden).max() / (jnp.abs(golden).max() + 1e-9))
        ok = "OK " if err < 2e-5 else f"ERR {err:.2e}"
    else:
        ok = "--"
    # Delta timing: the D2H fence costs ~27 ms on this rig, swamping
    # per-iter time at small counts — time two iteration counts and use
    # the difference, which cancels every constant overhead.
    n1, n2 = ITERS, 5 * ITERS
    np.asarray(loop(x_inputs, n1)[0])   # compile+warm both programs
    np.asarray(loop(x_inputs, n2)[0])
    t0 = time.perf_counter()
    np.asarray(loop(x_inputs, n1)[0])
    t1 = time.perf_counter()
    np.asarray(loop(x_inputs, n2)[0])
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / (n2 - n1)
    print(f"{name:34s} tk={tk:5d}: {dt*1e6:7.1f} us  "
          f"{nbytes/dt/1e9:6.0f} GB/s  [{ok}]", flush=True)
    return nbytes / dt / 1e9


def _synth_planes_device(dtype, seed=0):
    """Random planes created ON DEVICE (tunnel H2D is ~0.12 GB/s — a 34 MB
    plane upload costs minutes; see docs/PERFORMANCE.md measurement rules).
    d/dmin planes are a constant sane f16 bit pattern; golden comes from
    dequant_planes_jnp on-device (bit-identical unpack semantics to the
    numpy path, parity-tested in tests/test_ops.py)."""
    from ntransformer_tpu.core.layout import LAYOUTS
    key = jax.random.PRNGKey(seed)
    planes = {}
    for spec in LAYOUTS[dtype]:
        rows = K // spec.rows_div
        key, sub = jax.random.split(key)
        if spec.np_dtype == "uint16":
            planes[spec.name] = jnp.full((rows, N), 0x1C00, jnp.uint16)
        elif spec.np_dtype == "int8":
            planes[spec.name] = jax.random.randint(sub, (rows, N), -16, 16,
                                                   jnp.int8)
        else:
            planes[spec.name] = jax.random.randint(sub, (rows, N), 0, 256,
                                                   jnp.uint8)
    return planes


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    from ntransformer_tpu.ops.dequant_jnp import dequant_planes_jnp
    from ntransformer_tpu.ops.linear import split_x_jnp

    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, K), jnp.float32) * 0.5

    if which in ("q4_k", "all"):
        print(f"=== Q4_K  [{K}x{N}] ===", flush=True)
        pl_d = _synth_planes_device(DType.Q4_K)

        @jax.jit
        def _golden(pls, xx):
            wt = dequant_planes_jnp(pls, DType.Q4_K, K, N)
            return jnp.dot(xx, wt, precision=jax.lax.Precision.HIGHEST)
        golden_full = None  # bodies verified exact vs numpy dequant directly
        xl, xh = split_x_jnp(x, DType.Q4_K)
        names = ["qs", "sc_lo", "sc_hi", "mn_lo", "mn_hi", "d", "dmin"]
        divs = [2, 64, 64, 64, 64, 256, 256]
        base_planes = [pl_d[nm] for nm in names]
        for nm, fn in [("q4k v0 current", q4k_v0),
                       ("q4k v1 foldshift", q4k_v1),
                       ("q4k v2 3d-bcast", q4k_v2),
                       ("q4k v3 v1+v2", q4k_v3),
                       ("q4k v4 v3+concat-dot", q4k_v4),
                       ("q4k v7 group-dot", q4k_v7)]:
            for tk in (4096, 2048):
                run_variant(nm, fn, [xl, xh], base_planes, divs, tk,
                            golden=golden_full)
        # v5: precombined f32 scale planes (computed on device)
        d_f = f16_bits_to_f32(pl_d["d"])
        dm_f = f16_bits_to_f32(pl_d["dmin"])
        s_lo_f = jnp.repeat(d_f, 4, 0) * pl_d["sc_lo"].astype(jnp.float32)
        s_hi_f = (jnp.repeat(d_f, 4, 0) * pl_d["sc_hi"].astype(jnp.float32)) / 16.0
        m_lo_f = jnp.repeat(dm_f, 4, 0) * pl_d["mn_lo"].astype(jnp.float32)
        m_hi_f = jnp.repeat(dm_f, 4, 0) * pl_d["mn_hi"].astype(jnp.float32)
        v5_planes = [pl_d["qs"], s_lo_f, s_hi_f, m_lo_f, m_hi_f]
        for tk in (4096, 2048):
            run_variant("q4k v5 precombined-f32", q4k_v5, [xl, xh],
                        v5_planes, [2, 64, 64, 64, 64], tk,
                        golden=golden_full)

    if which in ("q6_k", "all"):
        print(f"=== Q6_K  [{K}x{N}] ===", flush=True)
        pl_d = _synth_planes_device(DType.Q6_K, seed=2)

        @jax.jit
        def _golden6(pls, xx):
            wt = dequant_planes_jnp(pls, DType.Q6_K, K, N)
            return jnp.dot(xx, wt, precision=jax.lax.Precision.HIGHEST)
        golden_full = None  # bodies verified exact vs numpy dequant directly
        xl, xh = split_x_jnp(x, DType.Q6_K)
        names = ["ql", "qh", "sc_lo", "sc_hi", "d"]
        divs = [2, 4, 32, 32, 256]
        base_planes = [pl_d[nm] for nm in names]
        for tk in (4096, 2048):
            run_variant("q6k v0 current", q6k_v0, [xl, xh], base_planes,
                        divs, tk, golden=golden_full)
            run_variant("q6k v3 u8&+3d", q6k_v3, [xl, xh], base_planes,
                        divs, tk, golden=golden_full)
            run_variant("q6k v7 group-dot", q6k_v7, [xl, xh], base_planes,
                        divs, tk, golden=golden_full)
        # w6 widened: int8 [K, N] + ready f32 scales, built ON DEVICE from
        # the same planes (original element order)
        @jax.jit
        def _widen(pls):
            ql, qh = pls["ql"], pls["qh"]
            qh_i = qh.astype(jnp.int32).reshape(K // 128, 32, N)
            hb_lo = jnp.concatenate([(qh_i >> 0) & 3, (qh_i >> 2) & 3],
                                    axis=1).reshape(K // 2, N)
            hb_hi = jnp.concatenate([(qh_i >> 4) & 3, (qh_i >> 6) & 3],
                                    axis=1).reshape(K // 2, N)
            qli = ql.astype(jnp.int32)
            lo_v = ((qli & 0x0F) | (hb_lo << 4)) - 32
            hi_v = ((qli >> 4) | (hb_hi << 4)) - 32
            # interleave lo/hi halves back to original order (unit 128)
            lo3 = lo_v.reshape(K // 128, 64, N)
            hi3 = hi_v.reshape(K // 128, 64, N)
            q_full = jnp.concatenate([lo3, hi3], axis=1).reshape(K, N)
            d_f = f16_bits_to_f32(pls["d"])
            s_lo = jnp.repeat(d_f, 8, 0) * pls["sc_lo"].astype(jnp.float32)
            s_hi = jnp.repeat(d_f, 8, 0) * pls["sc_hi"].astype(jnp.float32)
            sl3 = s_lo.reshape(K // 128, 4, N)
            sh3 = s_hi.reshape(K // 128, 4, N)
            s_full = jnp.concatenate([sl3, sh3], axis=1).reshape(K // 16, N)
            return q_full.astype(jnp.int8), s_full
        q_int8, s_full = _widen(pl_d)
        xw = x
        w6_planes = [q_int8, s_full]
        for tk in (4096, 2048):
            run_variant("q6k w6 widened-int8", q6k_w6, [xw], w6_planes,
                        [1, 16], tk, golden=golden_full)
            run_variant("q6k w6b widened-3d", q6k_w6b, [xw], w6_planes,
                        [1, 16], tk, golden=golden_full)


if __name__ == "__main__":
    main()
