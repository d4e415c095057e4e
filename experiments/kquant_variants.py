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
ITERS = 50


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

def run_variant(name, tile_fn, x_inputs, planes, rows_div, tk, tn=512,
                golden=None):
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

    @jax.jit
    def loop(xs):
        def body(i, xs):
            y = call(xs)
            bump = 1e-30 * y[0, :xs[0].shape[1]].reshape(1, -1)
            return [xs[0] + bump] + list(xs[1:])
        return jax.lax.fori_loop(0, ITERS, body, list(xs))

    y = call(x_inputs)
    if golden is not None:
        err = float(jnp.abs(y - golden).max() / (jnp.abs(golden).max() + 1e-9))
        ok = "OK " if err < 2e-5 else f"ERR {err:.2e}"
    else:
        ok = "--"
    r = loop(x_inputs)
    np.asarray(r[0])  # true fence
    t0 = time.perf_counter()
    r = loop(x_inputs)
    np.asarray(r[0])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} tk={tk:5d}: {dt*1e6:7.1f} us  "
          f"{nbytes/dt/1e9:6.0f} GB/s  [{ok}]")
    return nbytes / dt / 1e9


def _planes_cached(w, dtype, tag):
    """Quantize+relayout once per (shape, dtype); cache to /tmp — the 1-core
    numpy quantize of a 58M-param matrix costs minutes per run otherwise."""
    import os
    path = f"/tmp/kqv_{tag}_{N}x{K}.npz"
    if os.path.exists(path):
        z = np.load(path)
        return {k: z[k] for k in z.files}
    raw = quantize(w, dtype)
    planes = relayout(raw, dtype, N, K)
    np.savez(path, **planes)
    return planes


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((N, K)) * 0.1).astype(np.float32)
    xs = (rng.standard_normal((1, K)) * 0.5).astype(np.float32)

    if which in ("q4_k", "all"):
        print(f"=== Q4_K  [{K}x{N}] ===")
        pl_np = _planes_cached(w, DType.Q4_K, "q4k")
        from ntransformer_tpu.core.layout import dequant_planes
        wt = dequant_planes(pl_np, DType.Q4_K, K, N)
        golden_full = jnp.asarray(xs) @ jnp.asarray(wt)
        x_lo, x_hi = split_x(xs, DType.Q4_K)
        xl, xh = jnp.asarray(x_lo), jnp.asarray(x_hi)
        names = ["qs", "sc_lo", "sc_hi", "mn_lo", "mn_hi", "d", "dmin"]
        divs = [2, 64, 64, 64, 64, 256, 256]
        base_planes = [jnp.asarray(pl_np[nm]) for nm in names]
        for tk in (4096, 2048):
            run_variant("q4k v0 current", q4k_v0, [xl, xh], base_planes,
                        divs, tk, golden=golden_full)
        for nm, fn in [("q4k v1 u8&+foldshift", q4k_v1),
                       ("q4k v2 3d-bcast", q4k_v2),
                       ("q4k v3 v1+v2", q4k_v3),
                       ("q4k v4 v3+concat-dot", q4k_v4)]:
            for tk in (4096, 2048):
                run_variant(nm, fn, [xl, xh], base_planes, divs, tk,
                            golden=golden_full)
        # v5: precombined f32 scale planes [K/64->broadcast 32? use K/32]
        d_f = pl_np["d"].view(np.float16).astype(np.float32)
        dm_f = pl_np["dmin"].view(np.float16).astype(np.float32)
        s_lo_f = np.repeat(d_f, 4, 0) * pl_np["sc_lo"].astype(np.float32)
        s_hi_f = (np.repeat(d_f, 4, 0) * pl_np["sc_hi"].astype(np.float32)) / 16.0
        m_lo_f = np.repeat(dm_f, 4, 0) * pl_np["mn_lo"].astype(np.float32)
        m_hi_f = np.repeat(dm_f, 4, 0) * pl_np["mn_hi"].astype(np.float32)
        v5_planes = [jnp.asarray(pl_np["qs"])] + [
            jnp.asarray(a) for a in (s_lo_f, s_hi_f, m_lo_f, m_hi_f)]
        for tk in (4096, 2048):
            run_variant("q4k v5 precombined-f32", q4k_v5, [xl, xh],
                        v5_planes, [2, 64, 64, 64, 64], tk,
                        golden=golden_full)

    if which in ("q6_k", "all"):
        print(f"=== Q6_K  [{K}x{N}] ===")
        pl_np = _planes_cached(w, DType.Q6_K, "q6k")
        from ntransformer_tpu.core.layout import dequant_planes
        wt = dequant_planes(pl_np, DType.Q6_K, K, N)
        golden_full = jnp.asarray(xs) @ jnp.asarray(wt)
        x_lo, x_hi = split_x(xs, DType.Q6_K)
        xl, xh = jnp.asarray(x_lo), jnp.asarray(x_hi)
        names = ["ql", "qh", "sc_lo", "sc_hi", "d"]
        divs = [2, 4, 32, 32, 256]
        base_planes = [jnp.asarray(pl_np[nm]) for nm in names]
        for tk in (4096, 2048):
            run_variant("q6k v0 current", q6k_v0, [xl, xh], base_planes,
                        divs, tk, golden=golden_full)
            run_variant("q6k v3 u8&+3d", q6k_v3, [xl, xh], base_planes,
                        divs, tk, golden=golden_full)
        # w6 widened: int8 [K, N] in ORIGINAL element order + f32 scales
        d_f = pl_np["d"].view(np.float16).astype(np.float32)
        s_lo = np.repeat(d_f, 8, 0) * pl_np["sc_lo"].astype(np.float32)
        s_hi = np.repeat(d_f, 8, 0) * pl_np["sc_hi"].astype(np.float32)
        # reconstruct int8 values in original order from planes
        ql, qh = pl_np["ql"], pl_np["qh"]
        qh_i = qh.astype(np.int32).reshape(K // 128, 32, N)
        hb_lo = np.concatenate([(qh_i >> 0) & 3, (qh_i >> 2) & 3], 1).reshape(K // 2, N)
        hb_hi = np.concatenate([(qh_i >> 4) & 3, (qh_i >> 6) & 3], 1).reshape(K // 2, N)
        lo_v = ((ql & 0x0F).astype(np.int32) | (hb_lo << 4)) - 32
        hi_v = ((ql >> 4).astype(np.int32) | (hb_hi << 4)) - 32
        from ntransformer_tpu.core.layout import _split_index
        lo_idx, hi_idx = _split_index(K, 128)
        q_int8 = np.zeros((K, N), np.int8)
        q_int8[lo_idx] = lo_v.astype(np.int8)
        q_int8[hi_idx] = hi_v.astype(np.int8)
        s_full = np.zeros((K // 16, N), np.float32)
        s_full[(lo_idx.reshape(-1, 16)[:, 0] // 16)] = s_lo
        s_full[(hi_idx.reshape(-1, 16)[:, 0] // 16)] = s_hi
        xw = jnp.asarray(xs)
        w6_planes = [jnp.asarray(q_int8), jnp.asarray(s_full)]
        for tk in (4096, 2048):
            run_variant("q6k w6 widened-int8", q6k_w6, [xw], w6_planes,
                        [1, 16], tk, golden=golden_full)
            run_variant("q6k w6b widened-3d", q6k_w6b, [xw], w6_planes,
                        [1, 16], tk, golden=golden_full)


if __name__ == "__main__":
    main()
