"""w4a8 kernel variant shootout (r5 verdict item 1).

The r4 roofline proved exact K-quant dequant is VPU-bound at ~3.5
ops/element (matmuls-only floor 10.79 ms/tok Q4_K_M). The named escape is
an int8 MXU dequant-dot with quantized activations: per-(256-block, column)
affine requant w ~= s[b,n]*q - m[b,n] with 4-bit codes, int8 activations
with per-256-block scales, group partials P[g,n] computed ON THE MXU via a
block-diagonal expanded activation matrix, and the scale fixup applied at
[G, N] granularity (256x fewer elements than the weights).

jnp.int4 planes are unusable on this platform (RecursionError on any jit
transfer of S4 arrays — experiments/w4a8_probe.py), so codes stay packed
two-per-byte in uint8 planes (same 0.5 B/element DMA) and the unpack cost
ladder is what this shootout measures:

  wa_v1   unsigned codes, widen->mask/shift->narrow: u8->i32, lo=q&15,
          hi=q>>4, 2x i32->i8 narrows (~2.5 VPU ops/elem). Uses only ops
          proven by w4a8_probe (P1/P3).
  wa_v2e  SIGNED codes (q-8 packed as nibbles), int8-bitwise only:
          lo16 = qs << 4 and hi16 = qs & 0xF0 are EXACTLY 16*q_signed by
          two's complement; /16 folds into the scale planes
          (~1 op/elem, zero converts) — needs Mosaic int8 shl/and.
  wa_v2c  like v2e but lo8 = (qs & 15) ^ 8 (biased +8; the 8*sum(ahat)
          correction rides a 5th tiny f32 dot) — needs int8 and/xor only.
  wa_v3   unsigned codes, uint8 rhs dot probe: lo = qs & 15, hi = qs >> 4
          all in uint8, dot(int8, uint8) (~1.5 ops/elem if it lowers).

Pack layout (split unit 512 — lo half holds EVEN 256-groups, hi half ODD):
  qs   uint8 [K/2, N]   plane row 256c+j packs elems (512c+j, 512c+256+j)
  s_lo/s_hi f32 [K/512, N]   per-256-group scale
  m_lo/m_hi f32 [K/512, N]   per-256-group min (w = s*code - m)

Activation prep (outside the kernel, XLA-fused): per-256-group
alpha = amax/127, ahat = round(x/alpha) int8 (carried int32), exact group
sums of x for the min term, quantized group sums for v2c's bias correction.

Run: python experiments/w4a8_variants.py [--shape K N] [--iters N]
"""
from __future__ import annotations

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

F32 = jnp.float32
I32 = jnp.int32
I8 = jnp.int8
GRP = 256          # quant group (elements)
UNIT = 512         # activation split unit (2 groups)

K, N = 4096, 14336
ITERS = 100


def _stamp(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# activation prep (shared by all variants)
# ---------------------------------------------------------------------------

def prep_activations(x):
    """x [1, K] f32 -> dict of kernel inputs (all jnp, XLA ops)."""
    k = x.shape[1]
    g_all = k // GRP
    xg = x.reshape(1, g_all, GRP)
    alpha = jnp.max(jnp.abs(xg), axis=2) / 127.0        # [1, G_all]
    alpha = jnp.maximum(alpha, 1e-30)
    ahat = jnp.round(xg / alpha[:, :, None]).astype(I32)  # [1, G_all, GRP]
    xsum = jnp.sum(xg, axis=2)                          # [1, G_all] exact
    qsum = jnp.sum(ahat, axis=2).astype(F32) * alpha    # alpha_g * sum(ahat)
    a2 = ahat.reshape(1, g_all // 2, 2, GRP)
    a_lo = a2[:, :, 0, :].reshape(1, k // 2)
    a_hi = a2[:, :, 1, :].reshape(1, k // 2)

    def ev(v):
        return v.reshape(1, g_all // 2, 2)[:, :, 0]

    def od(v):
        return v.reshape(1, g_all // 2, 2)[:, :, 1]

    return dict(
        a_lo=a_lo, a_hi=a_hi,
        alpha_lo=ev(alpha), alpha_hi=od(alpha),
        xsum_lo=ev(xsum), xsum_hi=od(xsum),
        qsum_lo=ev(qsum), qsum_hi=od(qsum),
    )


def _blockdiag_i8(a_i32, g, grp):
    """[1, tkh] int32 codes -> [g, tkh] int8 block-diagonal."""
    tkh = a_i32.shape[1]
    rows = jax.lax.broadcasted_iota(I32, (g, tkh), 0)
    cols = jax.lax.broadcasted_iota(I32, (g, tkh), 1) // grp
    return jnp.where(rows == cols, jnp.broadcast_to(a_i32, (g, tkh)),
                     0).astype(I8)


def _idot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=I32)


def _fdot(a, b):
    # fixup dots are tiny ([1,G]x[G,tn]) but numerically load-bearing: the
    # default one-pass bf16 MXU rounds s*P products to ~4e-3 relative;
    # HIGHEST keeps the fixup exact-in-f32 at negligible cost.
    return jnp.dot(a, b, preferred_element_type=F32,
                   precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# kernel bodies. vals: (a_lo, a_hi, alpha_lo, alpha_hi, xsum_lo, xsum_hi,
#                       qsum_lo, qsum_hi, qs, s_lo, s_hi, m_lo, m_hi) tiles.
# Each returns the [1, tn] partial. Plane semantics per variant (the pack
# step pre-divides scales where a 16x code is used).
# ---------------------------------------------------------------------------

def body_v1(vals, tkh, tn):
    (a_lo, a_hi, alpha_lo, alpha_hi, xsum_lo, xsum_hi, _qlo, _qhi,
     qs, s_lo, s_hi, m_lo, m_hi) = vals
    g = tkh // GRP
    q = qs.astype(I32)
    lo = (q & 0x0F).astype(I8)
    hi = (q >> 4).astype(I8)
    p_lo = _idot(_blockdiag_i8(a_lo, g, GRP), lo).astype(F32)  # [g, tn]
    p_hi = _idot(_blockdiag_i8(a_hi, g, GRP), hi).astype(F32)
    return (_fdot(alpha_lo, p_lo * s_lo) + _fdot(alpha_hi, p_hi * s_hi)
            - _fdot(xsum_lo, m_lo) - _fdot(xsum_hi, m_hi))


def body_v1b(vals, tkh, tn):
    """Like v1 but the fixup is pure-VPU: alpha/xsum arrive TRANSPOSED
    [G, 1], multiply the [G, tn] partials by sublane broadcast (exact f32),
    and one sublane sum folds the groups — no MXU fixup dots at all."""
    (a_lo, a_hi, alphaT_lo, alphaT_hi, xsumT_lo, xsumT_hi, _qlo, _qhi,
     qs, s_lo, s_hi, m_lo, m_hi) = vals
    g = tkh // GRP
    q = qs.astype(I32)
    lo = (q & 0x0F).astype(I8)
    hi = (q >> 4).astype(I8)
    p_lo = _idot(_blockdiag_i8(a_lo, g, GRP), lo).astype(F32)  # [g, tn]
    p_hi = _idot(_blockdiag_i8(a_hi, g, GRP), hi).astype(F32)
    acc = (p_lo * (s_lo * alphaT_lo) + p_hi * (s_hi * alphaT_hi)
           - m_lo * xsumT_lo - m_hi * xsumT_hi)
    return jnp.sum(acc, axis=0, keepdims=True)


def body_v1c(vals, tkh, tn):
    """v1 with ONE concatenated HIGHEST fixup dot: lhs [1, 4G] arrives
    pre-concatenated as (alpha_lo, alpha_hi, -xsum_lo, -xsum_hi) in the
    qsum_lo slot; rhs stacks (p_lo*s_lo, p_hi*s_hi, m_lo, m_hi)."""
    (a_lo, a_hi, _al, _ah, _xl, _xh, fix_lhs, _qhi,
     qs, s_lo, s_hi, m_lo, m_hi) = vals
    g = tkh // GRP
    q = qs.astype(I32)
    lo = (q & 0x0F).astype(I8)
    hi = (q >> 4).astype(I8)
    p_lo = _idot(_blockdiag_i8(a_lo, g, GRP), lo).astype(F32)
    p_hi = _idot(_blockdiag_i8(a_hi, g, GRP), hi).astype(F32)
    rhs = jnp.concatenate([p_lo * s_lo, p_hi * s_hi, m_lo, m_hi], axis=0)
    return _fdot(fix_lhs, rhs)


def body_v2e(vals, tkh, tn):
    """Signed codes; 1 int8 bitwise op per element, zero converts.
    Kernel planes carry s/16 (packed by adjust_planes)."""
    (a_lo, a_hi, alpha_lo, alpha_hi, xsum_lo, xsum_hi, _qlo, _qhi,
     qs, s16_lo, s16_hi, m_lo, m_hi) = vals
    g = tkh // GRP
    lo16 = qs << 4              # int8: == 16 * q_signed_lo (mod-256 magic)
    hi16 = qs & jnp.int8(-16)   # int8: == 16 * q_signed_hi
    p_lo = _idot(_blockdiag_i8(a_lo, g, GRP), lo16).astype(F32)
    p_hi = _idot(_blockdiag_i8(a_hi, g, GRP), hi16).astype(F32)
    return (_fdot(alpha_lo, p_lo * s16_lo) + _fdot(alpha_hi, p_hi * s16_hi)
            - _fdot(xsum_lo, m_lo) - _fdot(xsum_hi, m_hi))


def body_v2c(vals, tkh, tn):
    """Signed codes, and/xor only: lo8 = (qs & 15) ^ 8 == q_signed_lo + 8;
    the +8 bias is removed by the qsum8 dot (8 * alpha_g * sum(ahat_g))."""
    (a_lo, a_hi, alpha_lo, alpha_hi, xsum_lo, xsum_hi, qsum_lo, _qhi,
     qs, s_lo, s16_hi, m_lo, m_hi) = vals
    g = tkh // GRP
    lo8 = (qs & jnp.int8(0x0F)) ^ jnp.int8(0x08)
    hi16 = qs & jnp.int8(-16)
    p_lo = _idot(_blockdiag_i8(a_lo, g, GRP), lo8).astype(F32)
    p_hi = _idot(_blockdiag_i8(a_hi, g, GRP), hi16).astype(F32)
    return (_fdot(alpha_lo, p_lo * s_lo) + _fdot(alpha_hi, p_hi * s16_hi)
            - _fdot(qsum_lo * 8.0, s_lo)
            - _fdot(xsum_lo, m_lo) - _fdot(xsum_hi, m_hi))


def body_v3(vals, tkh, tn):
    """Unsigned codes, uint8 lane ops + dot(int8, uint8) probe."""
    (a_lo, a_hi, alpha_lo, alpha_hi, xsum_lo, xsum_hi, _qlo, _qhi,
     qs, s_lo, s_hi, m_lo, m_hi) = vals
    g = tkh // GRP
    lo = qs & jnp.uint8(0x0F)
    hi = qs >> 4
    p_lo = _idot(_blockdiag_i8(a_lo, g, GRP), lo).astype(F32)
    p_hi = _idot(_blockdiag_i8(a_hi, g, GRP), hi).astype(F32)
    return (_fdot(alpha_lo, p_lo * s_lo) + _fdot(alpha_hi, p_hi * s_hi)
            - _fdot(xsum_lo, m_lo) - _fdot(xsum_hi, m_hi))


# name -> (body, signed_codes, scale_sixteenth_lo, scale_sixteenth_hi)
BODIES = {
    "wa_v1": (body_v1, False, False, False),
    "wa_v1b": (body_v1b, False, False, False),
    "wa_v1c": (body_v1c, False, False, False),
    "wa_v2e": (body_v2e, True, True, True),
    "wa_v2c": (body_v2c, True, False, True),
    "wa_v3": (body_v3, False, False, False),
}
TRANSPOSED = {"wa_v1b"}


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

def make_planes(key, k, n):
    """Synth planes: random nibble pairs + positive scales + mins."""
    k1, k2, k3 = jax.random.split(key, 3)
    qs = jax.random.randint(k1, (k // 2, n), 0, 256, I32).astype(jnp.uint8)
    g2 = k // UNIT
    s_lo = jax.random.uniform(k2, (g2, n), F32, 0.001, 0.02)
    s_hi = jax.random.uniform(jax.random.fold_in(k2, 1), (g2, n), F32,
                              0.001, 0.02)
    m_lo = jax.random.uniform(k3, (g2, n), F32, -0.05, 0.05)
    m_hi = jax.random.uniform(jax.random.fold_in(k3, 1), (g2, n), F32,
                              -0.05, 0.05)
    return dict(qs=qs, s_lo=s_lo, s_hi=s_hi, m_lo=m_lo, m_hi=m_hi)


@functools.partial(jax.jit, static_argnames=("k", "n", "signed"))
def golden(x, planes, k, n, signed):
    """The kernel's INTENDED value in f32 HIGHEST: quantized activations on
    the s-term, exact x sums on the m-term. Codes: unsigned nibbles 0..15,
    or signed two's-complement nibbles -8..7."""
    acts = prep_activations(x)
    qi = planes["qs"].astype(I32)
    lo_n = qi & 0x0F
    hi_n = qi >> 4
    if signed:
        lo_c = (lo_n - ((lo_n & 0x08) << 1)).astype(F32)
        hi_c = (hi_n - ((hi_n & 0x08) << 1)).astype(F32)
    else:
        lo_c = lo_n.astype(F32)
        hi_c = hi_n.astype(F32)
    g2 = k // UNIT

    def half(codes, s, m, a, alpha, xsum):
        w = (codes.reshape(g2, GRP, n) * s[:, None, :]).reshape(k // 2, n)
        af = (a.reshape(1, g2, GRP).astype(F32)
              * alpha[:, :, None]).reshape(1, k // 2)
        yw = jnp.dot(af, w, preferred_element_type=F32,
                     precision=jax.lax.Precision.HIGHEST)
        ym = jnp.dot(xsum, m, preferred_element_type=F32,
                     precision=jax.lax.Precision.HIGHEST)
        return yw - ym

    return (half(lo_c, planes["s_lo"], planes["m_lo"], acts["a_lo"],
                 acts["alpha_lo"], acts["xsum_lo"])
            + half(hi_c, planes["s_hi"], planes["m_hi"], acts["a_hi"],
                   acts["alpha_hi"], acts["xsum_hi"]))


def run_variant(name, k, n, tk, tn=512):
    body, signed, six_lo, six_hi = BODIES[name]
    planes = make_planes(jax.random.PRNGKey(7), k, n)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, k), F32) * 0.5
    gold = golden(x, planes, k, n, signed)
    kp = dict(planes)
    if six_lo:
        kp["s_lo"] = kp["s_lo"] * (1.0 / 16.0)
    if six_hi:
        kp["s_hi"] = kp["s_hi"] * (1.0 / 16.0)
    if signed:
        kp["qs"] = jax.lax.bitcast_convert_type(kp["qs"], I8)

    tkh = tk // 2
    g2t = tk // UNIT      # scale-plane rows per tile
    grid = (n // tn, k // tk)

    def amap(i, j):
        return (0, j)

    def pmap(i, j):
        return (j, i)

    transposed = name in TRANSPOSED
    small = (pl.BlockSpec((g2t, 1), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM) if transposed
             else pl.BlockSpec((1, g2t), amap, memory_space=pltpu.VMEM))
    smalls = [small] * 6
    if name == "wa_v1c":
        smalls[4] = pl.BlockSpec((1, 4 * g2t), amap, memory_space=pltpu.VMEM)
    in_specs = (
        [pl.BlockSpec((1, tkh), amap, memory_space=pltpu.VMEM)] * 2      # a
        + smalls                                                         # alpha/xsum/qsum
        + [pl.BlockSpec((tkh, tn), pmap, memory_space=pltpu.VMEM)]       # qs
        + [pl.BlockSpec((g2t, tn), pmap, memory_space=pltpu.VMEM)] * 4   # s/m
    )

    def kernel(*args):
        *ins, out = args
        vals = [r[:] for r in ins]

        @pl.when(pl.program_id(1) == 0)
        def _():
            out[:] = jnp.zeros_like(out)
        out[:] += body(vals, tkh, tn)

    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    def call(acts):
        if name == "wa_v1c":
            acts = dict(acts)
            acts["qsum_lo"] = jnp.concatenate(
                [acts["alpha_lo"], acts["alpha_hi"],
                 -acts["xsum_lo"], -acts["xsum_hi"]], axis=1)
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, n), F32),
            grid=grid, in_specs=in_specs,
            out_specs=pl.BlockSpec((1, tn), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM),
            compiler_params=cparams,
        )(acts["a_lo"], acts["a_hi"],
          *[(v.T if transposed else v) for v in
            (acts["alpha_lo"], acts["alpha_hi"], acts["xsum_lo"],
             acts["xsum_hi"], acts["qsum_lo"], acts["qsum_hi"])],
          kp["qs"], kp["s_lo"], kp["s_hi"], kp["m_lo"], kp["m_hi"])

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(x, iters):
        def step(i, x):
            acts = prep_activations(x)
            y = call(acts)
            bump = jnp.pad(y, ((0, 0), (0, max(0, k - n))))[:, :k]
            return x + 1e-30 * bump
        return jax.lax.fori_loop(0, iters, step, x)

    _stamp(f"compile {name} tk={tk}")
    try:
        acts = prep_activations(x)
        y = call(acts)
        err = float(jnp.abs(y - gold).max() / (jnp.abs(gold).max() + 1e-9))
        ok = "OK " if err < 2e-5 else f"ERR {err:.2e}"
    except Exception as e:  # noqa: BLE001
        print(f"{name:8s} tk={tk:5d}: LOWERING FAIL "
              f"{type(e).__name__}: {str(e)[:180]}", flush=True)
        return None

    nbytes = sum(int(v.size) * v.dtype.itemsize for v in kp.values())
    n1, n2 = ITERS, 5 * ITERS
    np.asarray(loop(x, n1))
    np.asarray(loop(x, n2))
    t0 = time.perf_counter()
    np.asarray(loop(x, n1))
    t1 = time.perf_counter()
    np.asarray(loop(x, n2))
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / (n2 - n1)
    print(f"{name:8s} tk={tk:5d}: {dt*1e6:7.1f} us  {nbytes/dt/1e9:6.0f} GB/s"
          f"  [{ok}]", flush=True)
    return nbytes / dt / 1e9


def main():
    global K, N, ITERS
    args = sys.argv[1:]
    if "--shape" in args:
        i = args.index("--shape")
        K, N = int(args[i + 1]), int(args[i + 2])
    if "--iters" in args:
        ITERS = int(args[args.index("--iters") + 1])
    print(f"=== w4a8 shootout [{K}x{N}] backend={jax.default_backend()} ===",
          flush=True)
    names = [a for a in args if a.startswith("wa_")] or ["wa_v1", "wa_v1c"]
    tns = [1024 if "--tn1024" in args else 512]
    for name in names:
        for tn in tns:
            if N % tn:
                continue
            run_variant(name, K, N, K, tn=tn)  # whole-K tiles


if __name__ == "__main__":
    main()
