"""Probe Mosaic/Pallas support for the w4a8 int8-MXU dequant-dot path (r5).

Questions, answered on the real chip:
  P1  does jnp.dot(int8, int8, preferred_element_type=int32) lower in a
      Pallas TPU kernel?
  P2  do jnp.int4 arrays work as pallas_call inputs (BlockSpec over int4)?
      does int4 -> int8 convert lower in-kernel? does dot(int8, int4) lower?
  P3  does int32 -> int8 narrowing convert lower in-kernel?
  P4  wall-clock of candidate w4a8 kernel bodies at the 8B gate/up shape
      (K=4096, N=14336) vs the shipped exact Q4_K kernel.

Run: python experiments/w4a8_probe.py [--timing]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def report(name, fn):
    try:
        out = fn()
        print(f"[OK]   {name}: {out}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " | ")[:300]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
        return False


# --- P1: int8 x int8 dot ---------------------------------------------------

def p1_int8_dot():
    K, N = 512, 512

    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           preferred_element_type=jnp.int32)

    a = jnp.asarray(np.random.randint(-127, 127, (32, K)), jnp.int8)
    b = jnp.asarray(np.random.randint(-8, 8, (K, N)), jnp.int8)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((32, N), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    ref = np.asarray(a, np.int32) @ np.asarray(b, np.int32)
    got = np.asarray(out)
    assert (got == ref).all(), f"mismatch: {np.abs(got - ref).max()}"
    return "exact int32 result"


# --- P2: int4 input plane --------------------------------------------------

def p2_int4_input():
    K, N = 512, 512

    def kern(a_ref, w_ref, o_ref):
        w8 = w_ref[:].astype(jnp.int8)
        o_ref[:] = jnp.dot(a_ref[:], w8, preferred_element_type=jnp.int32)

    a = jnp.asarray(np.random.randint(-127, 127, (32, K)), jnp.int8)
    wnp = np.random.randint(-8, 8, (K, N))
    w = jnp.asarray(wnp, jnp.int4)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((32, N), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, w)
    ref = np.asarray(a, np.int32) @ wnp.astype(np.int32)
    got = np.asarray(out)
    assert (got == ref).all(), f"mismatch: {np.abs(got - ref).max()}"
    return "int4 plane load + astype(int8) + dot exact"


def p2b_int4_direct_dot():
    K, N = 512, 512

    def kern(a_ref, w_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], w_ref[:],
                           preferred_element_type=jnp.int32)

    a = jnp.asarray(np.random.randint(-127, 127, (32, K)), jnp.int8)
    wnp = np.random.randint(-8, 8, (K, N))
    w = jnp.asarray(wnp, jnp.int4)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((32, N), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, w)
    ref = np.asarray(a, np.int32) @ wnp.astype(np.int32)
    got = np.asarray(out)
    assert (got == ref).all(), f"mismatch: {np.abs(got - ref).max()}"
    return "direct dot(int8, int4) exact"


def p2c_int4_u4():
    # unsigned-ish codes 0..15 stored as int4? int4 range is [-8, 7]; store
    # q-8 instead and fold the +8 into the affine min. Check int4 -> int32.
    K, N = 512, 512

    def kern(w_ref, o_ref):
        o_ref[:] = w_ref[:].astype(jnp.int32)

    wnp = np.random.randint(-8, 8, (K, N))
    w = jnp.asarray(wnp, jnp.int4)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((K, N), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(w)
    assert (np.asarray(out) == wnp).all()
    return "int4 -> int32 convert exact"


# --- P3: int32 -> int8 narrowing -------------------------------------------

def p3_narrow():
    K = 512

    def kern(x_ref, o_ref):
        v = x_ref[:].astype(jnp.int32)
        o_ref[:] = (v & 0x0F).astype(jnp.int8)

    x = jnp.asarray(np.random.randint(0, 255, (32, K)), jnp.uint8)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((32, K), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    ref = (np.asarray(x, np.int32) & 0x0F).astype(np.int8)
    assert (np.asarray(out) == ref).all()
    return "u8 widen -> mask -> int8 narrow exact"


# --- P4: block-diagonal group-partial int8 dot ------------------------------

def p4_group_partial():
    """The w4a8 core op: expanded block-diagonal activations [G, K] int8
    dotted against codes [K, N] -> per-group partials [G, N] int32."""
    K, N, GRP = 1024, 512, 256
    G = K // GRP

    def kern(a_ref, w_ref, o_ref):
        a = a_ref[:].astype(jnp.int32)  # [1, K]
        rows = jax.lax.broadcasted_iota(jnp.int32, (G, K), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (G, K), 1) // GRP
        mask = (rows == cols).astype(jnp.int32)
        lhs = (mask * a).astype(jnp.int8)          # [G, K] block-diagonal
        o_ref[:] = jnp.dot(lhs, w_ref[:].astype(jnp.int8),
                           preferred_element_type=jnp.int32)

    a = jnp.asarray(np.random.randint(-127, 127, (1, K)), jnp.int8)
    wnp = np.random.randint(-8, 8, (K, N))
    w = jnp.asarray(wnp, jnp.int4)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((G, N), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, w)
    an = np.asarray(a, np.int32)[0]
    ref = np.stack([an[g * GRP:(g + 1) * GRP] @ wnp[g * GRP:(g + 1) * GRP].astype(np.int32)
                    for g in range(G)])
    got = np.asarray(out)
    assert (got == ref).all(), f"mismatch max {np.abs(got - ref).max()}"
    return "block-diagonal group-partial int8 dot exact"


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    ok1 = report("P1 int8xint8 dot", p1_int8_dot)
    ok2 = report("P2 int4 plane + astype(int8) dot", p2_int4_input)
    ok2b = report("P2b direct dot(int8, int4)", p2b_int4_direct_dot)
    ok2c = report("P2c int4 -> int32 convert", p2c_int4_u4)
    ok3 = report("P3 int32 -> int8 narrow", p3_narrow)
    ok4 = report("P4 group-partial block-diag dot", p4_group_partial)
    print("summary:", dict(int8dot=ok1, int4load=ok2, int4dot=ok2b,
                           int4convert=ok2c, narrow=ok3, grouppartial=ok4))


if __name__ == "__main__":
    sys.exit(main())
