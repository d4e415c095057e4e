"""Decode GEMV bandwidth, model-faithful: scan over STACKED weights
(exactly how forward()'s layer scan feeds the kernels) so XLA can prefetch
the next iteration's planes during compute. Compares kernel variants and a
sum-only DMA ceiling.
"""
import functools
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntransformer_tpu.core.dtypes import DType
from ntransformer_tpu.ops.linear import QLinear, qmatmul
from ntransformer_tpu.ops.pallas.matmul import quant_matmul_pallas
from ntransformer_tpu.ops.f16bits import f16_bits_to_f32

K, N = 4096, 14336
L = 32          # scan length (like model layers)
REPS = 3


def timed(name, run, x0, nbytes_per_step):
    float(run(x0))
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = run(x0)
    float(r)
    dt = (time.perf_counter() - t0) / (REPS * L)
    print(f"{name:<28} {dt*1e6:8.1f} us/step  {nbytes_per_step/dt/1e9:7.1f} GB/s")


def scan_chain(step, planes):
    """scan over stacked planes — per-iter slices feed the kernel, matching
    the model's layer scan."""
    @jax.jit
    def run(x0):
        def body(x, ws):
            y = step(x, ws)
            x = (x0 + y[:, :K] * 1e-9).astype(x0.dtype)
            return x, None
        x, _ = jax.lax.scan(body, x0, planes)
        return x.sum()
    return run


def main():
    key = jax.random.PRNGKey(0)
    qs = jax.random.randint(key, (L, K, N), -100, 100, jnp.int8)
    d = jnp.full((L, K // 32, N), jnp.uint16(0x1c00))  # small f16 bits
    nbytes = int(qs[0].nbytes + d[0].nbytes)
    print(f"bytes/step: {nbytes/1e6:.1f} MB; total stack {L*nbytes/1e9:.1f} GB")
    x0 = jnp.ones((1, K), jnp.bfloat16)

    def step_kernel(x, ws):
        ql = QLinear(DType.Q8_0, K, N, {"qs": ws[0], "d": ws[1]})
        return quant_matmul_pallas(x, ql, out_dtype=jnp.float32)
    timed("pallas current", scan_chain(step_kernel, (qs, d)), x0, nbytes)

    def step_jnp(x, ws):
        ql = QLinear(DType.Q8_0, K, N, {"qs": ws[0], "d": ws[1]})
        return qmatmul(x, ql, use_kernel=False)
    timed("xla dequant+dot", scan_chain(step_jnp, (qs, d)), x0, nbytes)

    # sum-only DMA ceiling
    def sum_kernel(q_ref, o_ref, *, tk):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += q_ref[:].astype(jnp.float32).sum(axis=0, keepdims=True)[:, :128]

    def step_sum(x, ws):
        tk = 2048
        s = pl.pallas_call(
            functools.partial(sum_kernel, tk=tk),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            grid=(K // tk,),
            in_specs=[pl.BlockSpec((tk, N), lambda j: (j, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 128), lambda j: (0, 0),
                                   memory_space=pltpu.VMEM),
        )(ws[0])
        return jnp.pad(s, ((0, 0), (0, N - 128))) + x[:, :1]
    timed("pallas sum-only (DMA cap)", scan_chain(step_sum, (qs, d)), x0,
          int(qs[0].nbytes))

    # tile-size sweep for the current kernel
    from ntransformer_tpu.ops.pallas import matmul as M
    orig = M._largest_tile
    for tn_cap, tk_cap in [(256, 1024), (512, 1024), (1024, 2048),
                           (512, 4096), (2048, 512), (1024, 1024),
                           (14336, 4096)]:
        def patched(dim, candidates, _tn=tn_cap, _tk=tk_cap):
            cands = [c for c in (_tk, _tn, *candidates)
                     if dim % c == 0 and c <= max(_tn, _tk)]
            cands = [c for c in sorted(set(cands), reverse=True)
                     if (c <= _tn if dim == N else c <= _tk)]
            return cands[0] if cands else orig(dim, candidates)
        M._largest_tile = patched
        M._quant_matmul_impl.clear_cache()
        try:
            timed(f"pallas tn<={tn_cap} tk<={tk_cap}",
                  scan_chain(step_kernel, (qs, d)), x0, nbytes)
        except Exception as e:
            print(f"tn<={tn_cap} tk<={tk_cap}: FAILED {str(e)[:80]}")
        finally:
            M._largest_tile = orig
    M._quant_matmul_impl.clear_cache()


if __name__ == "__main__":
    main()
