import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, K = 14336, 4096
qs = jax.device_put(np.random.default_rng(0).integers(-128, 127, (K, N), dtype=np.int8))

def timed(label, f, arg, nbytes, iters=50):
    r = f(arg); r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(arg)
    r.block_until_ready()
    dt = (time.perf_counter()-t0)/iters
    print(f"{label}: {dt*1e6:7.1f} us {nbytes/dt/1e9:6.0f} GB/s", flush=True)

# raw XLA reduction over the array (near-peak HBM read reference)
f1 = jax.jit(lambda a: jnp.sum(a.astype(jnp.int32)))
timed("xla sum int8 [K,N]", f1, qs, K*N)

# pallas sum with strided tiles
def k_sum(a_ref, o_ref):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        o_ref[0, 0] = jnp.int32(0)
    o_ref[0, 0] += jnp.sum(a_ref[:].astype(jnp.int32))

for tk, tn in [(512, 512), (2048, 1024), (512, 14336), (4096, 512)]:
    f2 = jax.jit(lambda a, tk=tk, tn=tn: pl.pallas_call(
        k_sum,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        grid=(K//tk, N//tn),
        in_specs=[pl.BlockSpec((tk, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
    )(a))
    try:
        timed(f"pallas sum tile {tk}x{tn}", f2, qs, K*N)
    except Exception as e:
        print("ERR", tk, tn, str(e).replace(chr(10),' ')[-100:], flush=True)
