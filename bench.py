"""Driver benchmark: decode tokens/sec on the flagship config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config: Llama-3.1-8B-shaped Q8_0, fully resident in HBM, greedy decode with
the whole loop on-device (BASELINE.md headline: reference = 48.9 tok/s on an
RTX 3090). Weights are synthetic (decode timing is weight-value-independent);
the quantized compute path is identical to real-model serving.

Decode-only by design: the loop starts from a fixed token over a zero KV
cache — decode cost is independent of KV contents, and skipping the prefill
program halves compile time on this rig's slow remote-compile path. The
persistent compilation cache makes reruns fast.
"""
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

_REPO = __file__.rsplit("/", 1)[0]
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

BASELINE_8B_Q8_DECODE = 48.9  # tok/s (README.md:9 of the reference)


def log(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    preset = os.environ.get("NT_BENCH_PRESET", "8b")
    dtype = os.environ.get("NT_BENCH_DTYPE", "q8_0")
    n_tokens = int(os.environ.get("NT_BENCH_TOKENS", "64"))
    fuse = os.environ.get("NT_BENCH_FUSE", "1") != "0"  # fused QKV/gate-up
    max_seq = 1024  # benchmark context; keeps KV small, short-prompt decode

    from ntransformer_tpu.models.synth import model_nbytes, synth_model
    from ntransformer_tpu.models.llama import KVCache
    from ntransformer_tpu.inference.engine import _decode_loop_greedy
    from ntransformer_tpu.models.batched import BatchedKV, batched_decode_step

    t0 = time.perf_counter()
    cfg, arch, weights = synth_model(preset, dtype, max_seq_len=max_seq,
                                     fuse=fuse)
    kv = KVCache.create(arch)
    nbytes = model_nbytes(weights)
    log(f"model {cfg.model_name}: {nbytes/1e9:.2f} GB on "
        f"{jax.devices()[0].device_kind} (built in {time.perf_counter()-t0:.0f}s)")

    # NOTE: sync via an actual D2H readback (np.asarray) — on the axon
    # tunnel platform block_until_ready returns before device execution
    # finishes; only a readback is a true fence (readback floor ~27 ms,
    # <1% of the timed region).
    mode = os.environ.get("NT_BENCH_MODE", "batched1")
    if mode == "fusedloop":
        # legacy r1/r2 harness: the whole decode loop fused in one jit
        first = jnp.int32(3)
        t0 = time.perf_counter()
        toks, kv = _decode_loop_greedy(arch, weights, kv, first, 8, n_tokens)
        np.asarray(toks)
        log(f"compile+warmup decode loop: {time.perf_counter()-t0:.0f}s")

        # two timed attempts, best wins — the first execution after a fresh
        # compile occasionally lands ~1.5x slow on this rig
        dt = float("inf")
        for i in range(2):
            t0 = time.perf_counter()
            toks, kv = _decode_loop_greedy(arch, weights, kv, first,
                                           8 + (i + 1) * n_tokens, n_tokens)
            np.asarray(toks)
            dt = min(dt, time.perf_counter() - t0)
        dt = dt / n_tokens
    else:
        # default: single-stream decode through the batched step at B=1 —
        # the serving path's step (deferred-write kernels: stacked-cache
        # flash attention + one bulk in-place KV append), host-chained as
        # the server runs it. Measured FASTER than the fused loop (r3:
        # 11.8 vs 13.0 ms/tok — the scan carry defeats the bulk append's
        # in-place aliasing, chained dispatch pipelines fine).
        bkv = BatchedKV.create(arch, 1)
        tokens = jnp.full((1,), 3, jnp.int32)
        active = jnp.ones(1, bool)

        def run(n, base):
            nonlocal bkv, tokens
            for i in range(n):
                logits, bkv = batched_decode_step(
                    arch, weights, bkv, tokens,
                    jnp.full(1, base + i, jnp.int32), active)
                tokens = jnp.argmax(logits, -1).astype(jnp.int32)
            np.asarray(tokens)  # true fence

        t0 = time.perf_counter()
        run(8, 8)
        log(f"compile+warmup batched step: {time.perf_counter()-t0:.0f}s")
        dt = float("inf")
        for i in range(2):
            t0 = time.perf_counter()
            run(n_tokens, 24 + i * n_tokens)
            dt = min(dt, (time.perf_counter() - t0) / n_tokens)

    tps = 1.0 / dt
    log(f"decode: {dt*1e3:.2f} ms/tok "
        f"({tps:.2f} tok/s, {nbytes*tps/1e9:.0f} GB/s effective)")
    print(json.dumps({
        "metric": f"llama{preset}_{dtype}_resident_decode",
        "value": round(tps, 2),
        "unit": "tok/s",
        "vs_baseline": round(tps / BASELINE_8B_Q8_DECODE, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
