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

    tps = n_tokens / dt
    log(f"decode: {n_tokens} tokens in {dt*1e3:.1f} ms "
        f"({tps:.2f} tok/s, {nbytes*tps/1e9:.0f} GB/s effective)")
    print(json.dumps({
        "metric": "llama8b_q8_0_resident_decode",
        "value": round(tps, 2),
        "unit": "tok/s",
        "vs_baseline": round(tps / BASELINE_8B_Q8_DECODE, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
