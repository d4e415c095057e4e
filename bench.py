"""Driver benchmark: decode tokens/sec on the flagship config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config: Llama-3.1-8B-shaped Q8_0, fully resident in HBM, greedy decode with
the whole loop on-device (BASELINE.md headline: reference = 48.9 tok/s on an
RTX 3090). Weights are synthetic (decode timing is weight-value-independent);
the quantized compute path is identical to real-model serving.
"""
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import jax
import jax.numpy as jnp

BASELINE_8B_Q8_DECODE = 48.9  # tok/s (README.md:9 of the reference)


def main():
    preset = "8b"
    dtype = "q8_0"
    n_tokens = 64
    max_seq = 1024  # benchmark context; keeps KV small, matches short-prompt decode

    from ntransformer_tpu.models.synth import model_nbytes, synth_model
    from ntransformer_tpu.models.llama import KVCache, forward
    from ntransformer_tpu.inference.engine import _decode_loop_greedy

    cfg, arch, weights = synth_model(preset, dtype, max_seq_len=max_seq)
    kv = KVCache.create(arch)
    nbytes = model_nbytes(weights)
    print(f"# model {cfg.model_name}: {nbytes/1e9:.2f} GB on "
          f"{jax.devices()[0].device_kind}", file=sys.stderr)

    # short prefill
    tokens = jnp.arange(8, dtype=jnp.int32) + 3
    logits, kv, _ = forward(arch, weights, kv, tokens, 0)
    first = jnp.argmax(logits[0]).astype(jnp.int32)

    # compile + warm up the fused decode loop
    toks, kv = _decode_loop_greedy(arch, weights, kv, first, 8, 2)
    jax.block_until_ready(toks)

    t0 = time.perf_counter()
    toks, kv = _decode_loop_greedy(arch, weights, kv, first, 10, n_tokens)
    jax.block_until_ready(toks)
    dt = time.perf_counter() - t0

    tps = n_tokens / dt
    print(f"# decode: {n_tokens} tokens in {dt*1e3:.1f} ms "
          f"({tps:.2f} tok/s, {nbytes*tps/1e9:.0f} GB/s effective)",
          file=sys.stderr)
    print(json.dumps({
        "metric": "llama8b_q8_0_resident_decode",
        "value": round(tps, 2),
        "unit": "tok/s",
        "vs_baseline": round(tps / BASELINE_8B_Q8_DECODE, 3),
    }))


if __name__ == "__main__":
    main()
