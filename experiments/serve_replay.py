"""Continuous-batching server under an arrival process, on the real chip
(r1 verdict item 4 follow-through): replay a Poisson-like arrival trace
through BatchServer on the synthetic 8B and report aggregate tok/s, ttft
percentiles, and how much admission stalls decode (prefill chunks per
decode step).

Run: python experiments/serve_replay.py [B] [n_requests]
"""
import json
import sys
import time

import os as _os
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from ntransformer_tpu.inference.sampler import SamplerConfig
from ntransformer_tpu.inference.serve import BatchServer, Request
from ntransformer_tpu.models.loader import LoadedModel
from ntransformer_tpu.models.synth import synth_model

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_REQ = int(sys.argv[2]) if len(sys.argv) > 2 else 24


class _BenchTokenizer:
    """Deterministic stand-in: prompts become fixed-length id ramps
    (serving throughput is tokenizer-independent)."""

    eos_id = -1           # unreachable — requests run to max_tokens
    stop_ids = {-1}

    def encode(self, text, add_bos=True, parse_special=False):
        n = 16 + (hash(text) % 48)  # 16..63 prompt tokens
        return [(i * 13 + len(text)) % 500 + 3 for i in range(n)]

    def decode(self, ids):
        return f"<{len(ids)} tokens>"

    def decode_token(self, tid):
        return "."

    def stream_decoder(self):
        class _D:
            def push(self, tid):
                return "."

            def flush(self):
                return ""
        return _D()


def main():
    print(f"# building synth 8b q8_0 (B={B}, {N_REQ} requests)",
          file=sys.stderr, flush=True)
    cfg, arch, weights = synth_model("8b", "q8_0", max_seq_len=1024)
    model = LoadedModel(cfg, arch, weights, _BenchTokenizer(), None)
    srv = BatchServer(model, batch_size=B, admit_chunk=64,
                      sampler_cfg=SamplerConfig(temperature=0.0))
    # compile everything BEFORE the arrival clock starts: a cold program
    # costs minutes of remote compile on this rig and previously showed up
    # as a 184 s ttft p50 — a pure measurement artifact a real server
    # avoids by warming at startup
    warm_s = srv.warmup()
    print(f"# warmup (compile) {warm_s:.1f}s", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    # Poisson arrivals at ~2 req/s after a warm start of B requests
    arrivals = np.concatenate([np.zeros(B),
                               np.cumsum(rng.exponential(0.5, N_REQ - B))])
    reqs = [Request(prompt=f"request number {i} padding {'x' * (i % 37)}",
                    max_tokens=48, arrival_s=float(a))
            for i, a in enumerate(arrivals)]
    stats = srv.run(reqs)
    print("#", stats.report(), file=sys.stderr, flush=True)
    ttft = sorted(stats.ttft_s)
    print(json.dumps({
        "metric": "serve_replay", "B": B, "requests": N_REQ,
        "agg_tok_s": round(stats.tokens_per_s, 1),
        "steps": stats.steps, "prefill_chunks": stats.prefill_chunks,
        "ttft_p50_ms": round(ttft[len(ttft) // 2] * 1e3, 0),
        "ttft_p95_ms": round(ttft[int(len(ttft) * 0.95)] * 1e3, 0),
    }), flush=True)


if __name__ == "__main__":
    main()
