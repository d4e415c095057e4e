"""Price speculative serving on the real chip (r3 verdict item 5's
measurement half): per-dispatch cost of the three programs a spec round
uses — plain decode step, resident-prefix DRAFT step (n_layers/2), and
the [anchor + K drafts] VERIFY window — at several batch sizes, plus the
derived break-even acceptance rate and the tokens/s ceiling at full
acceptance.

tokens_per_round = B * (1 + acc*K); cost_per_round = K*t_draft + t_verify.
Speculation beats plain decode when
    acc > ((K*t_draft + t_verify) / t_plain - 1) / K.

Acceptance itself is model-dependent (synthetic weights draft near-random,
real models measure 40-80%); this probe prices the MECHANISM so any
model's measured acceptance converts straight to tokens/s.

Run: python experiments/spec_serve_probe.py [K]
"""
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from ntransformer_tpu.models.batched import (BatchedKV, batched_decode_step,
                                             batched_verify_step)
from ntransformer_tpu.models.synth import synth_model

CTX = 1024


def stamp(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def time_fn(fn, iters=16):
    """Delta-timed host-chained dispatches (two counts cancel the fence)."""
    fn(4)
    t0 = time.perf_counter()
    fn(iters)
    t1 = time.perf_counter()
    fn(3 * iters)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (2 * iters)


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cfg, arch, w = synth_model("8b", "q8_0", max_seq_len=CTX)
    nd = arch.n_layers // 2
    results = {"K": K, "draft_layers": nd, "rows": []}
    for B in (1, 4, 8):
        bkv = BatchedKV.create(arch, B)
        toks = jnp.arange(B, dtype=jnp.int32) + 3
        act = jnp.ones(B, bool)
        base = CTX // 2

        state = {"bkv": bkv, "p": 0}

        def plain(n):
            for i in range(n):
                lg, state["bkv"] = batched_decode_step(
                    arch, w, state["bkv"], toks,
                    jnp.full(B, base + (state["p"] + i) % 128, jnp.int32),
                    act)
            np.asarray(jnp.argmax(lg, -1))
            state["p"] += n

        def draft(n):
            for i in range(n):
                lg, state["bkv"] = batched_decode_step(
                    arch, w, state["bkv"], toks,
                    jnp.full(B, base + (state["p"] + i) % 128, jnp.int32),
                    act, n_layers=nd)
            np.asarray(jnp.argmax(lg, -1))
            state["p"] += n

        vt = jnp.tile(toks[:, None], (1, K + 1))

        def verify(n, impl=None):
            for i in range(n):
                lg, state["bkv"] = batched_verify_step(
                    arch, w, state["bkv"], vt,
                    jnp.full(B, base + (state["p"] + i) % 128, jnp.int32),
                    act, impl=impl)
            np.asarray(jnp.argmax(lg, -1))
            state["p"] += n

        t_plain = time_fn(plain)
        t_draft = time_fn(draft)
        t_verify = time_fn(verify, iters=8)       # backend default impl
        # r4 A/B: the jnp write-then-attend verify (dequantizes/reads the
        # full padded cache per layer) vs the kernel verify window (flash
        # + causal virtual block + one bulk T-row append)
        t_verify_jnp = time_fn(lambda n: verify(n, impl="jnp"), iters=8)
        round_cost = K * t_draft + t_verify
        breakeven = max(0.0, (round_cost / t_plain - 1) / K)
        ceiling = B * (1 + K) / round_cost  # acc = 1
        plain_tps = B / t_plain
        row = {"B": B, "ms_plain": round(t_plain * 1e3, 2),
               "ms_draft": round(t_draft * 1e3, 2),
               "ms_verify": round(t_verify * 1e3, 2),
               "ms_verify_jnp": round(t_verify_jnp * 1e3, 2),
               "breakeven_acceptance": round(breakeven, 3),
               "plain_tok_s": round(plain_tps, 1),
               "full_accept_tok_s": round(ceiling, 1),
               "speedup_at_full_accept": round(ceiling / plain_tps, 2)}
        results["rows"].append(row)
        stamp(f"B={B}: plain {row['ms_plain']} ms, draft {row['ms_draft']}, "
              f"verify {row['ms_verify']} -> break-even acc "
              f"{row['breakeven_acceptance']}, ceiling "
              f"{row['speedup_at_full_accept']}x")
        del bkv, state
        import gc
        gc.collect()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
