"""MoE x tiered streaming: a MEASURED cost model for the de-scope
(r3 verdict item 7 — upgrade the PARITY rationale from argued to measured).

The tiered path refuses MoE models; the claimed reason is that the right
streaming unit is (layer, expert) with routing-aware prefetch, whose hit
rate — not link bandwidth — decides viability. This experiment measures
that hit rate on a real traced routing distribution and prices the
resulting token time against dense-layer SLEP streaming.

Method:
  1. trace routing: run N greedy decode steps on the MoE test model with
     moe_ffn instrumented (jax.debug.callback) to record every layer's
     top-k expert selection per token;
  2. from the trace, measure three prefetch policies' hit rates:
       A  temporal: prefetch the experts the SAME layer used last token
       B  cross-layer: prefetch for layer l+1 what layer l just routed to
       C  frequency: pin the top-m most-used experts per layer resident,
          stream the rest on demand (m = K by default)
  3. price a token: expert bytes come from the model's own plane sizes
     (scaled to Mixtral-8x7B shapes for the headline numbers); a HIT
     overlaps like SLEP (free under the link bound), a MISS is an
     on-demand, non-overlappable load — the router output that names the
     expert only exists after the previous layer computed, so there is no
     pipeline distance to hide it in.

Run: python experiments/moe_tiered_cost.py [n_tokens]
"""
import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

# the axon sitecustomize imports jax before us and pins the TPU platform;
# this experiment is routing analysis — pure CPU (debug.callback is also
# unsupported on the axon backend)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

TRACE: list = []  # (layer_or_flat_index, top-k expert ids) per call


def main():
    n_tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from tools.make_test_gguf import write_model
    from ntransformer_tpu.models import llama
    from ntransformer_tpu.models.loader import load_model
    from ntransformer_tpu.models.llama import KVCache, forward
    from ntransformer_tpu.ops import linear
    linear.KERNEL_MODE = "off"

    path = "/tmp/moe_trace.gguf"
    write_model(path, "moe", "q8_0", seed=21)
    m = load_model(path, with_tokenizer=False)
    arch = m.arch
    E, K, L = arch.n_experts, arch.n_experts_used, arch.n_layers

    # --- 1. instrument routing ------------------------------------------
    orig = llama.moe_ffn

    def traced_moe_ffn(arch_, hf, lw, layer=None, ep_axis=None):
        router = llama.qmatmul(hf, lw.ffn_gate_inp, layer=layer)
        probs = jax.nn.softmax(router.astype(jnp.float32), axis=-1)
        _, tope = jax.lax.top_k(probs, arch_.n_experts_used)

        def rec(li, ids):
            TRACE.append((int(np.asarray(li)), np.asarray(ids)[0].copy()))
        jax.debug.callback(rec, layer if layer is not None else -1, tope)
        return orig(arch_, hf, lw, layer=layer, ep_axis=ep_axis)

    llama.moe_ffn = traced_moe_ffn
    try:
        kv = KVCache.create(arch)
        tok = jnp.asarray([3], jnp.int32)
        logits, kv, _ = forward(arch, m.weights, kv, tok, 0)
        TRACE.clear()  # keep only steady-state decode routing
        for i in range(n_tokens):
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            logits, kv, _ = forward(arch, m.weights, kv, tok, 1 + i)
        np.asarray(logits[:1, :1])
    finally:
        llama.moe_ffn = orig

    # trace -> sel[t, l] = set of experts; callbacks arrive in scan order
    per_tok = [TRACE[i * L: (i + 1) * L] for i in range(len(TRACE) // L)]
    sel = np.zeros((len(per_tok), L, K), np.int32)
    for t, row in enumerate(per_tok):
        for li, (lidx, ids) in enumerate(row):
            sel[t, li] = ids
    print(f"traced {sel.shape[0]} tokens x {L} layers, E={E} K={K}",
          file=sys.stderr)

    # --- 2. prefetch policy hit rates -----------------------------------
    def jacc_hits(a, b):  # fraction of b's needs found in prefetched a
        return len(set(a) & set(b)) / len(b)

    hits_A = np.mean([jacc_hits(sel[t - 1, li], sel[t, li])
                      for t in range(1, sel.shape[0]) for li in range(L)])
    hits_B = np.mean([jacc_hits(sel[t, li - 1], sel[t, li])
                      for t in range(sel.shape[0]) for li in range(1, L)])
    counts = np.zeros((L, E), np.int64)
    for li in range(L):
        np.add.at(counts[li], sel[:, li].ravel(), 1)
    top_m = np.argsort(-counts, axis=1)[:, :K]
    hits_C = np.mean([jacc_hits(top_m[li], sel[t, li])
                      for t in range(sel.shape[0]) for li in range(L)])
    uniform = K / E

    # --- 3. price a token (Mixtral-8x7B scale, Q4_K-class 4.5 bpw) ------
    # per expert per layer: 3 matrices [14336, 4096] = 176 M params
    expert_bytes = 3 * 14336 * 4096 * 4.5 / 8
    dense_layer_bytes = E * expert_bytes          # what dense SLEP streams
    need_bytes = K * expert_bytes                 # what routing actually uses
    results = {"traced_tokens": int(sel.shape[0]), "E": E, "K": K,
               "uniform_hit": round(uniform, 3),
               "hit_temporal_same_layer": round(float(hits_A), 3),
               "hit_cross_layer": round(float(hits_B), 3),
               "hit_topk_frequency_pinned": round(float(hits_C), 3)}
    best_hit = float(max(hits_A, hits_B, hits_C))
    for name, link_gbps in (("pcie_gen4", 25.0), ("ref_gen3x8", 6.5)):
        link = link_gbps * 1e9
        t_dense = dense_layer_bytes / link        # overlapped (SLEP, hit=1)
        # routed streaming moves only the K needed experts' bytes; a MISS
        # means the prefetched (wrong) expert's bytes already consumed
        # link time AND the right bytes must now cross serially — the
        # link does (1 + miss) x the needed bytes
        t_routed = need_bytes * (1 + (1 - best_hit)) / link
        results[f"{name}_per_layer_ms_dense"] = round(t_dense * 1e3, 2)
        results[f"{name}_per_layer_ms_routed"] = round(t_routed * 1e3, 2)
        results[f"{name}_routed_speedup_x"] = round(t_dense / t_routed, 2)
    print(json.dumps(results, indent=1))

    # the decision line: does prediction beat uniform by enough to close
    # a useful fraction of the miss gap? (halving the uniform miss rate)
    predictable = best_hit >= uniform + 0.5 * (1 - uniform)
    print(f"# best prefetch hit {best_hit:.2f} (uniform {uniform:.2f}, "
          f"miss {1-best_hit:.2f}): "
          + ("routing is temporally predictable on this trace - a "
             "(layer, expert) scheduler would beat dense-layer streaming "
             f"~{results['pcie_gen4_routed_speedup_x']}x per byte; the "
             "refusal is a scheduler-scope decision, not a physics one"
             if predictable else
             "near-random routing - on-demand misses erase the byte "
             "savings; the de-scope stands measured"), file=sys.stderr)


if __name__ == "__main__":
    main()
