"""BASELINE config #5 as ONE measured configuration (r3 verdict item 4):
tiered streaming + layer-skip calibration at threshold 0.98 +
self-speculative decoding with draft-k=3, recording all four numbers —
tok/s, acceptance %, layers skipped, and streamed I/O saved per token.

Rig reality: 70B-scale tokens take minutes through the 0.01-0.12 GB/s
tunnel, so the verdict's sanctioned stand-in runs the 1B-shaped Q4_K_M
model with FORCED tiers (8 HBM + 8 streamed of 16 layers) — every
mechanism (SLEP pipeline, skip-driven I/O elision, resident-prefix draft,
streamed verify) is the same code path the 70B configuration uses
(experiments/tiered_70b.py measured that scale solo).

Layer-skip honesty: the 0.98 threshold is calibrated on THIS model's real
cosine profile; if no middle layer crosses it (synthetic weights can be
arbitrarily non-redundant), a second row calibrates at the profile's p75
so the combined skip+spec+tiered machinery is still exercised and
measured. Both rows are reported.

Run: python experiments/config5_combined.py [max_tokens]
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

GGUF = "/root/models_1b/llama1b_q4km.gguf"
N_HBM, N_RAM = 8, 8


def stamp(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main():
    max_tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    from ntransformer_tpu.inference.engine import GenerateConfig, TieredEngine
    from tools.make_test_gguf import write_model

    if not os.path.exists(GGUF):
        stamp("building 1B q4_k_m GGUF (one-time)")
        os.makedirs(os.path.dirname(GGUF), exist_ok=True)
        write_model(GGUF, "1b", "q4_k_m", seed=1)

    eng = TieredEngine.load(GGUF, max_hbm_layers=N_HBM,
                            max_ram_layers=N_RAM)
    tiers = eng.tm.tiers
    layer_b = eng.tm.pack.max_layer_nbytes
    stamp(tiers.describe(layer_b))
    prompt = "The capital of France is"

    # --- 1. layer-skip calibration at the config's 0.98 threshold -------
    stamp("calibrating layer-skip at 0.98 (cosine profile on prefill)")
    _, st = eng.generate(prompt, GenerateConfig(
        max_tokens=4, temperature=0.0, repeat_penalty=1.0,
        skip_threshold=0.98))
    rows = []
    profiles = [("0.98", list(eng.skip))]
    if not eng.skip:
        # synthetic weights: record the real cosine profile and calibrate
        # at its p75 so the combined machinery still gets exercised
        from ntransformer_tpu.models.tiered import TieredKV, forward_tiered
        kv = eng._make_kv()
        ids = eng._encode(prompt)
        _, _, cos = forward_tiered(eng.tm, kv, jnp.asarray(ids, jnp.int32),
                                   0, with_cosine=True)
        cos = np.asarray(cos)
        n = eng.arch.n_layers
        mid = cos[n // 4: (3 * n) // 4]
        thr = float(np.quantile(mid, 0.75))
        stamp(f"no layer crossed 0.98 (middle-band cosines "
              f"{mid.min():.3f}-{mid.max():.3f}); second row at p75 "
              f"threshold {thr:.3f}")
        eng.layer_sel = None
        skipped = eng._calibrate(cos, thr)
        profiles.append((f"p75={thr:.3f}", skipped))

    for label, skipped in profiles:
        eng.skip = frozenset(skipped)
        streamed_skipped = [l for l in skipped if l >= tiers.n_hbm]
        io_saved = len(streamed_skipped) * layer_b
        io_per_tok = (tiers.n_streamed - len(streamed_skipped)) * layer_b

        # --- 2. self-speculative decode (resident prefix = draft) ------
        stamp(f"[skip@{label}] self-spec draft-k=3, {max_tokens} tokens")
        t0 = time.perf_counter()
        text, st = eng.generate_self_speculative(prompt, GenerateConfig(
            max_tokens=max_tokens, temperature=0.0, repeat_penalty=1.0,
            draft_k=3))
        wall = time.perf_counter() - t0
        row = {
            "skip_threshold": label,
            "layers_skipped": len(skipped),
            "skipped_ids": sorted(skipped),
            "streamed_layers_skipped": len(streamed_skipped),
            "io_saved_mb_per_token": round(io_saved / 1e6, 1),
            "io_streamed_mb_per_token": round(io_per_tok / 1e6, 1),
            "decode_tokens": st.decode_tokens,
            "decode_tok_s": round(st.decode_tokens
                                  / (st.decode_ms / 1e3), 4),
            "acceptance_pct": round(100.0 * st.accepted
                                    / max(st.drafted, 1), 1),
            "drafted": st.drafted, "accepted": st.accepted,
            "wall_s": round(wall, 1),
        }
        rows.append(row)
        stamp(f"  {row['decode_tok_s']} tok/s, acceptance "
              f"{row['acceptance_pct']}%, {row['layers_skipped']} skipped "
              f"({row['io_saved_mb_per_token']} MB/tok I/O saved)")

    eng.tm.streamer.close()
    print(json.dumps({"metric": "config5_tiered_skip_selfspec",
                      "tiers": {"hbm": tiers.n_hbm, "ram": tiers.n_ram,
                                "disk": tiers.n_disk},
                      "layer_mb": round(layer_b / 1e6, 1),
                      "rows": rows}))


if __name__ == "__main__":
    main()
