"""Speculative acceptance on LEARNED weights (r5 verdict item 3).

Every prior acceptance number came from random synthetic weights (3.2% —
the half-depth draft had no predictive power). models/repolm512_q8.gguf is
trained on this repo's own text, so the resident-prefix draft should
predict well on in-distribution prompts — the honest analogue of the
reference's 60-80% on real Llama (engine.cpp:357-545).

Measures, on the real TPU:
  1. Engine.generate_self_speculative (greedy, K=4, draft = first L/2
     layers): acceptance %, tok/s vs plain generate.
  2. BatchServer spec_k=3 greedy: serving-path acceptance + steps saved.
  3. BatchServer spec_k=3 temperature=0.8: SAMPLED spec (greedy-draft
     rejection sampling) acceptance.

Run: python experiments/spec_repolm.py
"""
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np  # noqa: E402

MODEL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "models", "repolm512_q8.gguf")

PROMPTS = [
    "def forward(",
    "import jax\nimport jax.numpy as jnp\n",
    "the reference's warp-per-row quantized GEMV family",
    "## Performance notes",
]


def stamp(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main():
    import jax
    from ntransformer_tpu.inference.engine import Engine, GenerateConfig
    from ntransformer_tpu.inference.sampler import SamplerConfig
    from ntransformer_tpu.inference.serve import BatchServer, Request

    print(f"# device: {jax.devices()}", flush=True)

    # --- 1. engine self-spec, greedy ---------------------------------------
    eng = Engine.load(MODEL)
    cfg = GenerateConfig(max_tokens=96, temperature=0.0, repeat_penalty=1.0,
                        draft_k=4)
    stamp("plain generate (compile + run)")
    for p in PROMPTS[:1]:
        eng.generate(p, cfg)  # warm
    t0 = time.time()
    plain_tok = 0
    for p in PROMPTS:
        _, st = eng.generate(p, cfg)
        plain_tok += st.decode_tokens
    plain_s = time.time() - t0
    stamp(f"plain: {plain_tok} tokens in {plain_s:.1f}s "
          f"({plain_tok/plain_s:.1f} tok/s)")

    stamp("self-spec generate")
    eng.generate_self_speculative(PROMPTS[0], cfg)  # warm
    t0 = time.time()
    acc = drafted = spec_tok = 0
    for p in PROMPTS:
        _, st = eng.generate_self_speculative(p, cfg)
        acc += st.accepted
        drafted += st.drafted
        spec_tok += st.decode_tokens
    spec_s = time.time() - t0
    rate = 100.0 * acc / max(drafted, 1)
    print(f"ENGINE self-spec K=4 draft=L/2: acceptance {rate:.1f}% "
          f"({acc}/{drafted}); {spec_tok/spec_s:.1f} tok/s vs plain "
          f"{plain_tok/plain_s:.1f} ({spec_tok/spec_s/(plain_tok/plain_s):.2f}x)",
          flush=True)
    del eng

    # --- 2. serving spec, greedy -------------------------------------------
    from ntransformer_tpu.models.loader import load_model
    model = load_model(MODEL)

    def serve(temp, spec_k):
        srv = BatchServer(model, batch_size=4, spec_k=spec_k,
                          sampler_cfg=SamplerConfig(temperature=temp,
                                                    seed=11))
        reqs = [Request(prompt=p, max_tokens=64) for p in PROMPTS]
        t0 = time.time()
        stats = srv.run(reqs)
        dt = time.time() - t0
        return stats, dt

    stamp("serving plain greedy")
    st0, dt0 = serve(0.0, 0)
    stamp("serving spec greedy")
    st1, dt1 = serve(0.0, 3)
    r1 = 100.0 * st1.spec_accepted / max(st1.spec_drafted, 1)
    print(f"SERVE greedy spec_k=3: acceptance {r1:.1f}% "
          f"({st1.spec_accepted}/{st1.spec_drafted}); full-model steps "
          f"{st1.steps} vs plain {st0.steps}; tokens {st1.tokens}",
          flush=True)

    # --- 3. serving spec, sampled ------------------------------------------
    stamp("serving spec sampled (temperature 0.8)")
    st2, dt2 = serve(0.8, 3)
    r2 = 100.0 * st2.spec_accepted / max(st2.spec_drafted, 1)
    print(f"SERVE sampled spec_k=3 T=0.8: acceptance {r2:.1f}% "
          f"({st2.spec_accepted}/{st2.spec_drafted}); steps {st2.steps}; "
          f"tokens {st2.tokens}", flush=True)

    # --- 4. acceptance vs draft depth / K (engine self-spec) ----------------
    for dl, k in ((5, 2), (5, 4), (3, 2)):
        eng2 = Engine.load(MODEL)
        c2 = GenerateConfig(max_tokens=96, temperature=0.0,
                            repeat_penalty=1.0, draft_k=k)
        acc = drafted = tok = 0
        t0 = time.time()
        for p in PROMPTS:
            _, st = eng2.generate_self_speculative(
                p, c2, draft_layers=dl)
            acc += st.accepted
            drafted += st.drafted
            tok += st.decode_tokens
        dt = time.time() - t0
        print(f"ENGINE self-spec K={k} draft={dl}/6: acceptance "
              f"{100.0*acc/max(drafted,1):.1f}% ({acc}/{drafted}); "
              f"{tok/dt:.1f} tok/s", flush=True)
        del eng2


if __name__ == "__main__":
    main()
