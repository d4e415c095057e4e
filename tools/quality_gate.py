"""One-command quality gate for a (real) GGUF model: tokenizer
conformance, greedy goldens, and per-bit-width perplexity deltas — the
real-weights readiness check (r3 verdict item 8).

Given any GGUF path it runs, in order:
  1. tokenizer conformance — encode/decode roundtrips over a tricky-string
     suite (unicode, code, whitespace, multi-byte), plus encode stability
     vs the committed fixture;
  2. greedy goldens — fixed prompts decoded greedily; compared against the
     fixture (and always cross-checked quant-kernels vs bf16-dequant
     compute: the two paths must agree on the argmax chain);
  3. per-dtype PPL — the model is requantized (tools/requant_gguf) to each
     requested dtype and teacher-forced NLL over the corpus is compared to
     the base: |Δnll| must stay within the per-dtype budget (the
     delta-streaming failure mode — garbage output — shows as a
     catastrophic gap; reference R1_delta_streaming.md:144-152).

Fixtures live next to the model (<model>.quality.json) or at --fixtures;
--update (re)writes them, so the day a real Llama GGUF lands, parity vs
real weights is:  python tools/quality_gate.py -m llama.gguf --update
then every later run is a regression gate. Exit code 0 = pass.

The default corpus is this repo's README (any UTF-8 text works; PPL
deltas are corpus-stable because all dtypes share tokenization).
"""
from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

REPO = __file__.rsplit("/", 2)[0]

TOKENIZER_SUITE = [
    "Hello, world!",
    "def forward(x):\n    return x @ w.T  # matmul",
    "  leading and trailing spaces  ",
    "tabs\tand\nnewlines\r\n",
    "números con acentos: àéîõü çñ",
    "emoji: \U0001F680\U0001F9E0 and CJK: 漢字カタカナ",
    "mixed 123 numbers 3.14159 and UPPER_CASE_IDENTS",
    "quotes 'single' \"double\" `back` and <tags>",
]

GOLDEN_PROMPTS = ["def ", "The ", "import ", "# "]

# |Δ nll/token| budget vs the base model, per requant target. Generous
# enough for real-model quantization error, tight enough that a broken
# dequant chain (wrong scales, swapped planes) fails by orders of
# magnitude. "+w4a8" rows load the requanted file with --w4a8 (runtime
# W4A8 conversion + int8 activations) and run DECODE-MODE PPL (per-token
# T=1 stepping — the path whose numerics w4a8 changes); their deltas are
# measured against a decode-mode base NLL.
PPL_BUDGET = {"q8_0": 0.02, "q6_k": 0.05, "q4_k_m": 0.15, "q4_0": 0.25,
              "w4a8": 0.25, "q6_k+w4a8": 0.3, "q4_k_m+w4a8": 0.35,
              # w8a8 (r5 serving format): per-column int8 weights + int8
              # activations — typically tiny deltas; the budget catches a
              # broken scale/fixup chain, not honest quant noise
              "w8a8": 0.1, "q8_0+w8a8": 0.1, "q6_k+w8a8": 0.15,
              "q4_k_m+w8a8": 0.25}


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def _tok_report(model) -> dict:
    tok = model.tokenizer
    suite = {}
    ok = True
    for s in TOKENIZER_SUITE:
        ids = tok.encode(s, add_bos=False)
        rt = tok.decode(ids)
        suite[s] = {"ids_sha": hashlib.sha256(
            json.dumps(ids).encode()).hexdigest()[:16], "n": len(ids),
            "roundtrip": rt == s}
        ok = ok and rt == s
    return {"ok": ok, "suite": suite}


def _goldens(path: str, n_tokens: int) -> dict:
    """Greedy texts on the quant-kernel path (the exact fixture anchor) +
    the max relative PREFILL-logit deviation between the quant-kernel and
    bf16-dequant compute paths. The cross-compute check is logit-level,
    not chain-level: a near-tie argmax legitimately flips a greedy chain
    between two correct compute paths, but the logits themselves must
    agree to quantization-rounding tolerance."""
    import numpy as np
    from ntransformer_tpu.inference.engine import Engine, GenerateConfig
    cfg = GenerateConfig(max_tokens=n_tokens, temperature=0.0,
                         repeat_penalty=1.0)
    out = {"quant": {}, "logit_rel_err": 0.0}
    logits = {}
    for compute in ("quant", "bf16"):
        eng = Engine.load(path, compute=compute)
        logits[compute] = {}
        for p in GOLDEN_PROMPTS:
            ids = eng._encode(p)
            kv = eng._make_kv()
            lg, _, _ = eng._prefill(kv, ids)
            logits[compute][p] = np.asarray(lg[0], np.float32)
            if compute == "quant":
                text, _ = eng.generate(p, cfg)
                out["quant"][p] = {"text": text, "prompt_ids": ids}
        del eng
    for p in GOLDEN_PROMPTS:
        a, b = logits["quant"][p], logits["bf16"][p]
        rel = float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))
        out["logit_rel_err"] = max(out["logit_rel_err"], rel)
    return out


def _ppl(path: str, ids, ctx: int, w4a8: bool = False,
         mode: str = "prefill", w8a8: bool = False) -> float:
    from ntransformer_tpu.models.loader import load_model
    from tools.perplexity import perplexity
    model = load_model(path, w4a8=w4a8, w8a8=w8a8)
    r = perplexity(model, ids, ctx, mode=mode)
    return float(r["nll_per_token"])


def run_gate(model_path: str, corpus: str, dtypes: list[str],
             fixtures_path: str | None, update: bool, ctx: int = 256,
             windows: int = 8, golden_tokens: int = 24) -> dict:
    from ntransformer_tpu.core.dtypes import DType
    from ntransformer_tpu.models.loader import load_model
    from tools.requant_gguf import requant

    results = {"model": os.path.basename(model_path), "pass": True,
               "checks": {}}

    def fail(check, msg):
        results["pass"] = False
        results["checks"][check]["ok"] = False
        results["checks"][check].setdefault("errors", []).append(msg)
        log(f"FAIL [{check}]: {msg}")

    fx_path = fixtures_path or model_path + ".quality.json"
    fixture = None
    if os.path.exists(fx_path) and not update:
        fixture = json.load(open(fx_path))

    # 1. tokenizer conformance
    log("tokenizer conformance")
    base = load_model(model_path)
    tk = _tok_report(base)
    results["checks"]["tokenizer"] = {"ok": tk["ok"],
                                      "suite": tk["suite"]}
    if not tk["ok"]:
        bad = [s for s, v in tk["suite"].items() if not v["roundtrip"]]
        fail("tokenizer", f"roundtrip failed for {bad}")
    if fixture:
        for s, v in tk["suite"].items():
            want = fixture["checks"]["tokenizer"]["suite"].get(s)
            if want and want["ids_sha"] != v["ids_sha"]:
                fail("tokenizer", f"encode drifted for {s!r}")
    del base

    # 2. greedy goldens (quant kernels vs bf16 dequant must agree;
    #    fixture comparison catches cross-version drift)
    log("greedy goldens")
    g = _goldens(model_path, golden_tokens)
    ok = g["logit_rel_err"] < 2e-2
    results["checks"]["goldens"] = {"ok": ok, "outputs": g["quant"],
                                    "logit_rel_err": round(
                                        g["logit_rel_err"], 6)}
    if not ok:
        fail("goldens", "quant vs bf16 compute prefill logits diverged: "
             f"rel err {g['logit_rel_err']:.4f} >= 2e-2")
    if fixture:
        for p in GOLDEN_PROMPTS:
            want = fixture["checks"]["goldens"]["outputs"].get(p)
            if want and want["text"] != g["quant"][p]["text"]:
                fail("goldens", f"greedy output drifted for prompt {p!r}")

    # 3. per-dtype PPL deltas
    log(f"per-dtype PPL on {corpus} (ctx {ctx}, {windows} windows)")
    m0 = load_model(model_path, with_tokenizer=True)
    text = open(corpus, encoding="utf-8", errors="replace").read()
    ids = m0.tokenizer.encode(text, add_bos=True)[: windows * ctx]
    del m0
    nll0 = _ppl(model_path, ids, ctx)
    ppl_res = {"base_nll": round(nll0, 5), "deltas": {}}
    results["checks"]["ppl"] = {"ok": True, **ppl_res}
    w4a8_rows = [d for d in dtypes if d == "w4a8" or d.endswith("+w4a8")]
    if w4a8_rows:
        # W4A8 needs K % 512 == 0; on an ineligible model the conversion
        # would silently no-op and the rows would "pass" measuring nothing
        from ntransformer_tpu.core.gguf import GGUFReader
        from ntransformer_tpu.models.config import ModelConfig
        c = ModelConfig.from_gguf_metadata(GGUFReader(model_path).metadata)
        if c.hidden_size % 512 or c.intermediate_size % 512:
            log(f"SKIP w4a8 rows: hidden={c.hidden_size} inter="
                f"{c.intermediate_size} not 512-divisible — the W4A8 "
                "format does not apply to this model")
            results["checks"].setdefault("ppl_skipped", {})["w4a8"] = \
                "shapes not 512-divisible"
            dtypes = [d for d in dtypes if d not in w4a8_rows]
    nll0_dec = None
    if any(d == "w4a8" or d.endswith("+w4a8") for d in dtypes):
        # decode-mode base: w4a8 rows step T=1 (their changed path), so
        # their deltas compare against the base stepped the same way
        nll0_dec = _ppl(model_path, ids, ctx, mode="decode")
        results["checks"]["ppl"]["base_nll_decode"] = round(nll0_dec, 5)
        log(f"  base decode-mode nll {nll0_dec:.5f} "
            f"(prefill {nll0:.5f})")
    tmpdir = tempfile.mkdtemp(prefix="qgate_")
    for dt in dtypes:
        w4a8 = dt == "w4a8" or dt.endswith("+w4a8")
        w8a8 = dt == "w8a8" or dt.endswith("+w8a8")
        base_dt = dt.removesuffix("+w4a8").removesuffix("+w8a8")
        if base_dt in ("w4a8", "w8a8"):
            # bare runtime format: convert the model file itself
            path_dt = model_path
        elif base_dt == dt and not (w4a8 or w8a8):
            # plain dtype row: requant the FILE, exact compute
            target = DType[base_dt.upper().replace("Q4_K_M", "Q4_K")] \
                if base_dt != "q4_k_m" else DType.Q4_K
            path_dt = os.path.join(tmpdir, f"requant_{base_dt}.gguf")
            try:
                requant(model_path, path_dt, target)
            except Exception as e:
                fail("ppl", f"requant to {dt} failed: {e}")
                continue
        else:
            # "<dtype>+w4a8/+w8a8": requant the file to <dtype>, then the
            # runtime conversion on top — the full double-quant chain
            target = DType[base_dt.upper().replace("Q4_K_M", "Q4_K")] \
                if base_dt != "q4_k_m" else DType.Q4_K
            path_dt = os.path.join(tmpdir, f"requant_{base_dt}.gguf")
            try:
                requant(model_path, path_dt, target)
            except Exception as e:
                fail("ppl", f"requant to {dt} failed: {e}")
                continue
        # w4a8 rows step decode-mode (T=1, the path w4a8 changes); w8a8's
        # kernel covers prefill too, so its rows measure prefill windows
        nll = _ppl(path_dt, ids, ctx, w4a8=w4a8, w8a8=w8a8,
                   mode="decode" if w4a8 else "prefill")
        delta = nll - (nll0_dec if w4a8 else nll0)
        results["checks"]["ppl"]["deltas"][dt] = round(delta, 5)
        log(f"  {dt}: nll {nll:.5f} (Δ {delta:+.5f})")
        budget = PPL_BUDGET.get(dt, 0.25)
        if not math.isfinite(nll) or abs(delta) > budget:
            fail("ppl", f"{dt} Δnll {delta:+.5f} exceeds ±{budget}")
        if path_dt != model_path:
            os.unlink(path_dt)

    if update or not os.path.exists(fx_path):
        json.dump(results, open(fx_path, "w"), indent=1)
        log(f"fixtures written to {fx_path}")
    return results


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--corpus", default=os.path.join(REPO, "README.md"))
    ap.add_argument("--dtypes",
                    default="q6_k,q4_k_m,q4_0,w4a8,q4_k_m+w4a8,q6_k+w4a8")
    ap.add_argument("--fixtures", default=None)
    ap.add_argument("--update", action="store_true",
                    help="(re)write the fixture file from this run")
    ap.add_argument("--ctx", type=int, default=256)
    ap.add_argument("--windows", type=int, default=8)
    ap.add_argument("--golden-tokens", type=int, default=24)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU backend (jnp fallback kernels; dequant is "
                         "bit-identical so deltas are unaffected)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        from ntransformer_tpu.ops import linear
        linear.KERNEL_MODE = "off"
    r = run_gate(args.model, args.corpus,
                 [d.strip() for d in args.dtypes.split(",") if d.strip()],
                 args.fixtures, args.update, args.ctx, args.windows,
                 args.golden_tokens)
    print(json.dumps({"pass": r["pass"],
                      "tokenizer_ok": r["checks"]["tokenizer"]["ok"],
                      "goldens_ok": r["checks"]["goldens"]["ok"],
                      "ppl": r["checks"]["ppl"]}, indent=1))
    return 0 if r["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
