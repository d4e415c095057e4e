"""Real-weights evidence: the committed repo-text LM (tools/train_tiny.py,
trained with pure JAX/optax and exported through this repo's own GGUF
writer + quantizer) must load, generate coherent byte-level text, and
score far better than a random model on held-in text — the first
evaluation of this framework on a model with non-random weights
(r2 weak #10)."""
import json
import os

import pytest

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "models", "repolm_q8.gguf")
META = ART.replace("repolm_q8.gguf", "repolm_meta.json")

pytestmark = pytest.mark.skipif(not os.path.exists(ART),
                                reason="trained artifact not present")


@pytest.fixture(scope="module")
def engine():
    from ntransformer_tpu.inference.engine import Engine
    return Engine.load(ART)


def test_repolm_roundtrip_tokenizer(engine):
    tok = engine.tokenizer
    s = "def forward(x):\n    return x"
    assert tok.decode(tok.encode(s, add_bos=False)) == s


def test_repolm_generates_text(engine):
    """Greedy completion of a code-like prompt is printable ASCII-ish text
    (the corpus is this repo's Python/Markdown)."""
    from ntransformer_tpu.inference.engine import GenerateConfig
    txt, stats = engine.generate(
        "def ", GenerateConfig(max_tokens=48, temperature=0.0,
                               repeat_penalty=1.0))
    assert stats.decode_tokens >= 8
    assert len(txt) >= 8
    printable = sum(c.isprintable() or c in "\n\t" for c in txt)
    assert printable / len(txt) > 0.95, txt


def test_repolm_beats_uniform_on_repo_text(engine):
    """Byte-level NLL on repo-like text must beat the uniform-over-bytes
    bound (ln 256 = 5.545) by a wide margin — impossible for random
    weights, so this certifies the full train → export → load → eval
    chain carried real learned structure."""
    from tools.perplexity import perplexity
    text = open(os.path.join(os.path.dirname(ART), "..",
                             "ntransformer_tpu", "ops", "layers.py")).read()
    ids = engine.tokenizer.encode(text[:4096], add_bos=False)
    r = perplexity(engine.model, ids, ctx=256)
    assert r["nll_per_token"] < 3.0, r   # uniform = 5.545; trained ~1-2
    if os.path.exists(META):
        meta = json.load(open(META))
        # quantized eval should be in the neighborhood of the f32 val loss
        assert r["nll_per_token"] < meta["val_loss"] + 1.0


@pytest.mark.parametrize("target", ["q6_k", "q4_k", "q4_0"])
def test_repolm_requant_quality(engine, target, tmp_path):
    """REAL-WEIGHTS cross-dtype quality: requantize the trained model
    through the repo's own quantizer and verify byte-level NLL stays
    within a small delta of the Q8_0 artifact — the per-bit-width quality
    table on learned weights instead of synthetic ones (r2 weak #10)."""
    from ntransformer_tpu.core.dtypes import DType
    from ntransformer_tpu.inference.engine import Engine
    from tools.perplexity import perplexity
    from tools.requant_gguf import requant
    out = str(tmp_path / f"repolm_{target}.gguf")
    requant(ART, out, DType(target), progress=lambda *a: None)
    eng = Engine.load(out)
    text = open(os.path.join(os.path.dirname(ART), "..",
                             "ntransformer_tpu", "ops", "layers.py")).read()
    ids = engine.tokenizer.encode(text[:4096], add_bos=False)
    base = perplexity(engine.model, ids, ctx=256)["nll_per_token"]
    got = perplexity(eng.model, ids, ctx=256)["nll_per_token"]
    # 4-bit on a 3.6M byte-LM degrades more than on big models; the bound
    # still certifies learned structure survives every dtype end to end
    assert got < 3.5, (target, got)
    assert abs(got - base) < (0.08 if target == "q6_k" else 0.6), \
        (target, got, base)
