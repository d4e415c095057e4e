"""Perplexity harness: mechanics + quant-vs-bf16 PPL proximity (the
per-bit-width quality bar from the north star)."""
import math

import pytest

from ntransformer_tpu.models.loader import load_model
from tools.make_test_gguf import write_model
from tools.perplexity import perplexity


@pytest.fixture(scope="module")
def gguf(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "ppl_q8.gguf"
    write_model(str(path), "tiny", "q8_0", seed=9)
    return str(path)


def test_perplexity_mechanics(gguf):
    m = load_model(gguf)
    ids = list(range(5, 133))
    r = perplexity(m, ids, ctx=64)
    assert r["windows"] == 2
    assert r["tokens"] == 126
    assert math.isfinite(r["ppl"]) and r["ppl"] > 1.0


def test_perplexity_quant_matches_bf16(gguf):
    """Q8_0 compute path must track the dequantized-bf16 path closely —
    the quantization error is in the WEIGHTS (identical for both); compute
    paths may differ only in rounding."""
    ids = list(range(5, 69))
    rq = perplexity(load_model(gguf, compute="quant"), ids, ctx=64)
    rb = perplexity(load_model(gguf, compute="bf16"), ids, ctx=64)
    assert abs(rq["nll_per_token"] - rb["nll_per_token"]) < 0.05, (rq, rb)
