"""tools/quality_gate.py — the one-command real-weights readiness gate
(r3 verdict item 8) — exercised end-to-end on the committed repolm
artifact: tokenizer conformance, greedy goldens (logit-level cross-compute
check + exact fixture anchor), per-dtype requant PPL deltas, and the
fixture drift detection that turns the first run into a regression gate."""
import json
import os
import shutil

import pytest

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "models", "repolm_q8.gguf")

pytestmark = pytest.mark.skipif(not os.path.exists(ART),
                                reason="trained artifact not present")


@pytest.fixture(scope="module")
def gate_run(tmp_path_factory):
    """One gate run with a fresh fixture in a tmp dir (copying the model
    keeps the committed tree clean and isolates the sidecar files)."""
    from tools.quality_gate import run_gate
    d = tmp_path_factory.mktemp("qgate")
    model = str(d / "repolm_q8.gguf")
    shutil.copy(ART, model)
    fx = str(d / "fixtures.json")
    res = run_gate(model, corpus=os.path.join(
        os.path.dirname(ART), "..", "README.md"),
        dtypes=["q6_k", "q4_0"], fixtures_path=fx, update=True,
        ctx=128, windows=2, golden_tokens=12)
    return model, fx, res


def test_gate_passes_on_repolm(gate_run):
    _, _, res = gate_run
    assert res["pass"], res
    assert res["checks"]["tokenizer"]["ok"]
    assert res["checks"]["goldens"]["ok"]
    assert res["checks"]["goldens"]["logit_rel_err"] < 2e-2
    deltas = res["checks"]["ppl"]["deltas"]
    assert abs(deltas["q6_k"]) < 0.05
    assert abs(deltas["q4_0"]) < 0.25


def test_gate_detects_golden_drift(gate_run):
    """A tampered fixture (simulating a regression that changes greedy
    output) must fail the gate."""
    from tools.quality_gate import run_gate
    model, fx, _ = gate_run
    fixture = json.load(open(fx))
    prompt = next(iter(fixture["checks"]["goldens"]["outputs"]))
    fixture["checks"]["goldens"]["outputs"][prompt]["text"] = "DRIFTED"
    json.dump(fixture, open(fx, "w"))
    res = run_gate(model, corpus=os.path.join(
        os.path.dirname(ART), "..", "README.md"),
        dtypes=[], fixtures_path=fx, update=False,
        ctx=128, windows=2, golden_tokens=12)
    assert not res["pass"]
    assert not res["checks"]["goldens"]["ok"]


def test_gate_detects_tokenizer_drift(gate_run):
    from tools.quality_gate import run_gate
    model, fx, _ = gate_run
    fixture = json.load(open(fx))
    s = next(iter(fixture["checks"]["tokenizer"]["suite"]))
    fixture["checks"]["tokenizer"]["suite"][s]["ids_sha"] = "0" * 16
    json.dump(fixture, open(fx, "w"))
    res = run_gate(model, corpus=os.path.join(
        os.path.dirname(ART), "..", "README.md"),
        dtypes=[], fixtures_path=fx, update=False,
        ctx=128, windows=2, golden_tokens=12)
    assert not res["pass"]
    assert not res["checks"]["tokenizer"]["ok"]
