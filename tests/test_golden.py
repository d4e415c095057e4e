"""Golden end-to-end decode: fixed synthetic model + fixed prompt must
reproduce the exact token sequence recorded when this test was written.

The reference's analogue is its manual factual-prompt checks and the
bit-identical streaming-vs-resident requirement (SURVEY §4); a committed
golden protects against regressions that shift all code paths identically
(where path-vs-path parity tests stay green).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ntransformer_tpu.inference.engine import Engine, GenerateConfig
from ntransformer_tpu.models.llama import KVCache, forward
from ntransformer_tpu.models.loader import load_model
from tools.make_test_gguf import write_model

GREEDY = GenerateConfig(max_tokens=8, temperature=0.0, repeat_penalty=1.0)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "golden_q8.gguf"
    write_model(str(path), "tiny", "q8_0", seed=1234)
    return load_model(str(path))


def test_golden_greedy_tokens(model):
    tokens = jnp.asarray([2, 11, 47, 300], jnp.int32)
    kv = KVCache.create(model.arch)
    logits, kv, _ = forward(model.arch, model.weights, kv, tokens, 0)
    seq = [int(jnp.argmax(logits[0]))]
    for i in range(5):
        logits, kv, _ = forward(model.arch, model.weights, kv,
                                jnp.asarray([seq[-1]], jnp.int32), 4 + i)
        seq.append(int(jnp.argmax(logits[0])))
    # recorded 2026-08-16 from the CPU jnp path (quant planes, f32 accum)
    assert seq == GOLDEN_SEQ, f"greedy drift: {seq} != {GOLDEN_SEQ}"


def test_golden_logit_stats(model):
    """Coarse logit fingerprint — catches numeric regressions that happen
    to preserve the argmax chain."""
    tokens = jnp.asarray([2, 11, 47, 300], jnp.int32)
    logits, _, _ = forward(model.arch, model.weights,
                           KVCache.create(model.arch), tokens, 0)
    v = np.asarray(logits[0], np.float64)
    fp = (float(v.mean()), float(v.std()), float(v.max()))
    for got, want in zip(fp, GOLDEN_FP):
        assert abs(got - want) < 1e-3 * max(1.0, abs(want)), (fp, GOLDEN_FP)


GOLDEN_SEQ = [213, 213, 213, 213, 213, 294]
GOLDEN_FP = (0.021147496558114653, 0.31825246013329367, 1.1149804592132568)
