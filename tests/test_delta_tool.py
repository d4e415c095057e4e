"""Delta decomposition tool (tools/decompose_gguf.py): NTD1 writer/header
roundtrip and reconstruction mechanics — preserved as a negative-result
capability (reference docs/research/R1_delta_streaming.md)."""
import numpy as np
import pytest

from tools.decompose_gguf import (NTD_HEADER_SIZE, decompose, lowrank,
                                  read_ntd_header)
from tools.make_test_gguf import write_model


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny_q8.gguf"
    write_model(str(path), "tiny", "q8_0", seed=7)
    return str(path)


def test_lowrank_exact_for_lowrank_input():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((64, 8)).astype(np.float32)
    b = rng.standard_normal((8, 96)).astype(np.float32)
    m = a @ b
    u, v = lowrank(m, 8)
    rec = u.astype(np.float32) @ v.astype(np.float32)
    assert np.linalg.norm(rec - m) / np.linalg.norm(m) < 2e-2  # f16 storage


def test_decompose_roundtrip(tiny_gguf, tmp_path):
    out = str(tmp_path / "tiny.ntd")
    stats = decompose(tiny_gguf, out, rank=8, progress=lambda *_: None)
    hdr = read_ntd_header(out)
    assert hdr["rank"] == 8
    assert hdr["n_layers"] == 4
    assert hdr["hidden_size"] == 256
    assert hdr["n_heads"] == 4 and hdr["n_kv_heads"] == 2
    assert hdr["base_dtype"] == 5 and hdr["delta_dtype"] == 1
    assert hdr["base_offset"] == NTD_HEADER_SIZE
    assert hdr["delta_offset"] > hdr["base_offset"]
    # random weights are uncorrelated across layers → large reconstruction
    # error is EXPECTED (that is the negative result, R1)
    assert 0.0 < stats["mean_rel_err"] < 1.5


def test_ntd_sizes(tiny_gguf, tmp_path):
    out = str(tmp_path / "t2.ntd")
    decompose(tiny_gguf, out, rank=4, progress=lambda *_: None)
    hdr = read_ntd_header(out)
    h, it = hdr["hidden_size"], hdr["intermediate_size"]
    kv_dim = hdr["n_kv_heads"] * hdr["head_dim"]
    shapes = [(h, h), (kv_dim, h), (kv_dim, h), (h, h),
              (it, h), (it, h), (h, it)]
    delta_bytes = sum((n * 4 + 4 * k) * 2 for n, k in shapes) * hdr["n_layers"]
    import os
    assert os.path.getsize(out) == hdr["delta_offset"] + delta_bytes


def test_requant_gguf_tool(tmp_path):
    """GGUF->GGUF requant keeps the model loadable and close in output."""
    import jax.numpy as jnp
    import numpy as np
    from ntransformer_tpu.core.dtypes import DType
    from ntransformer_tpu.models.llama import KVCache, forward
    from ntransformer_tpu.models.loader import load_model
    from tools.requant_gguf import requant

    src = str(tmp_path / "t6.gguf")
    write_model(src, "tiny", "q6_k", seed=11)
    out = str(tmp_path / "t4.gguf")
    stats = requant(src, out, DType.Q4_K, progress=lambda *_: None)
    assert stats["converted"] > 0
    assert stats["bytes_out"] < stats["bytes_in"]

    m6 = load_model(src)
    m4 = load_model(out)
    toks = jnp.asarray([1, 5, 9], jnp.int32)
    l6, _, _ = forward(m6.arch, m6.weights, KVCache.create(m6.arch), toks, 0)
    l4, _, _ = forward(m4.arch, m4.weights, KVCache.create(m4.arch), toks, 0)
    # requant adds quantization error but outputs stay correlated
    c = np.corrcoef(np.asarray(l6[0]), np.asarray(l4[0]))[0, 1]
    assert c > 0.95, c  # random weights lose more than real ones
