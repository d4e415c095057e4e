"""GGUF reader/writer round-trip tests (ref test strategy: SURVEY.md §4)."""
import numpy as np

from ntransformer_tpu.core import DType, GGUFReader, GGUFWriter, dequantize, quantize
from ntransformer_tpu.core.dtypes import GGUFValueType


def test_gguf_roundtrip(tmp_path):
    path = tmp_path / "tiny.gguf"
    w = GGUFWriter(path)
    w.add_meta("general.architecture", "llama")
    w.add_meta("general.name", "tiny-test")
    w.add_meta("llama.embedding_length", 64)
    w.add_meta("llama.block_count", 2)
    w.add_meta("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_meta("tokenizer.ggml.tokens", ["<s>", "</s>", "hello", "world"],
               vtype=GGUFValueType.ARRAY, elem_type=GGUFValueType.STRING)
    w.add_meta("tokenizer.ggml.scores", [0.0, 0.0, -1.0, -2.0],
               vtype=GGUFValueType.ARRAY, elem_type=GGUFValueType.FLOAT32)
    w.add_meta("tokenizer.ggml.token_type", [2, 3, 1, 1],
               vtype=GGUFValueType.ARRAY, elem_type=GGUFValueType.INT32)
    w.add_meta("flag", True)

    rng = np.random.default_rng(0)
    f32 = rng.standard_normal((8, 64)).astype(np.float32)
    q8 = rng.standard_normal((16, 64)).astype(np.float32)
    w.add_tensor("dense.weight", f32)
    w.add_tensor("quant.weight", raw=quantize(q8, DType.Q8_0),
                 shape=(16, 64), dtype=DType.Q8_0)
    w.write()

    with GGUFReader(path) as r:
        assert r.metadata["general.architecture"] == "llama"
        assert r.metadata["llama.embedding_length"] == 64
        assert abs(r.metadata["llama.attention.layer_norm_rms_epsilon"] - 1e-5) < 1e-10
        assert list(r.metadata["tokenizer.ggml.tokens"]) == ["<s>", "</s>", "hello", "world"]
        assert r.metadata["flag"] is True
        np.testing.assert_allclose(
            np.asarray(r.metadata["tokenizer.ggml.scores"]), [0.0, 0.0, -1.0, -2.0])

        info = r.info("dense.weight")
        assert info.shape == (8, 64) and info.dtype == DType.F32
        got = dequantize(r.raw_bytes("dense.weight"), DType.F32, 8, 64)
        np.testing.assert_array_equal(got, f32)

        qinfo = r.info("quant.weight")
        assert qinfo.dtype == DType.Q8_0 and qinfo.shape == (16, 64)
        dq = dequantize(r.raw_bytes("quant.weight"), DType.Q8_0, 16, 64)
        # round-trip through our own quantizer must match a direct dequant
        np.testing.assert_array_equal(
            dq, dequantize(quantize(q8, DType.Q8_0), DType.Q8_0, 16, 64))


def test_gguf_alignment(tmp_path):
    path = tmp_path / "align.gguf"
    w = GGUFWriter(path)
    w.add_meta("general.architecture", "llama")
    a = np.ones((1, 3), dtype=np.float32)  # 12 bytes → forces padding
    b = np.full((2, 2), 2.0, dtype=np.float32)
    w.add_tensor("a", a)
    w.add_tensor("b", b)
    w.write()
    with GGUFReader(path) as r:
        assert r.info("a").file_offset % 32 == 0
        assert r.info("b").file_offset % 32 == 0
        np.testing.assert_array_equal(dequantize(r.raw_bytes("b"), DType.F32, 2, 2), b)
