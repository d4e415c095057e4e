"""ntransformer_tpu — a TPU-native quantized LLM serving engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
xaskasdf/ntransformer (single-GPU C++/CUDA GGUF decode engine): quantized
GGUF loading, fused dequant+matmul Pallas kernels, GQA flash attention,
3-tier adaptive weight cache (HBM / host RAM / storage) with a SLEP-style
double-buffered streaming pipeline, layer-skip, speculative decoding — plus
multi-chip tensor sharding over an ICI mesh, which the reference lacks.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences (importing jax at package import time
    # would slow bare tooling like `python -m ntransformer_tpu --help`)
    if name in ("Engine", "TieredEngine", "GenerateConfig", "ChatSession"):
        from .inference import engine as _e
        return getattr(_e, name)
    if name == "load_model":
        from .models.loader import load_model
        return load_model
    if name == "load_model_tiered":
        from .models.tiered import load_model_tiered
        return load_model_tiered
    raise AttributeError(name)
