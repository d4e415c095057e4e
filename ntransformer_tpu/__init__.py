"""ntransformer_tpu — a TPU-native quantized LLM serving engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
xaskasdf/ntransformer (single-GPU C++/CUDA GGUF decode engine): quantized
GGUF loading, fused dequant+matmul Pallas kernels, GQA flash attention,
3-tier adaptive weight cache (HBM / host RAM / storage) with a SLEP-style
double-buffered streaming pipeline, layer-skip, speculative decoding — plus
multi-chip tensor sharding over an ICI mesh, which the reference lacks.
"""

__version__ = "0.1.0"
