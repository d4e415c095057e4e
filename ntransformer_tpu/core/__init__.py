from .dtypes import DType, GGMLType, GGUFValueType, bits_per_weight, block_info, row_nbytes
from .gguf import GGUFReader, GGUFWriter, TensorInfo
from .dequant import dequantize
from .quant import quantize

__all__ = [
    "DType", "GGMLType", "GGUFValueType", "bits_per_weight", "block_info",
    "row_nbytes", "GGUFReader", "GGUFWriter", "TensorInfo", "dequantize",
    "quantize",
]
