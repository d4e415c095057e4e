"""Offline GGUF requantizer: rewrite a model's weight tensors to a lower
bit-width (e.g. Q6_K → Q4_K), producing a standalone GGUF.

The reference requantizes tier-B copies in memory at load
(src/memory/streamer.cu:45-153, --requant-q4k); this tool additionally
persists the conversion (the runtime also still supports on-the-fly pack
requant via --requant-q4k). Norms and small tensors pass through
unchanged; K-quant targets require 256-aligned rows.

Usage: python tools/requant_gguf.py -m in.gguf -o out.gguf [--to q4_k]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ntransformer_tpu.core.dequant import dequantize  # noqa: E402
from ntransformer_tpu.core.dtypes import block_info, DType  # noqa: E402
from ntransformer_tpu.core.gguf import GGUFReader, GGUFWriter  # noqa: E402
from ntransformer_tpu.core.quant import quantize  # noqa: E402

# dtypes worth shrinking (higher-precision sources)
_SOURCES = {DType.F32, DType.F16, DType.Q8_0, DType.Q6_K, DType.Q5_K}


def requant(in_path: str, out_path: str, target: DType,
            progress=print) -> dict:
    r = GGUFReader(in_path)
    w = GGUFWriter(out_path)
    for k, v in r.metadata.items():
        try:
            w.add_meta(k, v)
        except TypeError:
            progress(f"skip metadata {k} (unsupported type)")
    blk = block_info(target).block_elems
    stats = {"converted": 0, "kept": 0, "bytes_in": 0, "bytes_out": 0}
    for name, info in r.tensors.items():
        raw = bytes(r.raw_bytes(name))
        n, k = (info.shape if len(info.shape) == 2 else (1, info.shape[0]))
        convertible = (len(info.shape) == 2 and info.dtype in _SOURCES
                       and info.dtype != target and k % max(blk, 256) == 0
                       and "norm" not in name)
        stats["bytes_in"] += len(raw)
        if convertible:
            wgt = dequantize(raw, info.dtype, n, k)
            out = quantize(wgt, target)
            w.add_tensor(name, raw=out, shape=(n, k), dtype=target)
            stats["converted"] += 1
            stats["bytes_out"] += len(out)
            progress(f"{name}: {info.dtype.name} -> {target.name} "
                     f"({len(raw)} -> {len(out)} B)")
        else:
            w.add_tensor(name, raw=raw, shape=tuple(info.shape),
                         dtype=info.dtype)
            stats["kept"] += 1
            stats["bytes_out"] += len(raw)
    w.write()
    progress(f"wrote {out_path}: {stats['converted']} converted, "
             f"{stats['kept']} kept, {stats['bytes_in']/1e6:.1f} -> "
             f"{stats['bytes_out']/1e6:.1f} MB")
    return stats


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--to", default="q4_k",
                    choices=[d.value for d in DType if d in
                             (DType.Q4_K, DType.Q4_0, DType.Q8_0, DType.Q6_K,
                              DType.Q5_K)])
    args = ap.parse_args()
    requant(args.model, args.output, DType(args.to))


if __name__ == "__main__":
    main()
