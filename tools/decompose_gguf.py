"""Delta decomposition tool: GGUF → .ntd (NTD1) low-rank delta file.

Capability parity with the reference's offline tool
(reference tools/decompose_gguf.py: mean base over layers + per-layer
rank-r SVD residuals, Q6_K base + F16 deltas, NTD1 container) — built on
this repo's own GGUF reader and quantizers rather than a private parser.

IMPORTANT — measured negative result (reference
docs/research/R1_delta_streaming.md): transformer weights across layers are
essentially uncorrelated (cosine ≈ 0), so rank-r deltas reconstruct with
50-93% error and generation output is garbage. The mechanism is preserved
for study and format parity; the runtime deliberately refuses to serve it
(cli.py --delta-model).

NTD1 layout (64-byte header, then Q6_K bases, then F16 U/V pairs):
  magic "NTD1" | rank u32 | n_layers u32 | hidden u32 | intermediate u32 |
  n_heads u32 | n_kv_heads u32 | head_dim u32 | base_dtype u32 (5=Q6_K) |
  delta_dtype u32 (1=F16) | base_offset u64 | delta_offset u64
  base: 7 matrices [attn_q, attn_k, attn_v, attn_output, ffn_gate, ffn_up,
  ffn_down]; delta: per layer 14 tensors (U [out,r] then V [r,in], F16),
  U = U'·√S and V = √S·V'ᵀ so U@V is the rank-r residual.
"""
from __future__ import annotations

import argparse
import struct
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ntransformer_tpu.core.dequant import dequantize  # noqa: E402
from ntransformer_tpu.core.gguf import GGUFReader  # noqa: E402
from ntransformer_tpu.core.quant import quantize_q6_k  # noqa: E402
from ntransformer_tpu.core.dtypes import DType  # noqa: E402

NTD_MAGIC = b"NTD1"
NTD_HEADER_SIZE = 64
WEIGHT_SUFFIXES = ["attn_q.weight", "attn_k.weight", "attn_v.weight",
                   "attn_output.weight", "ffn_gate.weight", "ffn_up.weight",
                   "ffn_down.weight"]


def dequant_tensor(reader: GGUFReader, name: str) -> np.ndarray:
    info = reader.info(name)
    n, k = info.shape
    return dequantize(reader.raw_bytes(name), info.dtype, n, k)


def lowrank(residual: np.ndarray, rank: int) -> tuple[np.ndarray, np.ndarray]:
    """Rank-r factorization: returns (U√S [n,r], √S·Vᵀ [r,k]) as f16.
    Uses torch.svd_lowrank (randomized) like the reference; falls back to
    numpy full SVD for small matrices."""
    n, k = residual.shape
    r = min(rank, min(n, k))
    try:
        import torch
        u, s, v = torch.svd_lowrank(torch.from_numpy(residual), q=r, niter=4)
        u, s, v = u.numpy(), s.numpy(), v.numpy()
    except Exception:
        u, s, vt = np.linalg.svd(residual, full_matrices=False)
        u, s, v = u[:, :r], s[:r], vt[:r].T
    rs = np.sqrt(s)
    return (u * rs).astype(np.float16), (rs[:, None] * v.T).astype(np.float16)


def decompose(model_path: str, out_path: str, rank: int = 64,
              progress=print) -> dict:
    reader = GGUFReader(model_path)
    md = reader.metadata
    arch = md["general.architecture"]
    n_layers = int(md[f"{arch}.block_count"])
    hidden = int(md[f"{arch}.embedding_length"])
    inter = int(md[f"{arch}.feed_forward_length"])
    n_heads = int(md[f"{arch}.attention.head_count"])
    n_kv = int(md.get(f"{arch}.attention.head_count_kv", n_heads))
    head_dim = hidden // n_heads

    # pass 1: mean base per weight type (reference pass 1)
    bases = []
    for suffix in WEIGHT_SUFFIXES:
        acc = None
        for layer in range(n_layers):
            w = dequant_tensor(reader, f"blk.{layer}.{suffix}")
            acc = w if acc is None else acc + w
        bases.append(acc / n_layers)
        progress(f"base {suffix}: shape {bases[-1].shape}")

    base_blobs = [quantize_q6_k(b) for b in bases]
    # the residual must be vs the base the runtime will SEE (quantized)
    bases_q = [dequantize(blob, DType.Q6_K, *b.shape)
               for blob, b in zip(base_blobs, bases)]

    # pass 2: per-layer rank-r residuals (reference pass 2)
    stats = {"rel_err": []}
    delta_blobs = []
    for layer in range(n_layers):
        per_layer = []
        errs = []
        for wi, suffix in enumerate(WEIGHT_SUFFIXES):
            w = dequant_tensor(reader, f"blk.{layer}.{suffix}")
            resid = w - bases_q[wi]
            u, v = lowrank(resid, rank)
            approx = bases_q[wi] + u.astype(np.float32) @ v.astype(np.float32)
            err = float(np.linalg.norm(w - approx) / (np.linalg.norm(w) + 1e-12))
            errs.append(err)
            per_layer.append((u, v))
        delta_blobs.append(per_layer)
        stats["rel_err"].append(float(np.mean(errs)))
        progress(f"layer {layer}: mean rel reconstruction err "
                 f"{stats['rel_err'][-1]*100:.1f}%")

    base_offset = NTD_HEADER_SIZE
    base_bytes = b"".join(base_blobs)
    delta_offset = base_offset + len(base_bytes)

    header = bytearray(NTD_HEADER_SIZE)
    header[0:4] = NTD_MAGIC
    struct.pack_into("<9I", header, 4, rank, n_layers, hidden, inter,
                     n_heads, n_kv, head_dim, 5, 1)
    struct.pack_into("<2Q", header, 40, base_offset, delta_offset)

    with open(out_path, "wb") as f:
        f.write(header)
        f.write(base_bytes)
        for per_layer in delta_blobs:
            for u, v in per_layer:
                f.write(u.tobytes())
                f.write(v.tobytes())
    stats["mean_rel_err"] = float(np.mean(stats["rel_err"]))
    progress(f"wrote {out_path}: mean rel err {stats['mean_rel_err']*100:.1f}% "
             f"(negative result expected — see module docstring)")
    return stats


def read_ntd_header(path: str) -> dict:
    with open(path, "rb") as f:
        hdr = f.read(NTD_HEADER_SIZE)
    assert hdr[:4] == NTD_MAGIC, "not an NTD1 file"
    (rank, n_layers, hidden, inter, n_heads, n_kv, head_dim, base_dt,
     delta_dt) = struct.unpack_from("<9I", hdr, 4)
    base_off, delta_off = struct.unpack_from("<2Q", hdr, 40)
    return dict(rank=rank, n_layers=n_layers, hidden_size=hidden,
                intermediate_size=inter, n_heads=n_heads, n_kv_heads=n_kv,
                head_dim=head_dim, base_dtype=base_dt, delta_dtype=delta_dt,
                base_offset=base_off, delta_offset=delta_off)


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("-r", "--rank", type=int, default=64)
    args = ap.parse_args()
    decompose(args.model, args.output, args.rank)


if __name__ == "__main__":
    main()
