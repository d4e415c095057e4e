"""SLEP pipeline measurement on real hardware: build a synthetic .ntp pack
on disk (1B-scale Q8_0), stream half the layers per token, and compare
per-token time against the theoretical transfer bound (bytes / link BW).

On this rig the host->device link is a ~0.12 GB/s tunnel, so streaming
dominates; the number that matters is pipeline efficiency:
   efficiency = transfer_bound / measured_token_time
(1.0 = transfers fully pipelined, compute and staging hidden).
"""
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from ntransformer_tpu.core.dtypes import DType
from ntransformer_tpu.core.layout import LAYOUTS
from ntransformer_tpu.memory.pack import ALIGN, MAGIC, PackReader, _align
from ntransformer_tpu.memory.streamer import LayerStreamer
from ntransformer_tpu.memory.tiers import TierConfig
from ntransformer_tpu.models.config import ModelConfig
from ntransformer_tpu.models.llama import Arch
from ntransformer_tpu.models.synth import synth_model
from ntransformer_tpu.models.tiered import TieredKV, TieredModel, forward_tiered
from tools.make_test_gguf import PRESETS

PRESET = "1b"
DTYPE = DType.Q8_0
MAX_SEQ = 512


def synth_pack(path: str, cfg) -> PackReader:
    """Write an .ntp with arbitrary plane bytes (values irrelevant)."""
    h, it = cfg.hidden_size, cfg.intermediate_size
    kv_dim = cfg.n_kv_heads * cfg.head_dim
    dims = {"wq": (h, h), "wk": (kv_dim, h), "wv": (kv_dim, h),
            "wo": (h, h), "w_gate": (it, h), "w_up": (it, h),
            "w_down": (h, it)}
    meta_layers = []
    blob_size = 0
    tensors = {}
    off = 0
    for key, (n, k) in dims.items():
        pmeta = {}
        for spec in LAYOUTS[DTYPE]:
            rows = k // spec.rows_div
            nbytes = rows * n * np.dtype(spec.np_dtype).itemsize
            pmeta[spec.name] = {"off": off, "dtype": spec.np_dtype,
                                "shape": [rows, n]}
            off += nbytes
        tensors[key] = {"qdtype": DTYPE.name, "k": k, "n": n, "planes": pmeta}
    norms = {}
    for key in ("attn_norm", "ffn_norm"):
        norms[key] = {"off": off, "dtype": "float32", "shape": [h]}
        off += h * 4
    blob_size = off
    header = {"version": 1, "n_layers": cfg.n_layers,
              "layers": [{"tensors": tensors, "norms": norms,
                          "size": blob_size} for _ in range(cfg.n_layers)],
              "layer_ids": list(range(cfg.n_layers))}
    hdr0 = json.dumps(header).encode()
    base = _align(16 + len(hdr0) + 32 * cfg.n_layers + 256)
    o = base
    for m in header["layers"]:
        m["offset"] = o
        o = _align(o + blob_size)
    hdr = json.dumps(header).encode()
    ones = np.ones(blob_size, np.uint8)  # d-planes read as tiny f16s; fine
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(np.uint32(1).tobytes())
        f.write(np.uint64(len(hdr)).tobytes())
        f.write(hdr)
        f.write(b"\0" * (base - 16 - len(hdr)))
        for m in header["layers"]:
            f.seek(m["offset"])
            f.write(ones)
    return PackReader(path)


def main():
    cfg, arch, weights = synth_model(PRESET, DTYPE.value, max_seq_len=MAX_SEQ)
    pack_path = "/root/models_1b/slep_1b.ntp"
    os.makedirs(os.path.dirname(pack_path), exist_ok=True)
    pack = synth_pack(pack_path, cfg)
    L = cfg.n_layers
    n_hbm = L // 2
    tiers = TierConfig(n_hbm=n_hbm, n_ram=(L - n_hbm) // 2,
                       n_disk=L - n_hbm - (L - n_hbm) // 2)
    print(tiers.describe(pack.max_layer_nbytes), file=sys.stderr)
    streamer = LayerStreamer(pack, tiers)

    import dataclasses
    resident = dataclasses.replace(
        weights, layers=jax.tree.map(lambda a: a[:n_hbm], weights.layers))
    tm = TieredModel(cfg, arch, tiers, resident, streamer, None, pack)

    kv = TieredKV.create(arch, tiers)
    toks = jnp.asarray([3], jnp.int32)
    # warm up / compile
    logits, kv, _ = forward_tiered(tm, kv, toks, 0)
    np.asarray(logits[:1, :1])

    N = 4
    t0 = time.perf_counter()
    for i in range(N):
        logits, kv, _ = forward_tiered(tm, kv, toks, 1 + i)
        np.asarray(logits[:1, :1])
    dt = (time.perf_counter() - t0) / N

    streamed_bytes = tiers.n_streamed * pack.layer_nbytes(n_hbm)

    # A/B: serialize every pipeline stage (the reference's mmap-style
    # serial baseline) and measure the SLEP overlap speedup directly
    streamer.synchronous = True
    logits, kv, _ = forward_tiered(tm, kv, toks, 1 + N)
    np.asarray(logits[:1, :1])
    t0 = time.perf_counter()
    for i in range(N):
        logits, kv, _ = forward_tiered(tm, kv, toks, 2 + N + i)
        np.asarray(logits[:1, :1])
    dt_serial = (time.perf_counter() - t0) / N
    streamer.synchronous = False

    bw = streamed_bytes / dt
    print(f"pipelined {dt:.2f}s/token ({bw/1e9:.3f} GB/s streamed) vs "
          f"serialized {dt_serial:.2f}s/token -> overlap speedup "
          f"{dt_serial/dt:.2f}x on {streamed_bytes/1e6:.0f} MB/token",
          file=sys.stderr)
    print(json.dumps({"metric": "slep_overlap_speedup",
                      "value": round(dt_serial / dt, 3), "unit": "x"}))
    streamer.close()


def disk_tier_bench():
    """Forced-disk-tier read throughput: stage every layer from DISK
    (NT_MAX_RAM_LAYERS=0 semantics) and measure pread GB/s with the page
    cache bypassed (O_DIRECT) vs through it — the reference's tier-C
    rationale made measurable (docs/TIERED_CACHING.md:5: page-cache thrash
    gave 0.006 tok/s at 70B; its VFIO NVMe driver hit 3.35 GB/s)."""
    cfg, arch, weights = synth_model(PRESET, DTYPE.value, max_seq_len=MAX_SEQ)
    pack_path = "/root/models_1b/slep_1b.ntp"
    os.makedirs(os.path.dirname(pack_path), exist_ok=True)
    pack = synth_pack(pack_path, cfg)
    L = cfg.n_layers
    size = pack.layer_nbytes(0)

    from ntransformer_tpu.memory.native import StagePool, aligned_empty
    pool = StagePool(8)
    buf = aligned_empty((size + 4095) // 4096 * 4096)
    results = {}
    for name, direct, drop in (("page-cache-warm", False, False),
                               ("page-cache-cold", False, True),
                               ("o-direct", True, True)):
        if drop:
            # drop this file from the page cache (posix_fadvise DONTNEED)
            fd = os.open(pack_path, os.O_RDONLY)
            try:
                os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
            finally:
                os.close(fd)
        t0 = time.perf_counter()
        nbytes = 0
        for layer in range(L):
            meta = pack.layer_meta(layer)
            h = pool.read(pack_path, meta["offset"], meta["size"], buf,
                          direct=direct)
            pool.wait(h)
            nbytes += meta["size"]
        dt = time.perf_counter() - t0
        results[name] = nbytes / dt / 1e9
        print(f"disk tier [{name:16s}]: {nbytes/1e6:.0f} MB in {dt:.2f}s "
              f"= {results[name]:.2f} GB/s", file=sys.stderr)
    pool.close()
    print(json.dumps({"metric": "tier_c_read_gbps",
                      "value": round(results["o-direct"], 3), "unit": "GB/s",
                      "page_cache_cold": round(results["page-cache-cold"], 3),
                      "page_cache_warm": round(results["page-cache-warm"], 3)}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "disk":
        disk_tier_bench()
    else:
        main()
