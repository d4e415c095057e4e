"""Driver benchmark: the full performance scorecard, one JSON line per metric.

Each line: {"metric", "value", "unit", "vs_baseline", ...extras}. The LAST
line is the flagship metric (8B Q8_0 resident decode, reference = 48.9 tok/s
on an RTX 3090 — BASELINE.md) and embeds the whole run's scorecard under
"scorecard" so a last-line-only parser still captures every number.

Metrics (NT_BENCH_SET=full, the default):
  - llama8b_{q8_0,q4_0,q4_k_m,q6_k}_resident_decode — single-stream decode
    through the batched serving step at B=1 (r3 methodology, unchanged).
  - llama8b_q8_0_b32_int8_aggregate — B=32 continuous-batching step, int8 KV,
    ctx 1024 mid-context positions (the serving headline).
  - llama8b_q8_0_prefill_t2048 — one 2048-token prefill forward.
  - tiered_1b_overlap_efficiency — SLEP streaming pipeline: 1B-scale pack,
    8/16 layers streamed host->HBM per token; efficiency = link-bound floor
    (streamed bytes / link BW measured in the same run) / actual token time.
    This is the rig-independent tiered number: the host link here is a
    0.01-0.12 GB/s tunnel so absolute tiered tok/s measures the tunnel, not
    the pipeline; extras record resident/tiered tok/s and the ratio.

NT_BENCH_SET=flagship runs only the Q8_0 decode (the r1-r3 behavior);
NT_BENCH_SET=a,b,c selects metrics by key. NT_BENCH_DTYPE=<dt> (with
NT_BENCH_SET unset) keeps the r3 A/B scripts working: one decode metric.

Weights are synthetic, built on-device (decode timing is weight-value-
independent; the tunnel's ~0.12 GB/s H2D makes uploading multi-GB real
weights pointless for a timing bench). The quantized compute path is
identical to real-model serving.
"""
import gc
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

_REPO = __file__.rsplit("/", 1)[0]
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

BASELINE_8B_Q8_DECODE = 48.9   # tok/s (reference README.md:9)
BASELINE_8B_Q8_PREFILL = 50.9  # tok/s (reference CLAUDE.md:216)

FLAGSHIP = "llama8b_q8_0_resident_decode"


def log(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def _free(*objs):
    """Drop references to on-device trees and let XLA reclaim HBM."""
    del objs
    gc.collect()


# ---------------------------------------------------------------- decode

def bench_decode(dtype: str) -> dict:
    """Single-stream decode at B=1 through the batched serving step —
    deferred-write kernels (stacked-cache flash attention + one bulk
    in-place KV append), host-chained exactly as the server dispatches it.
    NOTE: sync via a real D2H readback (np.asarray) — on the axon tunnel
    platform block_until_ready returns before device execution finishes."""
    from ntransformer_tpu.models.batched import BatchedKV, batched_decode_step
    from ntransformer_tpu.models.synth import model_nbytes, synth_model

    n_tokens = int(os.environ.get("NT_BENCH_TOKENS", "64"))
    fuse = os.environ.get("NT_BENCH_FUSE", "1") != "0"
    t0 = time.perf_counter()
    cfg, arch, weights = synth_model("8b", dtype, max_seq_len=1024, fuse=fuse)
    nbytes = model_nbytes(weights)
    log(f"model {cfg.model_name}: {nbytes/1e9:.2f} GB on "
        f"{jax.devices()[0].device_kind} (built in {time.perf_counter()-t0:.0f}s)")

    bkv = BatchedKV.create(arch, 1)
    tokens = jnp.full((1,), 3, jnp.int32)
    active = jnp.ones(1, bool)

    def run(n, base):
        nonlocal bkv, tokens
        for i in range(n):
            logits, bkv = batched_decode_step(
                arch, weights, bkv, tokens,
                jnp.full(1, base + i, jnp.int32), active)
            tokens = jnp.argmax(logits, -1).astype(jnp.int32)
        np.asarray(tokens)  # true fence

    t0 = time.perf_counter()
    run(8, 8)
    log(f"compile+warmup batched step: {time.perf_counter()-t0:.0f}s")
    dt = float("inf")
    for i in range(2):
        t0 = time.perf_counter()
        run(n_tokens, 24 + i * n_tokens)
        dt = min(dt, (time.perf_counter() - t0) / n_tokens)

    tps = 1.0 / dt
    log(f"decode {dtype}: {dt*1e3:.2f} ms/tok "
        f"({tps:.2f} tok/s, {nbytes*tps/1e9:.0f} GB/s effective)")
    _free(weights, bkv)
    return {"metric": f"llama8b_{dtype}_resident_decode",
            "value": round(tps, 2), "unit": "tok/s",
            "vs_baseline": round(tps / BASELINE_8B_Q8_DECODE, 3),
            "eff_gbps": round(nbytes * tps / 1e9, 1)}


# ---------------------------------------------------------- B=32 serving

def bench_b32_int8() -> dict:
    """Continuous-batching step at B=32 with int8 KV (bf16 B=32 KV does not
    fit HBM next to the weights — int8 is the B=32 configuration by design).
    Host-chained steps, mid-context positions, delta-timed rounds."""
    from ntransformer_tpu.models.batched import BatchedKV, batched_decode_step
    from ntransformer_tpu.models.synth import model_nbytes, synth_model

    B, ctx = 32, 1024
    cfg, arch, weights = synth_model("8b", "q8_0", max_seq_len=ctx)
    nbytes = model_nbytes(weights)
    bkv = BatchedKV.create(arch, B, quant=True)
    tokens = jnp.arange(B, dtype=jnp.int32) + 3
    active = jnp.ones(B, bool)

    def run(n, base):
        nonlocal bkv, tokens
        for i in range(n):
            logits, bkv = batched_decode_step(
                arch, weights, bkv, tokens,
                jnp.full(B, base + i, jnp.int32), active)
            tokens = jnp.argmax(logits, -1).astype(jnp.int32)
        np.asarray(tokens)

    iters = 24
    t0 = time.perf_counter()
    run(iters, ctx // 2)
    log(f"B=32 compile+warmup: {time.perf_counter()-t0:.0f}s")
    t0 = time.perf_counter()
    run(iters, ctx // 2 + 32)
    t1 = time.perf_counter()
    run(3 * iters, ctx // 2 + 64)
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / (2 * iters)  # constant fence cost cancels
    agg = B / dt
    log(f"B=32 int8: {dt*1e3:.2f} ms/step, {agg:.0f} tok/s aggregate")
    _free(weights, bkv)
    return {"metric": "llama8b_q8_0_b32_int8_aggregate",
            "value": round(agg, 1), "unit": "tok/s",
            "vs_baseline": round(agg / BASELINE_8B_Q8_DECODE, 3),
            "ms_per_step": round(dt * 1e3, 2)}


# -------------------------------------------------------------- prefill

def bench_prefill() -> dict:
    """One 2048-token prefill forward on the resident 8B Q8_0 model."""
    from ntransformer_tpu.models.llama import KVCache, forward
    from ntransformer_tpu.models.synth import synth_model

    T = 2048
    cfg, arch, weights = synth_model("8b", "q8_0", max_seq_len=T)
    tokens = jnp.arange(T, dtype=jnp.int32) % cfg.vocab_size

    kv = KVCache.create(arch)
    t0 = time.perf_counter()
    logits, kv, _ = forward(arch, weights, kv, tokens, 0)
    np.asarray(logits[:1, :1])
    log(f"prefill compile+warmup: {time.perf_counter()-t0:.0f}s")
    best = float("inf")
    for _ in range(3):
        kv = KVCache.create(arch)
        t0 = time.perf_counter()
        logits, kv, _ = forward(arch, weights, kv, tokens, 0)
        np.asarray(logits[:1, :1])
        best = min(best, time.perf_counter() - t0)
    tps = T / best
    log(f"prefill T={T}: {best*1e3:.0f} ms ({tps:.0f} tok/s)")
    _free(weights, kv, logits)
    return {"metric": "llama8b_q8_0_prefill_t2048",
            "value": round(tps, 1), "unit": "tok/s",
            "vs_baseline": round(tps / BASELINE_8B_Q8_PREFILL, 3)}


# --------------------------------------------------------------- tiered

def bench_tiered() -> dict:
    """Tiered-vs-resident on the 1B-scale model: resident decode tok/s,
    tiered decode tok/s (8 of 16 layers streamed host->HBM per token
    through the SLEP pipeline), and the rig-independent number — overlap
    efficiency = (streamed bytes / host link BW measured in this same run)
    / measured token time. 1.0 means transfers are perfectly pipelined:
    compute, staging and dispatch fully hidden behind the link.

    The reference's analogous headline is tiered-vs-mmap 33x
    (docs/TIERED_CACHING.md:41-42); on this rig absolute tiered tok/s
    measures the 0.01-0.12 GB/s tunnel, not the pipeline."""
    import dataclasses

    from experiments.slep_bench import synth_pack
    from ntransformer_tpu.core.dtypes import DType
    from ntransformer_tpu.memory.streamer import LayerStreamer
    from ntransformer_tpu.memory.tiers import TierConfig
    from ntransformer_tpu.models.batched import BatchedKV, batched_decode_step
    from ntransformer_tpu.models.synth import model_nbytes, synth_model
    from ntransformer_tpu.models.llama import KVCache
    from ntransformer_tpu.models.tiered import (TieredKV, TieredModel,
                                                forward_tiered)

    max_seq = 512
    cfg, arch, weights = synth_model("1b", "q8_0", max_seq_len=max_seq)
    nbytes = model_nbytes(weights)

    # (a) resident decode tok/s (BASELINE config #1 scale)
    bkv = BatchedKV.create(arch, 1)
    tokens = jnp.full((1,), 3, jnp.int32)
    active = jnp.ones(1, bool)

    def run(n, base):
        nonlocal bkv, tokens
        for i in range(n):
            logits, bkv = batched_decode_step(
                arch, weights, bkv, tokens,
                jnp.full(1, base + i, jnp.int32), active)
            tokens = jnp.argmax(logits, -1).astype(jnp.int32)
        np.asarray(tokens)

    run(8, 8)
    t0 = time.perf_counter()
    run(48, 24)
    resident_tps = 48 / (time.perf_counter() - t0)
    log(f"1B resident decode: {resident_tps:.1f} tok/s")

    # (b) host->device link bandwidth, measured in the same window the
    # tiered tokens run in (the tunnel fluctuates by 10x across hours —
    # probed before AND after the tokens, best-of to match the best token)
    probe = np.ones(64 << 20, np.uint8)
    jax.device_put(probe[: 1 << 20]).block_until_ready()  # warm path

    def probe_link(n=2):
        best = 0.0
        for _ in range(n):
            t0 = time.perf_counter()
            a = jax.device_put(probe)
            np.asarray(a[:1])
            best = max(best, probe.nbytes / (time.perf_counter() - t0))
            del a
        return best

    link_pre = probe_link()
    log(f"host->HBM link (pre): {link_pre/1e9:.3f} GB/s")

    # (c) tiered decode: 8 resident + 8 streamed (4 RAM + 4 disk)
    pack_dir = os.environ.get("NT_BENCH_PACK_DIR", "/root/models_1b")
    os.makedirs(pack_dir, exist_ok=True)
    pack = synth_pack(os.path.join(pack_dir, "slep_1b.ntp"), cfg)
    L = cfg.n_layers
    n_hbm = L // 2
    tiers = TierConfig(n_hbm=n_hbm, n_ram=(L - n_hbm) // 2,
                       n_disk=L - n_hbm - (L - n_hbm) // 2)
    streamer = LayerStreamer(pack, tiers)
    resident = dataclasses.replace(
        weights, layers=jax.tree.map(lambda x: x[:n_hbm], weights.layers))
    tm = TieredModel(cfg, arch, tiers, resident, streamer, None, pack)
    tkv = TieredKV.create(arch, tiers)
    toks = jnp.asarray([3], jnp.int32)
    logits, tkv, _ = forward_tiered(tm, tkv, toks, 0)   # compile + warm
    np.asarray(logits[:1, :1])
    streamed_bytes = tiers.n_streamed * pack.layer_nbytes(n_hbm)

    n_tok = int(os.environ.get("NT_BENCH_TIERED_TOKENS", "3"))
    dt = float("inf")
    mean = 0.0
    for i in range(n_tok):
        t0 = time.perf_counter()
        logits, tkv, _ = forward_tiered(tm, tkv, toks, 1 + i)
        np.asarray(logits[:1, :1])
        step = time.perf_counter() - t0
        dt = min(dt, step)
        mean += step / n_tok
    link_post = probe_link()
    log(f"host->HBM link (post): {link_post/1e9:.3f} GB/s")
    streamer.close()

    # best token vs best link probe: both optimistic, so the ratio is
    # stable against the tunnel's minute-scale swings
    link = max(link_pre, link_post)
    floor = streamed_bytes / link  # link-bound token time, same window
    eff = floor / dt
    tiered_tps = 1.0 / mean
    log(f"1B tiered (8 streamed, {streamed_bytes/1e6:.0f} MB/tok): best "
        f"{dt:.2f} s/tok (mean {mean:.2f}); link-bound floor {floor:.2f} s "
        f"-> overlap efficiency {eff:.2f}")
    _free(weights, bkv, tm, tkv, resident, logits)
    return {"metric": "tiered_1b_overlap_efficiency",
            "value": round(eff, 3), "unit": "fraction-of-link-bound-floor",
            "vs_baseline": round(eff / 0.95, 3),  # target >=0.95
            "resident_tps": round(resident_tps, 1),
            "tiered_tps": round(tiered_tps, 3),
            "tiered_vs_resident_ratio": round(tiered_tps / resident_tps, 5),
            "link_gbps_measured": round(link / 1e9, 4),
            "streamed_mb_per_tok": round(streamed_bytes / 1e6, 1)}


# ----------------------------------------------------------------- main

BENCHES = {
    "llama8b_q8_0_resident_decode": lambda: bench_decode("q8_0"),
    "llama8b_q4_0_resident_decode": lambda: bench_decode("q4_0"),
    "llama8b_q4_k_m_resident_decode": lambda: bench_decode("q4_k_m"),
    "llama8b_q6_k_resident_decode": lambda: bench_decode("q6_k"),
    # w4a8: the int8-MXU quantized-activation decode format (r5) — what a
    # Q4_K_M/Q6_K file serves at with --w4a8 (quality priced per source
    # dtype by tools/quality_gate.py)
    "llama8b_w4a8_resident_decode": lambda: bench_decode("w4a8"),
    "llama8b_q8_0_b32_int8_aggregate": bench_b32_int8,
    "llama8b_q8_0_prefill_t2048": bench_prefill,
    "tiered_1b_overlap_efficiency": bench_tiered,
}


def main():
    sel = os.environ.get("NT_BENCH_SET")
    if sel is None and os.environ.get("NT_BENCH_DTYPE"):
        # r3 A/B compatibility: one decode metric for the named dtype
        sel = f"llama8b_{os.environ['NT_BENCH_DTYPE']}_resident_decode"
    if sel is None or sel == "full":
        keys = list(BENCHES)
    elif sel == "flagship":
        keys = [FLAGSHIP]
    else:
        keys = [k.strip() for k in sel.split(",") if k.strip()]
    # flagship last so its JSON line (with the embedded scorecard) is the
    # final stdout line
    keys.sort(key=lambda k: k == FLAGSHIP)

    results = []
    for k in keys:
        log(f"=== {k} ===")
        try:
            results.append(BENCHES[k]())
        except Exception as e:  # keep the rest of the scorecard alive
            log(f"{k} FAILED: {type(e).__name__}: {str(e)[:200]}")
            results.append({"metric": k, "value": None, "unit": "error",
                            "vs_baseline": None, "error": str(e)[:200]})

    scorecard = {r["metric"]: r["value"] for r in results}
    flag = next((r for r in results if r["metric"] == FLAGSHIP), results[-1])
    for r in results:
        if r is flag:
            continue
        print(json.dumps(r), flush=True)
    flag = dict(flag)
    if len(results) > 1:
        flag["scorecard"] = scorecard
    print(json.dumps(flag), flush=True)


if __name__ == "__main__":
    main()
