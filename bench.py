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
  - spec_serve_breakeven_b8 — speculative price sheet (plain/draft/verify
    dispatch costs at B=1/8, break-even acceptance, full-accept ceiling).
  - spec_repolm_acceptance — serving-path self-spec acceptance on LEARNED
    weights (repolm512, trained on this repo's text).
  - config5_tiered_skip_selfspec — BASELINE config #5 as one measured
    composition (tiered + layer-skip + self-spec on the 1B Q4_K_M).
  - real_gguf_decode / real_gguf_quality — the real-weights hook:
    NT_REAL_GGUF (or a well-known drop dir, else the committed repolm)
    through the full load chain + tools/quality_gate.py.

    Decode metrics dispatch with the server's s_live fill bucket (r5);
    NT_ATTN_BUCKETS=0 reverts to the r4 full-S methodology.

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

def _bucket_live(S: int, needed: int) -> int | None:
    """The server's s_live bucket policy (serve.BatchServer._bucket_live,
    4-rung ladder): the bench dispatches exactly as production serving
    does — attention neither reads nor visits KV blocks past the batch's
    fill bucket (r5)."""
    if os.environ.get("NT_ATTN_BUCKETS", "4") == "0":
        return None
    for i in (1, 2, 3):
        b = (S * i) // 4
        if b >= 256 and b >= needed:
            return b
    return None


def bench_decode(dtype: str) -> dict:
    """Single-stream decode at B=1 through the batched serving step —
    deferred-write kernels (stacked-cache flash attention + one bulk
    in-place KV append), host-chained exactly as the server dispatches it
    (incl. the r5 s_live fill bucket).
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
        sl = _bucket_live(arch.max_seq_len, base + n + 1)
        for i in range(n):
            logits, bkv = batched_decode_step(
                arch, weights, bkv, tokens,
                jnp.full(1, base + i, jnp.int32), active, s_live=sl)
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

def bench_b32_int8(dtype: str = "q8_0") -> dict:
    """Continuous-batching step at B=32 with int8 KV (bf16 B=32 KV does not
    fit HBM next to the weights — int8 is the B=32 configuration by design).
    Host-chained steps, mid-context positions, delta-timed rounds.
    dtype "w8a8": the r5 int8-MXU serving format (one full-rate int8 dot
    per matmul, 8.03 bits/weight — quality priced by quality_gate.py)."""
    from ntransformer_tpu.models.batched import BatchedKV, batched_decode_step
    from ntransformer_tpu.models.synth import model_nbytes, synth_model

    B, ctx = 32, 1024
    cfg, arch, weights = synth_model("8b", dtype, max_seq_len=ctx)
    nbytes = model_nbytes(weights)
    bkv = BatchedKV.create(arch, B, quant=True)
    tokens = jnp.arange(B, dtype=jnp.int32) + 3
    active = jnp.ones(B, bool)

    def run(n, base):
        nonlocal bkv, tokens
        sl = _bucket_live(ctx, base + n + 1)
        for i in range(n):
            logits, bkv = batched_decode_step(
                arch, weights, bkv, tokens,
                jnp.full(B, base + i, jnp.int32), active, s_live=sl)
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
    log(f"B=32 int8 {dtype}: {dt*1e3:.2f} ms/step, {agg:.0f} tok/s aggregate")
    _free(weights, bkv)
    return {"metric": f"llama8b_{dtype}_b32_int8_aggregate",
            "value": round(agg, 1), "unit": "tok/s",
            "vs_baseline": round(agg / BASELINE_8B_Q8_DECODE, 3),
            "ms_per_step": round(dt * 1e3, 2),
            "s_live_bucket": _bucket_live(ctx, ctx // 2 + 64 + 3 * iters + 1)}


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


# ------------------------------------------------ speculative price sheet

def bench_spec_serve() -> dict:
    """Speculative-serving price sheet (r5 verdict item 2): per-dispatch
    cost of the three programs a spec round uses — plain decode, resident-
    prefix DRAFT (L/2 layers), and the [anchor + K drafts] KERNEL verify
    window — at B=1 and B=8, K=3; derived break-even acceptance and the
    full-acceptance tok/s ceiling. Same methodology as
    experiments/spec_serve_probe.py, on the driver scorecard."""
    from ntransformer_tpu.models.batched import (BatchedKV,
                                                 batched_decode_step,
                                                 batched_verify_step)
    from ntransformer_tpu.models.synth import synth_model

    K, ctx = 3, 1024
    cfg, arch, w = synth_model("8b", "q8_0", max_seq_len=ctx)
    nd = arch.n_layers // 2
    rows = []

    def time_fn(fn, iters):
        fn(3)
        t0 = time.perf_counter(); fn(iters); t1 = time.perf_counter()
        fn(3 * iters); t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (2 * iters)

    for B in (1, 8):
        bkv = BatchedKV.create(arch, B)
        toks = jnp.arange(B, dtype=jnp.int32) + 3
        act = jnp.ones(B, bool)
        base = ctx // 2
        state = {"bkv": bkv, "p": 0}

        def step(n, fn):
            for i in range(n):
                lg, state["bkv"] = fn((state["p"] + i) % 128)
            np.asarray(jnp.argmax(lg, -1))
            state["p"] += n

        def plain(n):
            step(n, lambda i: batched_decode_step(
                arch, w, state["bkv"], toks,
                jnp.full(B, base + i, jnp.int32), act))

        def draft(n):
            step(n, lambda i: batched_decode_step(
                arch, w, state["bkv"], toks,
                jnp.full(B, base + i, jnp.int32), act, n_layers=nd))

        vt = jnp.tile(toks[:, None], (1, K + 1))

        def verify(n):
            step(n, lambda i: batched_verify_step(
                arch, w, state["bkv"], vt,
                jnp.full(B, base + i, jnp.int32), act))

        t_plain = time_fn(plain, 12)
        t_draft = time_fn(draft, 12)
        t_verify = time_fn(verify, 6)
        round_cost = K * t_draft + t_verify
        breakeven = max(0.0, (round_cost / t_plain - 1) / K)
        ceiling = B * (1 + K) / round_cost
        rows.append({"B": B, "ms_plain": round(t_plain * 1e3, 2),
                     "ms_draft": round(t_draft * 1e3, 2),
                     "ms_verify": round(t_verify * 1e3, 2),
                     "breakeven_acceptance": round(breakeven, 3),
                     "full_accept_tok_s": round(ceiling, 1),
                     "speedup_at_full_accept": round(
                         ceiling * t_plain / B, 2)})
        log(f"spec B={B}: plain {rows[-1]['ms_plain']} draft "
            f"{rows[-1]['ms_draft']} verify {rows[-1]['ms_verify']} ms -> "
            f"break-even {breakeven:.3f}, ceiling x"
            f"{rows[-1]['speedup_at_full_accept']}")
        del bkv, state
        gc.collect()
    _free(w)
    b8 = rows[-1]
    return {"metric": "spec_serve_breakeven_b8",
            "value": b8["breakeven_acceptance"],
            "unit": "acceptance-fraction",
            "vs_baseline": None, "K": K, "rows": rows}


# --------------------------------------------- learned-weights acceptance

def _repolm_path() -> str:
    return os.path.join(_REPO, "models", "repolm512_q8.gguf")


def bench_spec_repolm() -> dict:
    """Serving-path speculative acceptance on LEARNED weights (r5 verdict
    item 3's standing metric): repolm512 (trained on this repo's text),
    BatchServer spec_k=3 greedy vs plain — acceptance % and steps saved."""
    from ntransformer_tpu.inference.sampler import SamplerConfig
    from ntransformer_tpu.inference.serve import BatchServer, Request
    from ntransformer_tpu.models.loader import load_model

    path = _repolm_path()
    if not os.path.exists(path):
        raise FileNotFoundError(f"no learned-weights model at {path}")
    prompts = ["def forward(", "import jax\nimport jax.numpy as jnp\n",
               "the reference's warp-per-row quantized GEMV family",
               "## Performance notes"]
    model = load_model(path)

    def serve(spec_k):
        srv = BatchServer(model, batch_size=4, spec_k=spec_k,
                          sampler_cfg=SamplerConfig(temperature=0.0))
        t0 = time.perf_counter()
        stats = srv.run([Request(prompt=p, max_tokens=64)
                         for p in prompts])
        return stats, time.perf_counter() - t0

    st0, dt0 = serve(0)
    st1, dt1 = serve(3)
    acc = 100.0 * st1.spec_accepted / max(st1.spec_drafted, 1)
    log(f"repolm spec_k=3: acceptance {acc:.1f}% "
        f"({st1.spec_accepted}/{st1.spec_drafted}), steps {st1.steps} vs "
        f"plain {st0.steps}")
    _free(model)
    return {"metric": "spec_repolm_acceptance", "value": round(acc, 1),
            "unit": "percent", "vs_baseline": round(acc / 44.0, 3),
            # reference's measured acceptance: 44% (OPTIMIZATIONS.md:44-57)
            "steps_spec": st1.steps, "steps_plain": st0.steps,
            "steps_saved_ratio": round(1 - st1.steps / max(st0.steps, 1),
                                       3),
            "tokens": st1.tokens}


# --------------------------------------------------- config #5 composition

def bench_config5() -> dict:
    """BASELINE config #5 as one measured composition (r5 verdict item 2):
    tiered streaming + layer-skip calibration + self-speculative draft-k=3
    on the 1B Q4_K_M GGUF. Synthetic cosines don't cross the spec'd 0.98
    (recorded honestly since r4), so the skip threshold calibrates at the
    profile's p75 — every mechanism (SLEP, skip-driven I/O elision,
    resident-prefix draft, streamed verify) is exercised and measured."""
    from ntransformer_tpu.inference.engine import GenerateConfig, TieredEngine
    from tools.make_test_gguf import write_model

    gguf = os.path.join(os.environ.get("NT_BENCH_PACK_DIR", "/root/models_1b"),
                        "llama1b_q4km.gguf")
    if not os.path.exists(gguf):
        os.makedirs(os.path.dirname(gguf), exist_ok=True)
        write_model(gguf, "1b", "q4_k_m", seed=1)
    n_tok = int(os.environ.get("NT_BENCH_CONFIG5_TOKENS", "6"))
    n_hbm = int(os.environ.get("NT_BENCH_CONFIG5_HBM", "12"))
    eng = TieredEngine.load(gguf, max_hbm_layers=n_hbm,
                            max_ram_layers=16 - n_hbm)
    tiers = eng.tm.tiers
    layer_b = eng.tm.pack.max_layer_nbytes
    prompt = "The capital of France is"
    gcfg = GenerateConfig(max_tokens=4, temperature=0.0,
                          repeat_penalty=1.0, skip_threshold=0.98)
    _, st = eng.generate(prompt, gcfg)
    skipped = list(eng.skip)
    thr = "0.98"
    if not skipped:
        from ntransformer_tpu.models.tiered import forward_tiered
        kv = eng._make_kv()
        ids = eng._encode(prompt)
        _, _, cos = forward_tiered(eng.tm, kv, jnp.asarray(ids, jnp.int32),
                                   0, with_cosine=True)
        cos = np.asarray(cos)
        n = eng.arch.n_layers
        mid = cos[n // 4: (3 * n) // 4]
        t = float(np.quantile(mid, 0.75))
        eng.layer_sel = None
        skipped = eng._calibrate(cos, t)
        thr = f"p75={t:.3f} (0.98 skips 0 on synthetic cosines, "\
              f"max {float(mid.max()):.3f})"
    eng.skip = frozenset(skipped)
    streamed_skipped = [l for l in skipped if l >= tiers.n_hbm]
    t0 = time.perf_counter()
    _, st = eng.generate_self_speculative(prompt, GenerateConfig(
        max_tokens=n_tok, temperature=0.0, repeat_penalty=1.0, draft_k=3))
    wall = time.perf_counter() - t0
    tps = st.decode_tokens / (st.decode_ms / 1e3)
    acc = 100.0 * st.accepted / max(st.drafted, 1)
    log(f"config5: {tps:.3f} tok/s, acceptance {acc:.1f}%, "
        f"{len(skipped)} skipped ({len(streamed_skipped)} streamed), "
        f"wall {wall:.0f}s")
    eng.tm.streamer.close()
    _free(eng)
    return {"metric": "config5_tiered_skip_selfspec",
            "value": round(tps, 3), "unit": "tok/s", "vs_baseline": None,
            "skip_threshold": thr, "layers_skipped": len(skipped),
            "streamed_layers_skipped": len(streamed_skipped),
            "io_saved_mb_per_token": round(
                len(streamed_skipped) * layer_b / 1e6, 1),
            "acceptance_pct": round(acc, 1),
            "tiers": {"hbm": tiers.n_hbm, "ram": tiers.n_ram}}


# ------------------------------------------------------ real-GGUF hook

def _real_gguf() -> str | None:
    """Real-weights day is zero-effort (r5 verdict item 8): NT_REAL_GGUF,
    else the first GGUF in the well-known drop dirs, else the committed
    repolm (learned weights, exercises the full hook)."""
    p = os.environ.get("NT_REAL_GGUF")
    if p and os.path.exists(p):
        return p
    for d in ("/root/models", "/root/gguf"):
        if os.path.isdir(d):
            for f in sorted(os.listdir(d)):
                if f.endswith(".gguf"):
                    return os.path.join(d, f)
    p = _repolm_path()
    return p if os.path.exists(p) else None


def bench_real_decode() -> dict:
    """Greedy decode tok/s on the detected real GGUF through the full
    chain: parse -> planar relayout -> upload -> Engine.generate."""
    from ntransformer_tpu.inference.engine import Engine, GenerateConfig

    path = _real_gguf()
    if path is None:
        raise FileNotFoundError("no real GGUF found (set NT_REAL_GGUF)")
    eng = Engine.load(path)
    cfg = GenerateConfig(max_tokens=96, temperature=0.0, repeat_penalty=1.0)
    eng.generate("The", cfg)  # compile + warm
    _, st = eng.generate("def forward(", cfg)
    tps = st.decode_tokens / (st.decode_ms / 1e3)
    log(f"real GGUF {os.path.basename(path)}: {tps:.1f} tok/s decode")
    _free(eng)
    return {"metric": "real_gguf_decode", "value": round(tps, 2),
            "unit": "tok/s", "vs_baseline": None,
            "model": os.path.basename(path)}


def bench_real_quality() -> dict:
    """tools/quality_gate.py on the detected real GGUF: tokenizer
    conformance, greedy goldens (quant kernels vs bf16 dequant), per-dtype
    PPL deltas vs fixture budgets. value = 1.0 iff the gate passes."""
    from tools.quality_gate import run_gate

    path = _real_gguf()
    if path is None:
        raise FileNotFoundError("no real GGUF found (set NT_REAL_GGUF)")
    corpus = os.environ.get("NT_REAL_CORPUS",
                            os.path.join(_REPO, "README.md"))
    dtypes = os.environ.get("NT_REAL_DTYPES", "q4_k_m,w4a8,w8a8").split(",")
    res = run_gate(path, corpus, dtypes, None, update=False,
                   ctx=256, windows=4, golden_tokens=16)
    deltas = res["checks"].get("ppl", {}).get("deltas", {})
    log(f"quality gate on {os.path.basename(path)}: "
        f"{'PASS' if res['pass'] else 'FAIL'} deltas={deltas}")
    return {"metric": "real_gguf_quality",
            "value": 1.0 if res["pass"] else 0.0, "unit": "gate-pass",
            "vs_baseline": None, "model": res["model"],
            "ppl_deltas": deltas,
            "logit_rel_err": res["checks"].get("goldens", {}).get(
                "logit_rel_err")}


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
    # w8a8 (r5): the serving-format twin — per-column int8 weights, one
    # full-rate int8 MXU dot at any batch; quality priced per source
    # dtype by tools/quality_gate.py
    "llama8b_w8a8_resident_decode": lambda: bench_decode("w8a8"),
    "llama8b_q8_0_b32_int8_aggregate": bench_b32_int8,
    "llama8b_w8a8_b32_int8_aggregate": lambda: bench_b32_int8("w8a8"),
    "llama8b_q8_0_prefill_t2048": bench_prefill,
    "tiered_1b_overlap_efficiency": bench_tiered,
    # r5 additions (verdict items 2, 3, 8): the speculative price sheet,
    # learned-weights acceptance, the config-#5 composition, and the
    # real-GGUF hook (decode + quality gate)
    "spec_serve_breakeven_b8": bench_spec_serve,
    "spec_repolm_acceptance": bench_spec_repolm,
    "config5_tiered_skip_selfspec": bench_config5,
    "real_gguf_decode": bench_real_decode,
    "real_gguf_quality": bench_real_quality,
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
