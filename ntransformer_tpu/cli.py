"""CLI — flag-for-flag capability parity with the reference binary
(src/main.cpp:10-30): -m/-p/-n/-t/--top-k/--top-p/--repeat-penalty/-c/
--seed/--streaming/--draft-model/--draft-k/--self-spec/--early-exit/
--skip-threshold/--requant-q4k/--benchmark/--chat/-v, plus TPU-specific
tier overrides. `--delta-model` is accepted but refused with the measured
negative result (docs/research/R1_delta_streaming.md: mechanically works,
output garbage — see tools/decompose_gguf.py).

Usage: python -m ntransformer_tpu -m model.gguf -p "prompt" [-n 128] ...
"""
from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="ntransformer_tpu",
        description="TPU-native quantized GGUF inference engine")
    p.add_argument("-m", "--model", required=True, help="GGUF model path")
    p.add_argument("-p", "--prompt", default="The capital of France is")
    p.add_argument("-n", "--max-tokens", type=int, default=128)
    p.add_argument("-t", "--temperature", type=float, default=0.8)
    p.add_argument("--top-k", type=int, default=40)
    p.add_argument("--top-p", type=float, default=0.95)
    p.add_argument("--repeat-penalty", type=float, default=1.1)
    p.add_argument("-c", "--ctx-size", type=int, default=4096)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--streaming", action="store_true",
                   help="force tiered streaming even if the model fits HBM")
    p.add_argument("--draft-model", default=None,
                   help="separate resident draft model for speculation")
    p.add_argument("--draft-k", type=int, default=4)
    p.add_argument("--self-spec", action="store_true",
                   help="self-speculative decoding (resident prefix draft)")
    p.add_argument("--early-exit", type=float, default=0.0,
                   help="early-exit cosine threshold (measured no-op on 70B)")
    p.add_argument("--skip-threshold", type=float, default=0.0,
                   help="layer-skip calibration threshold, e.g. 0.98")
    p.add_argument("--requant-q4k", action="store_true",
                   help="requantize Q6_K tensors to Q4_K at pack build")
    p.add_argument("--requant-ram", action="store_true",
                   help="requantize RAM-tier (tier B) Q6_K layers to Q4_K "
                        "as they load — no pack rebuild, disk tier "
                        "untouched (reference streamer.cu:45-153)")
    p.add_argument("--delta-model", default=None,
                   help="(negative result — refused; see R1)")
    p.add_argument("--max-hbm-layers", type=int, default=None)
    p.add_argument("--max-ram-layers", type=int, default=None)
    p.add_argument("--benchmark", action="store_true")
    p.add_argument("--bench-tokens", type=int, default=64)
    p.add_argument("--chat", action="store_true")
    p.add_argument("--tp", type=int, default=None,
                   help="tensor-parallel ways over the device mesh "
                        "(resident engine; wq/wk/wv/gate/up column-, "
                        "wo/down row-parallel)")
    p.add_argument("--cp", type=int, default=None,
                   help="context-parallel ways: KV cache shards along the "
                        "sequence axis, context bounded by the mesh's "
                        "aggregate HBM instead of one chip's")
    p.add_argument("--ep", type=int, default=None,
                   help="expert-parallel ways (MoE models only): expert "
                        "planes shard on their E axis across the mesh; "
                        "router/attention/KV replicate")
    p.add_argument("--kv-int8", action="store_true",
                   help="int8 KV cache with per-position scales (halves KV "
                        "memory; resident, tiered and serve paths)")
    p.add_argument("--spec-k", type=int, default=0,
                   help="speculative serving: K resident-prefix draft "
                        "tokens per verify round (greedy --serve/--http; "
                        "outputs stay bit-identical to spec-off)")
    p.add_argument("--spec-draft-layers", type=int, default=None,
                   help="draft depth for --spec-k (default n_layers/2)")
    p.add_argument("--serve", default=None, metavar="PROMPTS_FILE",
                   help="continuous-batching mode: one prompt per line; "
                        "prints completions + aggregate throughput; "
                        "composes with --tp/--dp for the multi-chip server")
    p.add_argument("--http", type=int, default=None, metavar="PORT",
                   help="live continuous-batching HTTP server (OpenAI-style "
                        "POST /v1/completions, SSE streaming); same mesh "
                        "options as --serve; runs until interrupted")
    p.add_argument("--host", default="127.0.0.1",
                   help="bind address for --http (default loopback)")
    p.add_argument("--dp", type=int, default=None,
                   help="data-parallel ways for --serve (batch slots shard "
                        "across dp groups; with --tp builds a dp x tp mesh)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--prefix-cache", type=int, default=0,
                   help="keep the last N admitted prompts' prefill KV for "
                        "prefix reuse (shared system prompts prefill once; "
                        "costs one sequence cache of HBM per entry)")
    p.add_argument("--no-fuse", action="store_true",
                   help="disable fused wqkv / gate|up weights (fusion is "
                        "default-on for resident single-chip paths)")
    p.add_argument("--w4a8", action="store_true",
                   help="requantize weights to the engine-native W4A8 "
                        "format at load: int8-MXU decode kernel, ~20%% "
                        "faster than exact K-quant dequant. CHANGES "
                        "NUMERICS — price it with tools/quality_gate.py")
    p.add_argument("--w8a8", action="store_true",
                   help="requantize weights to the W8A8 serving format "
                        "at load: per-column int8 + one full-rate int8 "
                        "MXU dot at ANY batch size (decode, verify, "
                        "prefill). CHANGES NUMERICS — price it with "
                        "tools/quality_gate.py")
    p.add_argument("-v", "--verbose", action="store_true")
    return p


def should_stream(path: str, ctx: int, args) -> bool:
    """Tiered vs resident decision: file size + KV cache vs free HBM (the
    reference's auto tier sizing makes the same call, streamer.cu:158-226)."""
    if (args.streaming or args.self_spec or args.requant_q4k
            or args.requant_ram):
        return True  # flags imply streaming (main.cpp:112-119,138-144)
    if args.max_hbm_layers is not None or args.max_ram_layers is not None:
        return True
    from .memory.tiers import HBM_MARGIN_BYTES, hbm_free_bytes
    try:
        need = os.path.getsize(path)
    except OSError:
        return False
    return need + HBM_MARGIN_BYTES + (1 << 30) > hbm_free_bytes()


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from .inference.engine import Engine, GenerateConfig, TieredEngine
    from .utils import logging as log
    from .utils.timing import PROFILER

    if args.verbose:
        log.set_level("debug")
        PROFILER.enabled = True
        os.environ.setdefault("NT_PROFILE", "1")

    if args.delta_model:
        log.error("delta streaming is a measured negative result (output "
                  "garbage; weights across layers are uncorrelated — "
                  "reference docs/research/R1_delta_streaming.md). Refusing. "
                  "Build .ntd files with tools/decompose_gguf.py to study it.")
        return 2

    cfg = GenerateConfig(
        max_tokens=args.max_tokens, temperature=args.temperature,
        top_k=args.top_k, top_p=args.top_p,
        repeat_penalty=args.repeat_penalty, seed=args.seed,
        draft_k=args.draft_k, skip_threshold=args.skip_threshold,
        early_exit_threshold=args.early_exit)

    if args.serve and args.http is not None:
        log.error("--serve replays a prompts file to completion; --http is "
                  "the live network server — pick one")
        return 2
    if args.serve or args.http is not None:
        # continuous batching needs the resident batched step
        from .inference.serve import BatchServer, Request
        from .inference.sampler import SamplerConfig
        from .models.loader import load_model
        mode = "--serve" if args.serve else "--http"
        if args.cp:
            log.error(f"{mode} shards slots over dp and weights over tp; "
                      "context parallelism (--cp) is a single-request "
                      "long-context mode and does not compose with the "
                      "batch server")
            return 2
        if args.draft_model or args.self_spec or args.streaming:
            log.error(f"{mode} is the resident continuous-batching loop; "
                      "--draft-model/--self-spec/--streaming are "
                      "single-request engine modes and do not compose "
                      "with it")
            return 2
        # --spec-k composes with temperature > 0 (greedy-draft rejection
        # sampling) and with --tp/--dp meshes (sharded draft/verify) — r5
        mesh = None
        if args.tp or args.dp:
            from .parallel.multihost import make_mesh
            mesh = make_mesh(tp=args.tp or 1, dp=args.dp)
            log.info(f"serving over mesh {dict(mesh.shape)}")
        # device=False under a mesh: weights go host -> shards directly.
        # Under TP the server itself fuses with the per-shard INTERLEAVED
        # lane order (fuse_layer_weights(tp=...)), so column sharding
        # keeps each shard's q|k|v slices together.
        if (args.w4a8 or args.w8a8) and mesh is not None:
            log.error("--w4a8/--w8a8 do not compose with --tp/--dp "
                      "serving yet (convert-then-shard lands with a "
                      "parity test)")
            return 2
        model = load_model(args.model, max_seq_len=args.ctx_size,
                           device=mesh is None,
                           fuse=mesh is None and not args.no_fuse,
                           w4a8=args.w4a8, w8a8=args.w8a8)
        srv = BatchServer(model, batch_size=args.batch_size,
                          fuse=not args.no_fuse,
                          prefix_cache=args.prefix_cache,
                          spec_k=args.spec_k,
                          spec_draft_layers=args.spec_draft_layers,
                          kv_quant=args.kv_int8, mesh=mesh,
                          sampler_cfg=SamplerConfig(
                              temperature=args.temperature,
                              top_k=args.top_k, top_p=args.top_p,
                              repeat_penalty=args.repeat_penalty,
                              seed=args.seed))
        if args.http is not None:
            from .inference.http_server import serve_http
            serve_http(srv, host=args.host, port=args.http)
            return 0
        with open(args.serve) as f:
            prompts = [ln.rstrip("\n") for ln in f if ln.strip()]
        # the replay file is operator-authored (trusted): chat-template
        # control strings must become real control ids, unlike --http
        # prompts from untrusted clients (parse_special stays False there)
        reqs = [Request(prompt=pr, max_tokens=args.max_tokens,
                        parse_special=True)
                for pr in prompts]
        stats = srv.run(reqs)
        for r in reqs:
            print(f"### {r.prompt!r}\n{r.text}\n")
        print(stats.report(), file=sys.stderr)
        return 0

    if args.dp:
        log.error("--dp shards batch slots of the continuous-batching "
                  "server; it requires --serve or --http (use --tp for "
                  "single-request tensor parallelism)")
        return 2

    stream = should_stream(args.model, args.ctx_size, args)
    if args.w4a8 and args.w8a8:
        log.error("--w4a8 and --w8a8 are mutually exclusive (pick the "
                  "decode-optimized or the serving format)")
        return 2
    if (args.w4a8 or args.w8a8) and (stream or args.tp or args.cp
                                     or args.ep):
        log.error("--w4a8/--w8a8 are resident single-chip modes for now: "
                  "the tiered pack streams SOURCE-dtype planes, and the "
                  "parallel engines shard source planes (convert-then-"
                  "shard lands with a parity test before it is enabled). "
                  "Drop the parallel/streaming flags, or drop the "
                  "requant flag.")
        return 2
    if args.draft_model and (args.cp or args.tp or args.ep):
        log.error("--draft-model pairs with the single-chip resident or "
                  "tiered engine (reference main.cpp:121-132); it is not "
                  "supported under --tp/--cp/--ep")
        return 2
    if args.ep and (args.cp or args.tp):
        log.error("--ep is its own mesh (expert axis); it does not "
                  "compose with --tp/--cp yet")
        return 2
    if args.ep and stream:
        log.error("--ep is a resident mode; it does not compose with "
                  "tiered streaming")
        return 2
    if stream and args.cp:
        log.error("--cp is a resident long-context mode; it does not "
                  "compose with tiered streaming (drop --cp, or drop the "
                  "flags/model-size that force streaming — use --tp for "
                  "streamed-layer sharding)")
        return 2
    if stream:
        from .core.dtypes import DType
        if args.draft_model:
            # draft loads FIRST, fully resident, and gets HBM priority;
            # the tiered target sizes itself on the remainder — the
            # reference's load-order rule (main.cpp:121-132). Streamed-
            # layer cost then amortizes over the K+1 verify positions.
            log.info(f"loading draft {args.draft_model} (resident, HBM "
                     "priority) + target (tiered streaming)")
        else:
            log.info(f"loading {args.model} (tiered streaming)")
        mesh = None
        if args.tp:
            # tiered-over-TP: each shard stages its slice of every
            # streamed layer (tests/test_tiered.py::test_tiered_tp_parity).
            # Use a PURE tp-way mesh over the first tp devices —
            # make_mesh(tp=N) on a bigger rig would infer a dp axis and
            # replicate every streamed layer's staging dp times
            import jax as _jax
            import numpy as _np
            from jax.sharding import Mesh as _Mesh
            from .parallel.tp import TP_AXIS
            devs = _jax.devices()
            if len(devs) < args.tp:
                log.error(f"--tp {args.tp}: only {len(devs)} devices")
                return 2
            mesh = _Mesh(_np.asarray(devs[: args.tp]), (TP_AXIS,))
            log.info(f"tiered streaming over {args.tp}-way TP")
        engine = TieredEngine.load(
            args.model, max_seq_len=args.ctx_size,
            requant=DType.Q4_K if args.requant_q4k else None,
            requant_ram=DType.Q4_K if args.requant_ram else None,
            max_hbm_layers=args.max_hbm_layers,
            max_ram_layers=args.max_ram_layers,
            kv_quant=args.kv_int8,
            draft_path=args.draft_model,
            mesh=mesh)
    elif args.ep:
        from .inference.engine import EPEngine
        log.info(f"loading {args.model} (resident, {args.ep}-way "
                 "expert parallel)")
        engine = EPEngine.load(args.model, ep=args.ep,
                               max_seq_len=args.ctx_size,
                               kv_quant=args.kv_int8)
    elif args.cp:
        from .inference.engine import CPEngine
        ways = (f"{args.cp}x{args.tp} context x tensor parallel"
                if args.tp else f"{args.cp}-way context parallel")
        log.info(f"loading {args.model} (resident, {ways})")
        engine = CPEngine.load(args.model, cp=args.cp, tp=args.tp,
                               max_seq_len=args.ctx_size,
                               kv_quant=args.kv_int8)
    elif args.tp:
        from .inference.engine import TPEngine
        log.info(f"loading {args.model} (resident, {args.tp}-way TP)")
        engine = TPEngine.load(args.model, tp=args.tp,
                               max_seq_len=args.ctx_size,
                               fuse=not args.no_fuse,
                               kv_quant=args.kv_int8)
    else:
        log.info(f"loading {args.model} (resident)")
        # draft loaded FIRST so it gets HBM priority (main.cpp:121-132)
        engine = Engine.load(args.model, draft_path=args.draft_model,
                             max_seq_len=args.ctx_size,
                             kv_quant=args.kv_int8,
                             fuse=not args.no_fuse,
                             w4a8=args.w4a8, w8a8=args.w8a8)

    if args.chat:
        engine.chat(cfg)
        return 0

    if args.benchmark:
        stats = engine.benchmark(args.prompt, n_tokens=args.bench_tokens)
        print(stats.report(), file=sys.stderr)
        return 0

    def emit(piece: str):
        print(piece, end="", flush=True)

    if args.self_spec:
        text, stats = engine.generate_self_speculative(args.prompt, cfg, emit)
    elif args.draft_model:
        # works on BOTH the resident and tiered engines (tiered target:
        # draft decodes resident, verify streams once per K+1 positions)
        text, stats = engine.generate_speculative(args.prompt, cfg, emit)
    else:
        text, stats = engine.generate(args.prompt, cfg, emit)
    print()
    print(stats.report(), file=sys.stderr)
    if args.verbose:
        if PROFILER.enabled:
            print(PROFILER.summary(), file=sys.stderr)
        from .utils.timing import device_memory_report
        print(device_memory_report(), file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
