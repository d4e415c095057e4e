"""Continuous batching: slot-based serving over the batched decode step.

Beyond the reference (strictly batch-1, SURVEY §0): a fixed pool of B
sequence slots decodes in lock-step through models/batched.py; finished
sequences retire and waiting requests are admitted mid-flight, so the batch
stays full — the standard production serving loop, shaped for XLA: one
compiled decode program regardless of arrival order, no dynamic shapes.

Admission is CHUNKED and interleaved with decode (r1 verdict item 4: a full
synchronous prefill inside the decode loop head-of-line-blocked every
in-flight sequence for the whole prompt): each loop iteration runs one
batched decode step, then advances at most ONE prefill chunk of the next
waiting request — so an admission stalls decode by ≤ 1 chunk regardless of
prompt length. Per-token streaming callbacks (`Request.on_token`) fire as
tokens are sampled, and `Request.arrival_s` supports arrival-time
simulation in benchmarks.

Two entry points share the same loop: `run(requests)` serves a fixed list
(optionally replaying an arrival process) and `serve_forever(inbox, stop)`
is the LIVE mode — other threads submit Requests on a queue.Queue while
the loop runs (inference/http_server.py is the stdlib HTTP front-end over
it). All jax work stays on the serving thread either way.
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..models.batched import (BatchedKV, batched_decode_step,
                              batched_verify_step)
from ..models.llama import KVCache, forward
from ..models.loader import LoadedModel
from .engine import Engine, _bucket
from .sampler import BatchedSampler, SamplerConfig


@dataclass
class Request:
    prompt: str
    max_tokens: int = 128
    request_id: int = 0
    # streaming: called once per sampled token with the decoded text piece
    # ('' while a multi-byte character is still incomplete — StreamDecoder
    # reassembles split UTF-8 instead of emitting mojibake)
    on_token: object = None
    # False (default): special tokens in the prompt are encoded as PLAIN
    # TEXT — an untrusted user typing '<|start_header_id|>' cannot smuggle
    # real control ids into the sequence (advisor finding r2). Set True
    # only for trusted, server-side chat-template text.
    parse_special: bool = False
    # simulated arrival offset (seconds after server start); 0 = available
    # immediately — lets benchmarks replay an arrival process
    arrival_s: float = 0.0
    # called once with the finished Request (after text is set); the HTTP
    # front-end uses it to wake the handler thread blocked on this request
    on_done: object = None
    # cooperative cancellation: any thread may set this (bool writes are
    # atomic under the GIL); the serving loop retires the slot at the next
    # step boundary instead of decoding to max_tokens — a disconnected
    # client stops consuming batch capacity. done() still fires.
    cancelled: bool = False
    # PER-REQUEST sampling overrides (temperature / top_k / top_p /
    # repeat_penalty / seed), applied at slot admission on a non-greedy
    # server (BatchedSampler holds per-slot params on device; top_k clamps
    # to the server's compiled cap). Ignored on a greedy server — that
    # mode exists for bit-reproducible serving.
    sampling: dict | None = None
    # filled by the server:
    prompt_ids: list = field(default_factory=list)
    output_ids: list = field(default_factory=list)
    submitted_at: float = 0.0
    first_token_at: float = 0.0
    finished_at: float = 0.0
    _text: str = ""
    _dec: object = None  # per-request StreamDecoder (lazy)

    @property
    def text(self):
        return self._text

    def done(self, text: str):
        if self.on_token is not None and self._dec is not None:
            self._dec.flush_to(self.on_token)  # trailing incomplete bytes
        self._text = text
        self.finished_at = time.time()
        if self.on_done is not None:
            self.on_done(self)


@dataclass
class ServeStats:
    requests: int = 0
    tokens: int = 0
    wall_s: float = 0.0
    steps: int = 0           # full-model batched dispatches (decode+verify)
    prefill_chunks: int = 0
    prefix_hits: int = 0  # admissions that reused a cached prompt prefix
    # speculative serving: resident-prefix draft dispatches and the
    # per-slot drafted/accepted token accounting (engine Stats analogue)
    draft_steps: int = 0
    spec_drafted: int = 0
    spec_accepted: int = 0
    ttft_s: list = field(default_factory=list)  # per-request time-to-first-token

    @property
    def tokens_per_s(self) -> float:
        return self.tokens / self.wall_s if self.wall_s else 0.0

    @property
    def acceptance(self) -> float:
        return (self.spec_accepted / self.spec_drafted
                if self.spec_drafted else 0.0)

    def report(self) -> str:
        ttft = (f", ttft p50 {np.median(self.ttft_s)*1e3:.0f} ms"
                if self.ttft_s else "")
        hits = f", {self.prefix_hits} prefix hits" if self.prefix_hits else ""
        spec = (f", {self.draft_steps} draft steps, "
                f"{self.acceptance:.0%} accepted"
                if self.spec_drafted else "")
        return (f"served {self.requests} requests, {self.tokens} tokens in "
                f"{self.wall_s:.2f}s ({self.tokens_per_s:.2f} tok/s, "
                f"{self.steps} batched steps, {self.prefill_chunks} prefill "
                f"chunks{hits}{spec}{ttft})")


class _Admission:
    """A request mid-prefill: its private KV fills one chunk per server
    loop iteration, so in-flight decode never waits on a whole prompt."""

    def __init__(self, r: Request, arch, chunk: int, make_kv, prefill_fn,
                 kv=None, start: int = 0):
        self.r = r
        # kv/start: prefix-cache reuse — positions [0, start) are already
        # live in the provided cache, so only the delta prefills
        self.kv = kv if kv is not None else make_kv()
        self.off = self.start = start
        self.chunk = chunk
        self.arch = arch
        self.last_logits = None
        self._prefill = prefill_fn

    @property
    def finished(self) -> bool:
        return self.off >= len(self.r.prompt_ids)

    def step(self, weights):
        """Run ONE prefill chunk (bucketed, same compiled set as Engine)."""
        ids = self.r.prompt_ids
        chunk = ids[self.off: self.off + self.chunk]
        t = len(chunk)
        S = self.arch.max_seq_len
        p = min(_bucket(t) if self.off == self.start and t <= self.chunk
                else self.chunk, S - self.off)
        padded = np.zeros(p, np.int32)
        padded[:t] = chunk
        logits, self.kv = self._prefill(weights, self.kv, padded, self.off, t)
        self.off += t
        self.last_logits = logits[0]


class BatchServer:
    """Greedy continuous-batching server (temperature via per-slot samplers).

    mesh: a (dp[, tp]) jax.sharding.Mesh turns this into the MULTI-CHIP
    server (BASELINE north star: continuous batching across hosts): batch
    slots shard over dp with zero cross-group collectives, weights
    replicate over dp and megatron-shard over tp, and admission prefill
    runs TP-sharded through parallel.tp.make_tp_forward. Pass the model
    loaded with device=False so weights go host→shards directly."""

    def __init__(self, model: LoadedModel, batch_size: int = 8,
                 sampler_cfg: SamplerConfig | None = None,
                 kv_quant: bool = False, admit_chunk: int | None = None,
                 mesh=None, fuse: bool = False, prefix_cache: int = 0,
                 spec_k: int = 0, spec_draft_layers: int | None = None,
                 attn_buckets: int | None = None):
        # attn_buckets (single-chip path): dispatch the decode/draft/
        # verify programs with a STATIC live-prefix bound s_live — the
        # smallest ladder bucket covering max(pos) across slots — so
        # attention neither reads nor visits KV blocks past the batch's
        # fill level (r5: the per-grid-step ~1.5 us floor makes
        # per-sequence block elision net-negative; a static bucket cuts
        # DMA and steps together). N ladder rungs = N extra compiles per
        # program at warmup; default 4 (0 disables; NT_ATTN_BUCKETS
        # overrides). Worth ~2x on attention at half-fill.
        if attn_buckets is None:
            attn_buckets = int(os.environ.get("NT_ATTN_BUCKETS", "4"))
        self.attn_buckets = attn_buckets
        self._fuse = fuse  # sharded path: interleaved fused QKV/gate-up
        # spec_k > 0: SELF-SPECULATIVE serving — every loop iteration runs
        # K lock-step draft steps through the model's resident-prefix
        # layers (spec_draft_layers, default n_layers/2), then ONE verify
        # window of [anchor, drafts] per slot; each slot accepts its
        # longest matching prefix + a correction token (the reference's
        # anchor re-feed protocol, engine.cpp:150-351, batched). Greedy
        # output is BIT-IDENTICAL to spec-off serving — the accept rule
        # preserves argmax regardless of acceptance rate.
        self.spec_k = spec_k
        self.spec_draft = (spec_draft_layers if spec_draft_layers is not None
                           else max(1, model.arch.n_layers // 2))
        # spec_k with temperature > 0 runs greedy-draft REJECTION SAMPLING
        # (BatchedSampler.spec_accept — exactly unbiased for the
        # deterministic draft); spec_k on a dp/tp mesh runs the sharded
        # draft/verify twins (parallel/dp.py). Both r4 refusals removed.
        if spec_k and not (1 <= self.spec_draft <= model.arch.n_layers):
            raise ValueError(
                f"spec_draft_layers must be in [1, {model.arch.n_layers}]")
        # prefix_cache > 0: keep the last N admitted prompts' prefill KV
        # alive; a new request whose prompt shares a prefix with one
        # prefills only the DELTA (shared system prompts prefill once).
        # COSTS one full single-sequence cache of HBM per entry — opt-in.
        self.prefix_cache = prefix_cache
        self._pcache: list[tuple[list[int], object]] = []  # LRU, newest last
        self.model = model
        self.arch = model.arch
        self.B = batch_size
        self.scfg = sampler_cfg or SamplerConfig(temperature=0.0)
        self.tokenizer = model.tokenizer
        self.kv_quant = kv_quant  # int8 KV for both prefill and batch caches
        # default to the engine's chunk so the chunked-prefill programs are
        # genuinely the same compiled set (advisor finding r2)
        self.admit_chunk = (admit_chunk if admit_chunk is not None
                            else Engine.PREFILL_CHUNK)
        self.mesh = mesh
        self._multiproc = jax.process_count() > 1
        if mesh is not None:
            self._init_sharded(mesh)
            # host-side weights served their purpose (sharded placement +
            # spec templates); keeping them would hold a full host copy
            # for the server's lifetime (~35 GB at 70B — same drop as
            # TPEngine, advisor finding r1)
            import dataclasses
            self.model = dataclasses.replace(model, weights=None)
        else:
            self.weights = model.weights
            self._step = lambda w, bkv, t, p, a, sl=None: \
                batched_decode_step(self.arch, w, bkv, t, p, a, s_live=sl)
            self._draft = lambda w, bkv, t, p, a, sl=None: \
                batched_decode_step(self.arch, w, bkv, t, p, a,
                                    n_layers=self.spec_draft, s_live=sl)
            self._verify = lambda w, bkv, t, p, a, sl=None: \
                batched_verify_step(self.arch, w, bkv, t, p, a, s_live=sl)
            S = model.arch.max_seq_len
            # the s_live ladder: attn_buckets rungs at S/N granularity
            # (min 256 — tiny buckets only add compiles); full S is the
            # implicit last rung (s_live=None)
            # rungs must be 128-multiples: block_s lands on the LANE axis
            # of the S-minor int8 scale tiles (Mosaic divisibility)
            self._attn_ladder = sorted({
                b for b in ((S * i) // max(self.attn_buckets, 1)
                            for i in range(1, max(self.attn_buckets, 1)))
                if 256 <= b < S and b % 128 == 0}) if self.attn_buckets \
                else []
            self._insert = lambda bkv, kv, slot: bkv.insert(slot, kv)
            self._vec = jnp.asarray
            self._vec2 = jnp.asarray
            self._fetch = np.asarray
            self._sampler_kw = {}
            self._make_bkv = lambda: BatchedKV.create(self.arch, self.B,
                                                      quant=self.kv_quant)
            self._make_kv = lambda: KVCache.create(self.arch,
                                                   quant=self.kv_quant)

            def _prefill(w, kv, padded, off, n_valid):
                logits, kv, _ = forward(self.arch, w, kv,
                                        jnp.asarray(padded), off,
                                        n_valid=n_valid)
                return logits, kv
            self._prefill = _prefill

    def _bucket_live(self, needed: int):
        """Smallest s_live ladder rung covering `needed` (the max cache
        position any slot may attend this dispatch, +1); None = full S."""
        for b in self._attn_ladder:
            if b >= needed:
                return b
        return None

    def _prefix_lookup(self, ids: list[int]):
        """(kv_copy, start) for the cached entry sharing the longest
        prefix with `ids` (LRU-refreshed), or (None, 0). The copy keeps
        the cached entry intact while the admission's prefill donates its
        way through the delta chunks; at least one token always prefills
        (the sampler needs the last position's logits)."""
        best_n, best_i = 0, -1
        for i, (cached, _) in enumerate(self._pcache):
            n = 0
            lim = min(len(cached), len(ids) - 1)
            while n < lim and cached[n] == ids[n]:
                n += 1
            if n > best_n:
                best_n, best_i = n, i
        if best_i < 0 or best_n < 8:  # a tiny shared prefix isn't worth
            return None, 0            # the cache-copy bandwidth
        self._pcache.append(self._pcache.pop(best_i))  # LRU refresh
        kv = self._pcache[-1][1]
        return jax.tree.map(lambda a: a.copy(), kv), best_n

    def _prefix_store(self, ids: list[int], kv) -> None:
        """Keep a finished admission's prompt KV for future prefix reuse
        (the batch insert COPIES into the batched cache, so the
        single-sequence cache stays valid and unreferenced)."""
        if not self.prefix_cache:
            return
        for i, (cached, _) in enumerate(self._pcache):
            if cached == ids:       # replace an identical-prompt entry
                self._pcache.pop(i)
                break
        self._pcache.append((list(ids), kv))
        if len(self._pcache) > self.prefix_cache:
            self._pcache.pop(0)     # evict least-recently-used

    def _init_sharded(self, mesh):
        """Build the DP(×TP) serving path: sharded weights/caches and the
        shard_map'd decode step (parallel/dp.py).

        Works on a single-process multi-device mesh AND on a true
        multi-PROCESS mesh (jax.distributed — the north star's
        "continuous batching across hosts"): host values enter as GLOBAL
        arrays via make_array_from_callback (every process holds the same
        host copy and contributes its addressable shards), caches are
        created ON device by jitted creators with pinned out_shardings
        (no host zeros upload), and per-step token fetches reshard to
        fully-replicated before the D2H so every process can read them.
        All host-side slot/admission decisions are deterministic given
        the fetched tokens, so N processes stay in lock-step."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..models.batched import _insert
        from ..parallel.dp import (_specs, make_batched_decode_sharded,
                                   shard_server_state)
        from ..parallel.multihost import DP_AXIS
        from ..parallel.tp import TP_AXIS, kv_spec, make_tp_forward

        arch = self.arch
        template = self.model.weights
        if self._fuse and TP_AXIS in mesh.axis_names:
            # fuse with the per-shard interleaved lane order so column
            # sharding keeps each shard's q|k|v slices together — one
            # kernel call instead of three on the sharded serving path
            import dataclasses
            from ..models.llama import fuse_layer_weights
            template = dataclasses.replace(
                template, layers=fuse_layer_weights(
                    template.layers, mesh.shape[TP_AXIS]))
        self.weights, _ = shard_server_state(mesh, arch, template, self.B,
                                             quant=self.kv_quant,
                                             with_kv=False)
        _, bkv_spec, has_tp = _specs(mesh, template, quant=self.kv_quant)
        # sharded path: no s_live ladder (the shard_map'd programs are
        # built once; bucketing them would multiply the sharded compile
        # set) — callers pass sl and these wrappers drop it
        self._attn_ladder = []
        _sstep = make_batched_decode_sharded(mesh, arch, template,
                                             quant=self.kv_quant)
        self._step = lambda w, bkv, t, p, a, sl=None: _sstep(w, bkv, t, p, a)
        if self.spec_k:
            from ..parallel.dp import (make_batched_draft_sharded,
                                       make_batched_verify_sharded)
            _sdraft = make_batched_draft_sharded(
                mesh, arch, template, quant=self.kv_quant,
                n_layers=self.spec_draft)
            _sverify = make_batched_verify_sharded(
                mesh, arch, template, quant=self.kv_quant)
            self._draft = lambda w, bkv, t, p, a, sl=None: \
                _sdraft(w, bkv, t, p, a)
            self._verify = lambda w, bkv, t, p, a, sl=None: \
                _sverify(w, bkv, t, p, a)
        vec_sh = NamedSharding(
            mesh, P(DP_AXIS) if DP_AXIS in mesh.axis_names else P(None))
        dp_ax = DP_AXIS if DP_AXIS in mesh.axis_names else None
        vec2_sh = NamedSharding(mesh, P(dp_ax, None))

        def _global(x, sh):
            """Host value (same on every process) → global array."""
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sh,
                                                lambda idx: x[idx])
        self._vec = lambda x: _global(x, vec_sh)
        self._vec2 = lambda x: _global(x, vec2_sh)  # [B, K+1] spec windows
        rep = NamedSharding(mesh, P())
        # fetch: reshard to fully-replicated (an all-gather across dp),
        # then one D2H every process can perform
        self._fetch_rep = jax.jit(lambda x: x, out_shardings=rep)
        self._fetch = lambda x: np.asarray(jax.device_get(
            self._fetch_rep(x)))
        # non-greedy sampler state rides the same mesh: [B, ...] state
        # shards on dp next to the step's logits, per-admission values
        # replicate — this is what makes cross-PROCESS non-greedy serving
        # SPMD-safe (every process runs the same sampling program on the
        # same global arrays)
        self._sampler_kw = dict(shard=lambda x: _global(x, vec_sh),
                                lift=lambda x: _global(x, rep),
                                fetch=self._fetch)
        bkv_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), bkv_spec,
                              is_leaf=lambda x: isinstance(x, P))
        self._make_bkv = jax.jit(
            lambda: BatchedKV.create(arch, self.B, quant=self.kv_quant),
            out_shardings=bkv_sh)
        # slot insert with the batched cache's sharding pinned on the output
        # (a bare jit would let GSPMD re-infer it)
        self._insert = jax.jit(_insert.__wrapped__,
                               donate_argnums=(0,), out_shardings=bkv_sh)

        if has_tp:
            ksp = kv_spec(self.kv_quant)
            kv_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), ksp,
                                 is_leaf=lambda x: isinstance(x, P))
            self._make_kv = jax.jit(
                lambda: KVCache.create(arch, quant=self.kv_quant),
                out_shardings=kv_sh)
            fwd = make_tp_forward(mesh, arch, weights_template=template,
                                  has_n_valid=True, kv_quant=self.kv_quant)

            def _prefill(w, kv, padded, off, n_valid):
                logits, kv, _ = fwd(w, kv, _global(padded, rep),
                                    jnp.int32(off), jnp.int32(n_valid))
                return logits, kv
        else:
            kv_tmpl = jax.eval_shape(
                lambda: KVCache.create(arch, quant=self.kv_quant))
            self._make_kv = jax.jit(
                lambda: KVCache.create(arch, quant=self.kv_quant),
                out_shardings=jax.tree.map(lambda _: rep, kv_tmpl))

            def _prefill(w, kv, padded, off, n_valid):
                logits, kv, _ = forward(arch, w, kv, _global(padded, rep),
                                        off, n_valid=n_valid)
                return logits, kv
        self._prefill = _prefill

    def warmup(self, buckets=None) -> float:
        """Compile every program the serving loop dispatches BEFORE the
        first request: the batched decode step, the slot insert, the
        prefill chunk set (EVERY first-chunk bucket _Admission.step can
        produce — the full _bucket ladder up to admit_chunk — plus the
        steady chunk), and the batched sampler. On this rig a cold
        program costs minutes of remote compile — measured as a 184 s
        ttft p50 in the arrival replay when warmup happened inside the
        serve clock. A production server calls this once at startup;
        run() calls it automatically. Returns the wall seconds spent."""
        t0 = time.perf_counter()
        arch = self.arch
        bkv = self._make_bkv()
        toks = self._vec(np.zeros(self.B, np.int32))
        pos = self._vec(np.zeros(self.B, np.int32))
        act = self._vec(np.zeros(self.B, bool))
        # warm the full-S programs AND every s_live ladder rung — a rung
        # first crossed mid-serve would otherwise be a cold in-clock
        # compile (same reasoning as the prefill bucket ladder below)
        for sl in [None] + self._attn_ladder:
            logits, bkv = self._step(self.weights, bkv, toks, pos, act, sl)
            self._fetch(jnp.argmax(logits, axis=-1))
            if self.spec_k:
                dl, bkv = self._draft(self.weights, bkv, toks, pos, act, sl)
                self._fetch(jnp.argmax(dl, axis=-1))
                vt = self._vec2(np.zeros((self.B, self.spec_k + 1),
                                         np.int32))
                vl, bkv = self._verify(self.weights, bkv, vt, pos, act, sl)
                self._fetch(jnp.argmax(vl, axis=-1))
        if self.spec_k:
            if not self.scfg.greedy:
                # compile the sampled-spec accept round too
                bs0 = BatchedSampler(self.scfg, arch.vocab_size, self.B,
                                     **self._sampler_kw)
                bs0.spec_accept(vl, self._vec2(
                    np.zeros((self.B, self.spec_k), np.int32)), act)
        kv = self._make_kv()
        S, chunk = arch.max_seq_len, self.admit_chunk
        if buckets is None:
            # the admission path buckets a request's FIRST chunk with
            # _bucket(t) for any t <= min(admit_chunk, S): warm the whole
            # reachable ladder, or a 16-token prompt still hits a cold
            # multi-minute compile inside the serve clock
            buckets = [1, min(chunk, S)] + [
                b for b in (8, 16, 32, 64, 128, 256, 512, 1024,
                            2048, 4096) if b <= chunk]
        # exact reachable _Admission.step shapes: first-chunk buckets are
        # capped by S (not dropped — _bucket can exceed S or admit_chunk
        # and still pads only to S), and later chunks run at
        # min(chunk, S - k*chunk), whose tail when S is not a multiple of
        # admit_chunk is otherwise a cold in-clock compile on the first
        # long prompt
        shapes = {min(_bucket(min(b, chunk, S)), S) for b in buckets}
        off = chunk
        while off < S:
            shapes.add(min(chunk, S - off))
            off += chunk
        for p in sorted(shapes):
            padded = np.zeros(p, np.int32)
            lg, kv = self._prefill(self.weights, kv, padded, 0, p)
            self._fetch(lg[0][:1])
        self._insert(bkv, kv, 0)
        if not self.scfg.greedy:
            # warm the sampler with the REAL step/prefill outputs so the
            # compiled programs key on the same shardings run() will feed
            # (host zeros compile a different program on a sharded mesh —
            # the cold in-clock compile warmup exists to prevent)
            bs = BatchedSampler(self.scfg, arch.vocab_size, self.B,
                                **self._sampler_kw)
            bs.admit(0, 0, lg[0])
            bs.sample(logits)
        self._warm = True
        return time.perf_counter() - t0

    @property
    def model_name(self) -> str:
        return self.model.config.model_name

    def snapshot(self) -> dict:
        """Point-in-time serving metrics (ServeStats.report's live twin,
        SURVEY §5.5 observability). Safe to call from any thread while
        the loop runs; zeros before the first run starts."""
        live = getattr(self, "_live", None)
        if live is None:
            return {"running": False, "slots": self.B}
        st = live["stats"]
        end = live["ended"] if live["ended"] is not None \
            else time.perf_counter()
        elapsed = max(end - live["t0"], 1e-9)
        ttft = sorted(st.ttft_s)
        return {
            "running": live["ended"] is None,
            "slots": self.B,
            "slots_active": int(np.count_nonzero(live["active"])),
            "requests": st.requests,
            "tokens": st.tokens,
            "steps": st.steps,
            "prefill_chunks": st.prefill_chunks,
            "elapsed_s": round(elapsed, 3),
            "tokens_per_s": round(st.tokens / elapsed, 2),
            "ttft_p50_ms": (round(ttft[len(ttft) // 2] * 1e3, 1)
                            if ttft else None),
        }

    def _prepare(self, r: Request, rid: int) -> None:
        """Tokenize + clamp a request as it enters the serving loop.
        Pre-filled prompt_ids (e.g. the chat endpoint's templated
        encoding) are honored as-is, clamp included."""
        r.request_id = rid
        if not r.prompt_ids:
            r.prompt_ids = self.tokenizer.encode(
                r.prompt, add_bos=True, parse_special=r.parse_special)
        max_prompt = max(1, self.arch.max_seq_len - 2)
        if len(r.prompt_ids) > max_prompt:
            # clamp: a longer prompt would scatter past the cache end
            r.prompt_ids = r.prompt_ids[-max_prompt:]

    def run(self, requests: list[Request]) -> ServeStats:
        """Serve a fixed list of requests to completion (`arrival_s`
        replays an arrival process); returns aggregate stats."""
        if self._multiproc and any(r.arrival_s > 0 for r in requests):
            # arrival replay gates admission on the LOCAL wall clock; two
            # processes crossing arrival_s on different loop iterations
            # would dispatch mismatched collectives (distributed hang).
            # Cross-process lock-step requires state-driven admission only.
            raise ValueError(
                "arrival_s replay is wall-clock-gated and cannot run on a "
                "multi-process mesh; submit all requests with arrival_s=0")
        stats = ServeStats(requests=len(requests))
        queue = list(requests)
        for i, r in enumerate(queue):
            r.submitted_at = time.time()
            self._prepare(r, i)

        def pull(now: float) -> Request | None:
            for i, r in enumerate(queue):
                if r.arrival_s <= now:
                    return queue.pop(i)
            return None

        def idle_wait(now: float) -> None:
            nxt = min(r.arrival_s for r in queue)
            if nxt > now:
                time.sleep(min(nxt - now, 0.05))

        return self._serve(stats, pull, lambda: not queue, idle_wait)

    def serve_forever(self, inbox, stop) -> ServeStats:
        """Live continuous batching: pull Requests from a thread-safe
        `queue.Queue` until `stop` (a threading.Event) is set AND every
        in-flight sequence has drained. Submitters (e.g. HTTP handler
        threads) put Request objects on `inbox` and wait on
        `Request.on_done` / `Request.on_token`; ALL jax work stays on
        the single thread that calls this. Not reentrant."""
        if self._multiproc:
            # the inbox is process-local: processes would admit different
            # requests on different iterations and desynchronize the SPMD
            # collectives. A cross-process live server needs a replicated
            # request log (every process sees the same admissions in the
            # same order) — use run() with identical request lists instead.
            raise NotImplementedError(
                "serve_forever is single-process; on a jax.distributed "
                "mesh use run() with the same request list on every "
                "process")
        import queue as _queue
        if not getattr(self, "_warm", False):
            self.warmup()  # BEFORE the ttft anchor: warmup is startup cost
        stats = ServeStats()
        counter = iter(range(1 << 62))

        def pull(now: float) -> Request | None:
            try:
                r = inbox.get_nowait()
            except _queue.Empty:
                return None
            if not r.submitted_at:
                r.submitted_at = time.time()
            # ttft is measured from SUBMISSION, not from dequeue: anchor
            # the arrival offset to the SAME instant as the loop's t0
            # (emit computes perf_counter()-t0-arrival_s; a different
            # anchor would understate ttft by the loop-setup gap)
            r.arrival_s = max(0.0, r.submitted_at - self._loop_t0_wall)
            self._prepare(r, next(counter))
            stats.requests += 1
            return r

        def idle_wait(now: float) -> None:
            stop.wait(0.02)

        return self._serve(
            stats, pull,
            lambda: stop.is_set() and inbox.empty(),  # drain late submits
            idle_wait)

    def _serve(self, stats: ServeStats, pull, drained, idle_wait
               ) -> ServeStats:
        """The lock-step serving loop shared by run() / serve_forever().

        pull(now) -> Request|None : next admissible request, if any
        drained() -> bool         : no further requests will ever arrive
        idle_wait(now)            : brief block when idle (nothing active,
                                    nothing admissible, not drained)
        """
        if not getattr(self, "_warm", False):
            self.warmup()
        B = self.B
        bkv = self._make_bkv()
        slot_req: list[Request | None] = [None] * B
        tokens = np.zeros(B, np.int32)
        pos = np.zeros(B, np.int32)
        active = np.zeros(B, bool)
        # non-greedy: per-slot RNG/window state lives ON DEVICE; one jit +
        # one D2H per step for the whole batch (advisor r2: the old
        # per-slot loop paid B×2 host round-trips per step)
        bsampler = (None if self.scfg.greedy
                    else BatchedSampler(self.scfg, self.arch.vocab_size, B,
                                        **self._sampler_kw))
        stop = self.tokenizer.stop_ids
        pending: _Admission | None = None
        t0 = time.perf_counter()
        self._loop_t0_wall = time.time()  # same instant as t0 (ttft anchor)
        # live observability (GET /stats): the loop thread only writes,
        # reader threads only read — snapshot() composes a consistent-
        # enough view without any lock on the hot loop
        self._live = {"stats": stats, "active": active, "t0": t0,
                      "ended": None}

        def emit(r: Request, tid: int):
            if r.first_token_at == 0.0:
                r.first_token_at = time.time()
                stats.ttft_s.append(time.perf_counter() - t0
                                    - r.arrival_s)
            r.output_ids.append(tid)
            stats.tokens += 1
            if r.on_token is not None:
                if r._dec is None:
                    r._dec = self.tokenizer.stream_decoder()
                r.on_token(r._dec.push(tid))

        def free_slot() -> int:
            for b in range(B):
                if not active[b]:
                    return b
            return -1

        def finish_admission(adm: _Admission) -> None:
            """Prefill complete: sample the first token; occupy a slot or
            finish immediately on a stop token."""
            nonlocal bkv
            r = adm.r
            if r.cancelled:
                r.done(self.tokenizer.decode(r.output_ids))
                return
            slot = free_slot()
            if self.scfg.greedy:
                first = int(jnp.argmax(adm.last_logits))
            else:
                first = bsampler.admit(slot, r.request_id, adm.last_logits,
                                       overrides=r.sampling)
            emit(r, first)
            if first in stop or r.max_tokens <= 1:
                # finished at the first token — don't occupy a slot
                r.done(self.tokenizer.decode(r.output_ids))
                return
            bkv = self._insert(bkv, adm.kv, slot)
            self._prefix_store(r.prompt_ids, adm.kv)
            slot_req[slot] = r
            tokens[slot] = first
            pos[slot] = len(r.prompt_ids)
            active[slot] = True

        def retire(slot: int):
            r = slot_req[slot]
            r.done(self.tokenizer.decode(r.output_ids))
            slot_req[slot] = None
            active[slot] = False
            # a retired slot's stale pos would pin the s_live bucket high;
            # inactive slots' outputs are discarded, so 0 is safe
            pos[slot] = 0

        def spec_round():
            """K lock-step drafts through the resident prefix + one verify
            window. Greedy: each slot accepts its longest argmax-matching
            prefix + a correction token — output bit-identical to the
            plain step. Sampled: greedy-draft rejection sampling on device
            (BatchedSampler.spec_accept — exactly unbiased, so the output
            DISTRIBUTION matches spec-off serving)."""
            nonlocal bkv
            K = self.spec_k
            drafts = np.zeros((B, K), np.int32)
            dtok = tokens.copy()
            act = self._vec(active)
            # one bucket for the whole round: the verify window's frozen
            # rows reach pos + K, so cover max(pos) + K + 1
            sl = self._bucket_live(int(pos.max()) + K + 1)
            for j in range(K):
                dl, bkv = self._draft(self.weights, bkv, self._vec(dtok),
                                      self._vec(pos + j), act, sl)
                dtok = self._fetch(jnp.argmax(dl, axis=-1)).astype(np.int32)
                drafts[:, j] = dtok
            stats.draft_steps += K
            vt = np.concatenate([tokens[:, None], drafts], axis=1)
            vlogits, bkv = self._verify(self.weights, bkv, self._vec2(vt),
                                        self._vec(pos), act, sl)
            stats.steps += 1
            if self.scfg.greedy:
                targets = self._fetch(jnp.argmax(vlogits, axis=-1))
                emitted_rows = []
                for b in range(B):
                    n_acc = 0
                    while n_acc < K and targets[b, n_acc] == drafts[b, n_acc]:
                        n_acc += 1
                    emitted_rows.append(
                        (list(drafts[b, :n_acc]) + [int(targets[b, n_acc])],
                         n_acc))
            else:
                toks_acc, n_accs = bsampler.spec_accept(
                    vlogits, self._vec2(drafts), act)
                emitted_rows = [
                    ([int(t) for t in toks_acc[b] if t < self.arch.vocab_size],
                     int(n_accs[b]))
                    for b in range(B)]
            for b in range(B):
                if not active[b]:
                    continue
                r = slot_req[b]
                if r.cancelled:
                    retire(b)
                    continue
                emitted, n_acc = emitted_rows[b]
                stats.spec_drafted += K
                stats.spec_accepted += n_acc
                for t in emitted:
                    nxt = int(t)
                    emit(r, nxt)
                    pos[b] += 1
                    tokens[b] = nxt
                    seq_len = pos[b] + 1
                    if (nxt in stop or len(r.output_ids) >= r.max_tokens
                            or seq_len >= self.arch.max_seq_len):
                        retire(b)
                        break

        while any(active) or pending is not None or not drained():
            # 1) one lock-step decode step for the active batch
            if any(active):
                # spec needs room for the whole verify window in every
                # active slot's cache; near the end, fall back to plain
                # decode steps for the remaining tokens
                if self.spec_k and all(
                        pos[b] + self.spec_k + 1 < self.arch.max_seq_len
                        for b in range(B) if active[b]):
                    spec_round()
                else:
                    logits, bkv = self._step(
                        self.weights, bkv,
                        self._vec(tokens), self._vec(pos), self._vec(active),
                        self._bucket_live(int(pos.max()) + 1))
                    stats.steps += 1
                    if self.scfg.greedy:
                        toks_np = self._fetch(jnp.argmax(logits, axis=-1))
                    else:
                        toks_np = bsampler.sample(logits)  # 1 jit, 1 D2H
                    for b in range(B):
                        if not active[b]:
                            continue
                        r = slot_req[b]
                        if r.cancelled:
                            # client went away: free the slot, don't emit
                            retire(b)
                            continue
                        nxt = int(toks_np[b])
                        emit(r, nxt)
                        pos[b] += 1
                        tokens[b] = nxt
                        seq_len = pos[b] + 1
                        if (nxt in stop or len(r.output_ids) >= r.max_tokens
                                or seq_len >= self.arch.max_seq_len):
                            retire(b)

            # 2) advance admission by AT MOST one prefill chunk (decode
            #    stalls ≤ 1 chunk per step, never a whole prompt)
            if pending is None and free_slot() >= 0:
                r = pull(time.perf_counter() - t0)
                if r is not None:
                    kv0, start = ((None, 0) if not self.prefix_cache
                                  else self._prefix_lookup(r.prompt_ids))
                    if start:
                        stats.prefix_hits += 1
                    pending = _Admission(r, self.arch, self.admit_chunk,
                                         self._make_kv, self._prefill,
                                         kv=kv0, start=start)
            if pending is not None and pending.r.cancelled:
                # cancelled mid-prefill: drop the admission, skip the
                # remaining chunks entirely
                pending.r.done(self.tokenizer.decode(pending.r.output_ids))
                pending = None
            if pending is not None:
                pending.step(self.weights)
                stats.prefill_chunks += 1
                if pending.finished:
                    finish_admission(pending)
                    pending = None
            elif not any(active) and not drained():
                # nothing active and nothing admissible yet: block briefly
                idle_wait(time.perf_counter() - t0)
        stats.wall_s = time.perf_counter() - t0
        self._live["ended"] = time.perf_counter()  # freeze /stats clocks
        return stats
