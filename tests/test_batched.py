"""Batched decode + continuous batching server: results must be identical
to independent single-sequence decoding (greedy)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ntransformer_tpu.inference.engine import Engine, GenerateConfig
from ntransformer_tpu.inference.sampler import SamplerConfig
from ntransformer_tpu.inference.serve import BatchServer, Request
from ntransformer_tpu.models.batched import BatchedKV, batched_decode_step
from ntransformer_tpu.models.llama import KVCache, forward
from ntransformer_tpu.models.loader import load_model
from tools.make_test_gguf import write_model


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny_q8.gguf"
    write_model(str(path), "tiny", "q8_0", seed=8)
    return load_model(str(path))


def test_batched_step_matches_single(model):
    """B=3 sequences with different prompts/positions decode exactly as 3
    independent single-sequence loops."""
    arch, w = model.arch, model.weights
    prompts = [[1, 5, 9], [7, 2], [3, 3, 3, 4]]
    B = len(prompts)

    singles, kvs = [], []
    for ids in prompts:
        kv = KVCache.create(arch)
        logits, kv, _ = forward(arch, w, kv, jnp.asarray(ids, jnp.int32), 0)
        singles.append(int(jnp.argmax(logits[0])))
        kvs.append(kv)

    bkv = BatchedKV.create(arch, B)
    for b, kv in enumerate(kvs):
        bkv = BatchedKV(bkv.k.at[:, b].set(kv.k), bkv.v.at[:, b].set(kv.v))
    tokens = jnp.asarray(singles, jnp.int32)
    pos = jnp.asarray([len(p) for p in prompts], jnp.int32)
    active = jnp.ones(B, bool)

    # 4 lock-step batched decode steps vs 4 per-sequence steps
    b_out = [list(singles)]
    for _ in range(4):
        logits, bkv = batched_decode_step(arch, w, bkv, tokens, pos, active)
        tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        pos = pos + 1
        b_out.append([int(t) for t in tokens])

    for b, ids in enumerate(prompts):
        kv = kvs[b]
        tok = singles[b]
        p = len(ids)
        for step in range(4):
            logits, kv, _ = forward(arch, w, kv,
                                    jnp.asarray([tok], jnp.int32), p + step)
            tok = int(jnp.argmax(logits[0]))
            assert tok == b_out[step + 1][b], (
                f"seq {b} step {step}: batched {b_out[step + 1][b]} != {tok}")


def test_batched_inactive_slot_frozen(model):
    """Inactive slots must not corrupt their KV."""
    arch, w = model.arch, model.weights
    kv = KVCache.create(arch)
    logits, kv, _ = forward(arch, w, kv, jnp.asarray([1, 5], jnp.int32), 0)
    first = int(jnp.argmax(logits[0]))

    bkv = BatchedKV.create(arch, 2)
    bkv = BatchedKV(bkv.k.at[:, 0].set(kv.k), bkv.v.at[:, 0].set(kv.v))
    k_before = np.asarray(bkv.k[:, 1])
    tokens = jnp.asarray([first, 0], jnp.int32)
    pos = jnp.asarray([2, 0], jnp.int32)
    active = jnp.asarray([True, False])
    _, bkv = batched_decode_step(arch, w, bkv, tokens, pos, active)
    np.testing.assert_array_equal(np.asarray(bkv.k[:, 1]), k_before)


def test_batched_int8_kv_close_to_bf16(model):
    """int8 batched KV tracks the bf16 path within the documented ~0.3%
    logit error (r1 verdict item 7: int8 KV on the serve path)."""
    arch, w = model.arch, model.weights
    prompts = [[1, 5, 9], [7, 2]]
    B = len(prompts)
    bkv = BatchedKV.create(arch, B)
    qkv = BatchedKV.create(arch, B, quant=True)
    assert qkv.quantized and not bkv.quantized
    firsts = []
    for b, ids in enumerate(prompts):
        kv = KVCache.create(arch)
        logits, kv, _ = forward(arch, w, kv, jnp.asarray(ids, jnp.int32), 0)
        firsts.append(int(jnp.argmax(logits[0])))
        bkv = bkv.insert(b, kv)
        kvq = KVCache.create(arch, quant=True)
        _, kvq, _ = forward(arch, w, kvq, jnp.asarray(ids, jnp.int32), 0)
        qkv = qkv.insert(b, kvq)
    tokens = jnp.asarray(firsts, jnp.int32)
    pos = jnp.asarray([len(p) for p in prompts], jnp.int32)
    active = jnp.ones(B, bool)
    for _ in range(3):
        lf, bkv = batched_decode_step(arch, w, bkv, tokens, pos, active)
        lq, qkv = batched_decode_step(arch, w, qkv, tokens, pos, active)
        rel = float(jnp.max(jnp.abs(lf - lq)) / (jnp.max(jnp.abs(lf)) + 1e-9))
        assert rel < 0.02, rel
        tokens = jnp.argmax(lf, axis=-1).astype(jnp.int32)
        pos = pos + 1


def test_batch_server_int8_kv(model):
    """The server runs end-to-end with --kv-int8 semantics and produces
    the same greedy text on this tiny model."""
    srv = BatchServer(model, batch_size=2, kv_quant=True,
                      sampler_cfg=SamplerConfig(temperature=0.0))
    reqs = [Request(prompt="alpha beta", max_tokens=5),
            Request(prompt="gamma", max_tokens=5)]
    stats = srv.run(reqs)
    assert stats.requests == 2
    for r in reqs:
        assert r.finished_at > 0 and len(r.output_ids) >= 1


def test_batch_server_matches_engine(model):
    """Continuous batching with B=2 over 4 requests reproduces per-request
    greedy generations bit-for-bit."""
    eng = Engine(model)
    cfg = GenerateConfig(max_tokens=6, temperature=0.0, repeat_penalty=1.0)
    prompts = ["alpha beta", "gamma", "delta epsilon zeta", "eta"]
    expected = [eng.generate(p, cfg)[0] for p in prompts]

    srv = BatchServer(model, batch_size=2,
                      sampler_cfg=SamplerConfig(temperature=0.0))
    reqs = [Request(prompt=p, max_tokens=6) for p in prompts]
    stats = srv.run(reqs)
    assert stats.requests == 4
    for r, want in zip(reqs, expected):
        assert r.text == want, f"{r.prompt!r}: {r.text!r} != {want!r}"
    assert stats.tokens >= 4 * 2
    assert stats.steps > 0


def test_server_first_token_eos_frees_slot(model, monkeypatch):
    """A request whose first sampled token is EOS completes immediately
    without occupying a batch slot (code-review fix)."""
    from ntransformer_tpu.inference import serve as serve_mod
    srv = BatchServer(model, batch_size=2,
                      sampler_cfg=SamplerConfig(temperature=0.0))
    eos = model.tokenizer.eos_id
    real_forward = serve_mod.forward

    def fake_forward(arch, w, kv, tokens, pos, **kw):
        logits, kv, cos = real_forward(arch, w, kv, tokens, pos, **kw)
        # force argmax -> EOS for the 2-token prompt ("x" + BOS)
        if kw.get("n_valid") == 2:
            logits = logits.at[:, eos].set(1e9)
        return logits, kv, cos

    monkeypatch.setattr(serve_mod, "forward", fake_forward)
    reqs = [Request(prompt="x", max_tokens=5),       # 2 ids -> EOS first
            Request(prompt="alpha beta", max_tokens=5)]
    stats = srv.run(reqs)
    assert reqs[0].output_ids == [eos]
    assert reqs[0].finished_at > 0
    assert len(reqs[1].output_ids) > 1
    assert stats.requests == 2


def test_server_chunked_admission_matches_and_streams(model):
    """Chunked admission (admit_chunk smaller than the prompt) produces the
    same greedy text as a single-stream engine using the SAME chunk width,
    and per-token streaming callbacks fire for every output token (r1
    verdict item 4). Prefill numerics are chunk-width-dependent (the
    attention reduction order over already-written keys differs between a
    32-wide one-shot and 2-wide chunks — ±1 bf16 ulp in the KV rows), so
    cross-width greedy equality is not a stable property; same-width
    equality is the meaningful admission-correctness claim."""
    eng = Engine(model)
    eng.PREFILL_CHUNK = 2  # match the server's admit_chunk below
    cfg = GenerateConfig(max_tokens=6, temperature=0.0, repeat_penalty=1.0)
    prompts = ["alpha beta gamma delta", "epsilon zeta"]
    expected = [eng.generate(p, cfg)[0] for p in prompts]

    pieces = {0: [], 1: []}
    srv = BatchServer(model, batch_size=2, admit_chunk=2,
                      sampler_cfg=SamplerConfig(temperature=0.0))
    reqs = [Request(prompt=p, max_tokens=6,
                    on_token=lambda s, i=i: pieces[i].append(s))
            for i, p in enumerate(prompts)]
    stats = srv.run(reqs)
    for i, (r, want) in enumerate(zip(reqs, expected)):
        assert r.text == want, f"{r.prompt!r}: {r.text!r} != {want!r}"
        assert len(pieces[i]) == len(r.output_ids)
    # multi-chunk prefill actually happened
    assert stats.prefill_chunks > len(prompts)
    assert stats.ttft_s and all(t >= 0 for t in stats.ttft_s)


def test_server_arrival_times(model):
    """Requests with arrival offsets are admitted no earlier than their
    arrival; the server idles until work exists."""
    srv = BatchServer(model, batch_size=2,
                      sampler_cfg=SamplerConfig(temperature=0.0))
    reqs = [Request(prompt="alpha", max_tokens=3, arrival_s=0.0),
            Request(prompt="beta", max_tokens=3, arrival_s=0.3)]
    stats = srv.run(reqs)
    assert all(r.finished_at > 0 for r in reqs)
    assert stats.wall_s >= 0.3  # waited for the late arrival
    assert reqs[1].first_token_at >= reqs[0].first_token_at


def test_server_prompt_specials_not_parsed(model):
    """An untrusted prompt containing a special-token string must encode it
    as plain text by default — no control-id smuggling at the serve
    boundary (advisor finding r2). parse_special=True opts back in for
    trusted chat-template text."""
    tok = model.tokenizer
    smuggle = tok.encode("hi </s> there", add_bos=False, parse_special=False)
    assert tok.eos_id not in smuggle
    trusted = tok.encode("hi </s> there", add_bos=False, parse_special=True)
    assert tok.eos_id in trusted

    srv = BatchServer(model, batch_size=2,
                      sampler_cfg=SamplerConfig(temperature=0.0))
    reqs = [Request(prompt="hi </s> there", max_tokens=2)]
    srv.run(reqs)
    assert model.tokenizer.eos_id not in reqs[0].prompt_ids


def test_warmup_covers_every_admission_shape(model):
    """Every padded prefill shape _Admission.step can produce must be
    compiled by warmup() — including the TAIL chunk when max_seq_len is
    not a multiple of admit_chunk (review finding r3: a 600-ctx server
    with 512-chunks hit a cold in-clock compile at shape 88)."""
    # chunk=300 on ctx 512: a >300-token prompt's second chunk runs at
    # min(300, 512-300) = 212 — a shape in neither the bucket ladder nor
    # {admit_chunk}
    srv = BatchServer(model, batch_size=2, admit_chunk=300,
                      sampler_cfg=SamplerConfig(temperature=0.0))
    seen: list[int] = []
    inner = srv._prefill
    srv._prefill = (lambda w, kv, padded, off, n:
                    (seen.append(len(padded)) or inner(w, kv, padded, off, n)))
    srv.warmup()
    warmed = set(seen)
    seen.clear()
    # a prompt long enough to reach the tail zone of the context window
    long_prompt = " ".join(["tok"] * 600)  # clamps to max_seq_len - 2
    srv.run([Request(prompt=long_prompt, max_tokens=1)])
    assert seen, "expected chunked admission prefills"
    assert set(seen) <= warmed, \
        f"admission shapes {sorted(set(seen) - warmed)} were never warmed"
    # the tail shape (S - chunk) must genuinely occur in this run
    assert (model.arch.max_seq_len - 300) in seen


def test_multiprocess_guards(model, monkeypatch):
    """Wall-clock arrival replay and the process-local live inbox cannot
    run SPMD across processes (admission would desynchronize collectives);
    both refuse loudly instead of hanging."""
    import queue
    import threading

    import ntransformer_tpu.inference.serve as serve_mod
    monkeypatch.setattr(serve_mod.jax, "process_count", lambda: 2)
    srv = BatchServer(model, batch_size=2,
                      sampler_cfg=SamplerConfig(temperature=0.0))
    with pytest.raises(ValueError, match="arrival_s"):
        srv.run([Request(prompt="a", max_tokens=1, arrival_s=0.5)])
    with pytest.raises(NotImplementedError, match="single-process"):
        srv.serve_forever(queue.Queue(), threading.Event())


def test_prefix_cache_reuse_matches_uncached(model):
    """--prefix-cache: a request sharing a long prompt prefix with an
    earlier one prefills only the delta — outputs bit-match an uncached
    server, prefix_hits counts, and fewer prefill chunks run."""
    shared = list(range(5, 45))                    # 40-token system prompt
    p1 = shared + [60, 61, 62]
    p2 = shared + [70, 71]
    p3 = shared[:10] + [90, 91]                    # diverges early (<8 after
    #                                                min-prefix rule: 10 ≥ 8)
    reqs = lambda: [Request(prompt="", max_tokens=5, prompt_ids=list(p))
                    for p in (p1, p2, p3)]

    # small admit chunk so the delta saving shows up in the CHUNK count
    # (40-token prefixes are one 512-chunk either way)
    plain = BatchServer(model, batch_size=2, admit_chunk=16,
                        sampler_cfg=SamplerConfig(temperature=0.0))
    r_plain = reqs()
    s_plain = plain.run(r_plain)
    assert s_plain.prefix_hits == 0

    cached = BatchServer(model, batch_size=2, prefix_cache=2,
                         admit_chunk=16,
                         sampler_cfg=SamplerConfig(temperature=0.0))
    r_cached = reqs()
    s_cached = cached.run(r_cached)
    for a, b in zip(r_plain, r_cached):
        assert a.text == b.text
    assert s_cached.prefix_hits >= 2          # p2 (40 shared) + p3 (10)
    assert s_cached.prefill_chunks < s_plain.prefill_chunks


def test_prefix_cache_lru_eviction(model):
    """Capacity 1: distinct prompts displace each other; an identical
    prompt replaces its own entry instead of duplicating."""
    srv = BatchServer(model, batch_size=2, prefix_cache=1,
                      sampler_cfg=SamplerConfig(temperature=0.0))
    mk = lambda ids: Request(prompt="", max_tokens=3, prompt_ids=list(ids))
    srv.run([mk(range(5, 30))])
    assert len(srv._pcache) == 1
    srv.run([mk(range(100, 130))])
    assert len(srv._pcache) == 1
    assert list(srv._pcache[0][0]) == list(range(100, 130))
    srv.run([mk(range(100, 130))])             # identical: replace, not grow
    assert len(srv._pcache) == 1


# --- speculative serving ------------------------------------------------------

def test_verify_step_matches_sequential_decode(model):
    """batched_verify_step over a T-token window produces the same logits
    as T sequential batched decode steps (write-then-attend semantics)."""
    from ntransformer_tpu.models.batched import batched_verify_step
    arch, w = model.arch, model.weights
    B, T = 2, 3
    prompts = [[1, 5, 9], [7, 2]]
    bkv = BatchedKV.create(arch, B)
    for b, ids in enumerate(prompts):
        kv = KVCache.create(arch)
        _, kv, _ = forward(arch, w, kv, jnp.asarray(ids, jnp.int32), 0)
        bkv = bkv.insert(b, kv)
    pos = np.array([len(p) for p in prompts], np.int32)
    active = np.ones(B, bool)
    window = np.array([[4, 8, 15], [16, 23, 42]], np.int32)

    # sequential: T decode steps, collect logits
    seq_logits = []
    sb = jax.tree.map(lambda a: a.copy(), bkv)
    for j in range(T):
        lg, sb = batched_decode_step(
            arch, w, sb, jnp.asarray(window[:, j]),
            jnp.asarray(pos + j), jnp.asarray(active))
        seq_logits.append(np.asarray(lg))

    vlg, vb = batched_verify_step(arch, w, bkv, jnp.asarray(window),
                                  jnp.asarray(pos), jnp.asarray(active))
    vlg = np.asarray(vlg)
    for j in range(T):
        np.testing.assert_allclose(vlg[:, j], seq_logits[j],
                                   rtol=2e-4, atol=2e-4)
    # caches end identical too
    np.testing.assert_allclose(np.asarray(vb.k), np.asarray(sb.k),
                               rtol=2e-2, atol=2e-2)


def _serve_outputs(model, prompts, **kw):
    srv = BatchServer(model, batch_size=2,
                      sampler_cfg=SamplerConfig(temperature=0.0), **kw)
    reqs = [Request(prompt=p, max_tokens=8) for p in prompts]
    stats = srv.run(reqs)
    return [list(r.output_ids) for r in reqs], stats


def test_spec_serve_matches_plain_greedy(model):
    """Speculative serving (resident-prefix draft + batched verify) emits
    BIT-IDENTICAL greedy outputs to the plain server — the accept rule
    preserves argmax regardless of acceptance rate."""
    prompts = ["alpha beta", "gamma", "delta epsilon zeta", "eta"]
    want, base_stats = _serve_outputs(model, prompts)
    got, stats = _serve_outputs(model, prompts, spec_k=2,
                                spec_draft_layers=2)
    assert got == want
    assert stats.spec_drafted > 0
    assert stats.draft_steps > 0


def test_spec_serve_full_draft_accepts_everything(model):
    """With draft == full model every draft token verifies: acceptance is
    100% and full-model steps per token drop by ~(K+1)x vs plain."""
    prompts = ["alpha beta", "gamma", "delta epsilon zeta", "eta"]
    L = model.arch.n_layers
    want, base = _serve_outputs(model, prompts)
    got, stats = _serve_outputs(model, prompts, spec_k=2,
                                spec_draft_layers=L)
    assert got == want
    assert stats.spec_accepted == stats.spec_drafted > 0
    assert stats.steps < base.steps  # fewer full-model dispatches
    assert stats.steps * 3 <= base.steps + 3 * len(prompts)


def test_spec_serve_int8_kv(model):
    """Speculation composes with the int8 KV cache (quantized verify
    window writes) and still matches the int8 plain server."""
    prompts = ["alpha beta", "gamma"]
    want, _ = _serve_outputs(model, prompts, kv_quant=True)
    got, stats = _serve_outputs(model, prompts, kv_quant=True, spec_k=2,
                                spec_draft_layers=2)
    assert got == want
    assert stats.spec_drafted > 0


def test_spec_serve_refusals(model):
    """Unsupported spec combinations refuse loudly at construction."""
    with pytest.raises(ValueError, match="spec_draft_layers"):
        BatchServer(model, spec_k=2, spec_draft_layers=0,
                    sampler_cfg=SamplerConfig(temperature=0.0))


def test_spec_accept_greedy_matches_prefix_rule():
    """BatchedSampler.spec_accept with temp<=0 slots reproduces the greedy
    longest-argmax-prefix + correction rule exactly."""
    import jax.numpy as jnp
    from ntransformer_tpu.inference.sampler import BatchedSampler
    rng = np.random.default_rng(0)
    B, K, V = 3, 3, 64
    vlogits = rng.standard_normal((B, K + 1, V)).astype(np.float32)
    targets = vlogits.argmax(-1)                       # [B, K+1]
    drafts = targets[:, :K].copy()
    drafts[0, 1] = (targets[0, 1] + 1) % V             # reject at j=1
    drafts[2, 0] = (targets[2, 0] + 1) % V             # reject at j=0
    bs = BatchedSampler(SamplerConfig(temperature=0.0, repeat_penalty=1.0),
                        V, B)
    toks, n_acc = bs.spec_accept(jnp.asarray(vlogits), jnp.asarray(drafts),
                                 jnp.ones(B, bool))
    assert list(n_acc) == [1, K, 0]
    # row 0: draft0 accepted, correction = target argmax at j=1
    assert list(toks[0][:2]) == [targets[0, 0], targets[0, 1]]
    assert toks[0][2] == V  # sentinel
    # row 1: all accepted + bonus
    assert list(toks[1]) == list(targets[1])
    # row 2: immediate correction
    assert toks[2][0] == targets[2, 0] and toks[2][1] == V


def test_spec_accept_sampled_unbiased():
    """Greedy-draft rejection sampling is exactly unbiased: over many
    independent slots, the FIRST emitted token's empirical distribution
    matches direct sampling from the target distribution."""
    import jax
    import jax.numpy as jnp
    from ntransformer_tpu.inference.sampler import BatchedSampler
    rng = np.random.default_rng(1)
    B, V = 512, 16
    cfg = SamplerConfig(temperature=1.0, top_k=V, top_p=1.0,
                        repeat_penalty=1.0, seed=7)
    logits_row = (rng.standard_normal(V) * 1.5).astype(np.float32)
    p = np.exp(logits_row - logits_row.max())
    p /= p.sum()
    d = int(np.argmax(logits_row))  # greedy draft token
    vlogits = np.broadcast_to(logits_row, (B, 2, V)).copy()
    drafts = np.full((B, 1), d, np.int32)
    bs = BatchedSampler(cfg, V, B)
    toks, n_acc = bs.spec_accept(jnp.asarray(vlogits), jnp.asarray(drafts),
                                 jnp.ones(B, bool))
    first = toks[:, 0]
    freq = np.bincount(first, minlength=V)[:V] / B
    # acceptance rate of the draft token must be ~p[d]; every token's
    # frequency within 4 sigma of its true probability
    sigma = np.sqrt(p * (1 - p) / B)
    assert (np.abs(freq - p) < 4 * sigma + 0.01).all(), (freq, p)
    assert 0 < n_acc.sum() < B  # some accepted, some rejected


def test_spec_serve_sampled_runs_and_is_deterministic(model):
    """Sampled speculative serving (temperature > 0) completes, reports
    sane acceptance, and is seed-deterministic across runs."""
    prompts = ["alpha beta", "gamma", "delta epsilon"]

    def run():
        srv = BatchServer(model, batch_size=2, spec_k=2,
                          spec_draft_layers=2,
                          sampler_cfg=SamplerConfig(temperature=0.9,
                                                    seed=13))
        reqs = [Request(prompt=p, max_tokens=8) for p in prompts]
        stats = srv.run(reqs)
        return [list(r.output_ids) for r in reqs], stats

    got1, stats1 = run()
    got2, stats2 = run()
    assert got1 == got2
    assert stats1.spec_drafted > 0
    assert 0 <= stats1.spec_accepted <= stats1.spec_drafted
    assert all(len(o) == 8 or (len(o) > 0) for o in got1)


def test_spec_serve_kernel_impl_matches_jnp(model, monkeypatch):
    """The KERNEL spec round (deferred decode + kernel verify window with
    causal virtual rows + bulk T-row append) emits the same greedy outputs
    as the jnp round through the full server loop (interpret mode on CPU
    — the same code path the TPU compiles)."""
    prompts = ["alpha beta", "gamma", "delta epsilon"]
    monkeypatch.setenv("NT_BATCHED_FLASH", "off")
    want, _ = _serve_outputs(model, prompts, spec_k=2, spec_draft_layers=2)
    monkeypatch.setenv("NT_BATCHED_FLASH", "on")
    got, stats = _serve_outputs(model, prompts, spec_k=2,
                                spec_draft_layers=2)
    assert got == want
    assert stats.spec_drafted > 0
