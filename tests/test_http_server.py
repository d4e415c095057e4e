"""Live serving: BatchServer.serve_forever + the stdlib HTTP front-end.

The reference's serving surface is a CLI binary; this layer makes the
continuous-batching loop a network service. Tests drive real HTTP over a
loopback socket against the tiny model: concurrent non-stream requests,
SSE streaming, health, and clean drain-on-stop — and assert the greedy
outputs are IDENTICAL to BatchServer.run (same loop, same programs).
"""
import json
import queue
import threading
import urllib.request

import pytest

from tools.make_test_gguf import write_model
from ntransformer_tpu.models.loader import load_model
from ntransformer_tpu.inference.serve import BatchServer, Request
from ntransformer_tpu.inference.sampler import SamplerConfig
from ntransformer_tpu.inference.http_server import HttpFrontend

PROMPTS = ["alpha beta", "gamma delta", "epsilon"]


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "http_q8.gguf"
    write_model(str(path), "tiny", "q8_0", seed=33)
    return load_model(str(path))


@pytest.fixture(scope="module")
def expected(model):
    srv = BatchServer(model, batch_size=2,
                      sampler_cfg=SamplerConfig(temperature=0.0))
    reqs = [Request(prompt=p, max_tokens=6) for p in PROMPTS]
    srv.run(reqs)
    return {p: r.text for p, r in zip(PROMPTS, reqs)}


@pytest.fixture()
def frontend(model):
    srv = BatchServer(model, batch_size=2,
                      sampler_cfg=SamplerConfig(temperature=0.0))
    fe = HttpFrontend(srv, port=0, request_timeout_s=120.0)
    fe.start()
    yield fe
    fe.stop()


def _post(port, body, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/completions",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, resp.read()


def test_health(frontend):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{frontend.port}/health", timeout=30) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["slots"] == 2


def test_concurrent_completions_match_run(frontend, expected):
    """3 clients against 2 slots: continuous batching over HTTP must
    reproduce the batch loop's greedy outputs exactly."""
    results = {}

    def client(p):
        status, raw = _post(frontend.port, {"prompt": p, "max_tokens": 6})
        assert status == 200
        results[p] = json.loads(raw)

    threads = [threading.Thread(target=client, args=(p,)) for p in PROMPTS]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
        assert not t.is_alive(), "HTTP client thread hung"
    for p in PROMPTS:
        body = results[p]
        assert body["choices"][0]["text"] == expected[p], p
        assert body["usage"]["completion_tokens"] == 6
        assert body["usage"]["prompt_tokens"] > 0


def test_streaming_sse(frontend, expected):
    """stream=true: SSE pieces concatenate to the non-stream text."""
    req = urllib.request.Request(
        f"http://127.0.0.1:{frontend.port}/v1/completions",
        data=json.dumps({"prompt": PROMPTS[0], "max_tokens": 6,
                         "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    pieces, done = [], False
    with urllib.request.urlopen(req, timeout=120) as resp:
        assert resp.headers["Content-Type"] == "text/event-stream"
        for line in resp:
            line = line.strip()
            if not line.startswith(b"data: "):
                continue
            payload = line[len(b"data: "):]
            if payload == b"[DONE]":
                done = True
                break
            pieces.append(json.loads(payload)["text"])
    assert done
    assert "".join(pieces) == expected[PROMPTS[0]]


def test_bad_requests(frontend):
    # non-dict JSON and non-int max_tokens must 400, not crash the handler
    for body in ({}, {"prompt": 7}, [1, 2], "x", 3,
                 {"prompt": "hi", "max_tokens": "abc"}):
        req = urllib.request.Request(
            f"http://127.0.0.1:{frontend.port}/v1/completions",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400


def test_stop_drains_in_flight(model, expected):
    """stop() after submit: the in-flight request still completes (the
    live loop drains before exiting)."""
    srv = BatchServer(model, batch_size=2,
                      sampler_cfg=SamplerConfig(temperature=0.0))
    inbox: queue.Queue = queue.Queue()
    stop = threading.Event()
    done = threading.Event()
    r = Request(prompt=PROMPTS[0], max_tokens=6,
                on_done=lambda _r: done.set())
    inbox.put(r)
    t = threading.Thread(target=srv.serve_forever, args=(inbox, stop))
    t.start()
    stop.set()  # set IMMEDIATELY — inbox still holds the request
    t.join(timeout=120)
    assert not t.is_alive()
    assert done.is_set()
    assert r.text == expected[PROMPTS[0]]


def test_cancelled_request_frees_slot(model):
    """Setting Request.cancelled mid-decode retires the slot at the next
    step boundary (a disconnected client stops consuming batch capacity),
    and a queued request then takes the freed slot."""
    srv = BatchServer(model, batch_size=1,
                      sampler_cfg=SamplerConfig(temperature=0.0))
    big = Request(prompt=PROMPTS[0], max_tokens=400)
    seen = []

    def on_tok(piece):
        seen.append(piece)
        if len(seen) == 3:
            big.cancelled = True
    big.on_token = on_tok
    follow = Request(prompt=PROMPTS[1], max_tokens=4)
    stats = srv.run([big, follow])
    assert big.finished_at > 0 and follow.finished_at > 0
    assert 3 <= len(big.output_ids) <= 4  # retired right after the flag
    assert len(follow.output_ids) == 4    # reused the single slot
    assert stats.tokens < 30


def test_cancelled_during_admission_drops_prefill(model):
    """A request cancelled while still prefilling never takes a slot and
    its remaining chunks are skipped."""
    srv = BatchServer(model, batch_size=1, admit_chunk=2,
                      sampler_cfg=SamplerConfig(temperature=0.0))
    r = Request(prompt=" ".join(["tok"] * 40), max_tokens=8)
    r.cancelled = True  # cancelled before the server ever runs it
    stats = srv.run([r])
    assert r.finished_at > 0
    assert r.output_ids == []
    assert stats.prefill_chunks <= 1


def test_stats_endpoint(frontend):
    """GET /stats: live serving metrics (ServeStats' running twin)."""
    # before any request the loop may not have started its first run
    with urllib.request.urlopen(
            f"http://127.0.0.1:{frontend.port}/stats", timeout=30) as resp:
        base = json.loads(resp.read())
    assert base["slots"] == 2
    _post(frontend.port, {"prompt": PROMPTS[0], "max_tokens": 4})
    with urllib.request.urlopen(
            f"http://127.0.0.1:{frontend.port}/stats", timeout=30) as resp:
        after = json.loads(resp.read())
    assert after["running"] is True
    assert after["requests"] >= 1
    assert after["tokens"] >= 4
    assert after["ttft_p50_ms"] is not None


def test_snapshot_freezes_after_run(model):
    """snapshot() reports running=False with frozen clocks once the
    serving loop exits (review finding: /stats kept 'running' forever)."""
    import time
    srv = BatchServer(model, batch_size=2,
                      sampler_cfg=SamplerConfig(temperature=0.0))
    srv.run([Request(prompt=PROMPTS[0], max_tokens=3)])
    snap1 = srv.snapshot()
    assert snap1["running"] is False
    time.sleep(0.1)
    assert srv.snapshot()["elapsed_s"] == snap1["elapsed_s"]
    assert snap1["tokens"] >= 3


def test_per_request_sampling_over_http(model):
    """A non-greedy server honors per-request sampling: a top_k=1 request
    reproduces the greedy text while a hot-temperature request runs on the
    same batch."""
    from ntransformer_tpu.inference.http_server import HttpFrontend
    greedy_srv = BatchServer(model, batch_size=2,
                             sampler_cfg=SamplerConfig(temperature=0.0))
    want = Request(prompt=PROMPTS[0], max_tokens=6)
    greedy_srv.run([want])

    srv = BatchServer(model, batch_size=2,
                      sampler_cfg=SamplerConfig(temperature=0.9, top_k=40,
                                                repeat_penalty=1.0))
    fe = HttpFrontend(srv, port=0, request_timeout_s=120.0)
    fe.start()
    try:
        results = {}

        def client(name, body):
            status, raw = _post(fe.port, body)
            assert status == 200
            results[name] = json.loads(raw)["choices"][0]["text"]

        t1 = threading.Thread(target=client, args=("det", {
            "prompt": PROMPTS[0], "max_tokens": 6, "top_k": 1}))
        t2 = threading.Thread(target=client, args=("hot", {
            "prompt": PROMPTS[1], "max_tokens": 6, "temperature": 4.0}))
        t1.start(); t2.start(); t1.join(120); t2.join(120)
        assert results["det"] == want.text  # top_k=1 ≡ greedy
        assert "hot" in results
    finally:
        fe.stop()
