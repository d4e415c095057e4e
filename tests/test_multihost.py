"""Multi-process (multi-"host") validation: jax.distributed across two
processes, 8-way TP forward with cross-process collectives — the N≥2-hosts
path of the north star, runnable without hardware (gloo CPU collectives).
The single-GPU reference has no analogue."""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))

WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                               num_processes=2, process_id=pid)
    import jax.numpy as jnp, numpy as np
    assert jax.device_count() == 8 and jax.local_device_count() == 4
    from ntransformer_tpu.models.synth import synth_model
    from ntransformer_tpu.models.llama import KVCache
    from ntransformer_tpu.parallel.tp import TP_AXIS, make_tp_forward, shard_model
    from tools.make_test_gguf import PRESETS
    from jax.sharding import Mesh
    PRESETS.setdefault("mh", dict(vocab=512, hidden=512, inter=1024, layers=2,
                                  heads=8, kv_heads=8, ctx=128,
                                  rope_theta=1e4))
    cfg, arch, weights = synth_model("mh", "q8_0", max_seq_len=128)
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), (TP_AXIS,))
    w_sh, kv_sh = shard_model(weights, KVCache.create(arch), mesh, arch)
    fwd = make_tp_forward(mesh, arch, weights_template=weights)
    logits, kv_sh, _ = fwd(w_sh, kv_sh, jnp.asarray([1, 2, 3], jnp.int32),
                           jnp.int32(0))
    lg = np.asarray(jax.device_get(logits))
    assert lg.shape == (1, 512) and np.isfinite(lg).all()
    # decode step chained on the cross-process cache
    logits, kv_sh, _ = fwd(w_sh, kv_sh, jnp.asarray([7], jnp.int32),
                           jnp.int32(3))
    assert np.isfinite(np.asarray(jax.device_get(logits))).all()
    print("MH-OK", pid, flush=True)
""").format(repo=REPO)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.mark.timeout(300)
def test_two_process_tp():
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, "-c", WORKER, str(i), port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-1200:]}"
        assert f"MH-OK {i}" in out


SERVE_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    pid = int(sys.argv[1]); port = sys.argv[2]; gguf = sys.argv[3]
    temp = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                               num_processes=2, process_id=pid)
    assert jax.device_count() == 8 and jax.process_count() == 2
    from ntransformer_tpu.inference.sampler import SamplerConfig
    from ntransformer_tpu.inference.serve import BatchServer, Request
    from ntransformer_tpu.models.loader import load_model
    from ntransformer_tpu.parallel.multihost import make_mesh
    model = load_model(gguf, device=False)
    mesh = make_mesh(tp=2, dp=4)   # dp crosses the two processes
    srv = BatchServer(model, batch_size=4, mesh=mesh,
                      sampler_cfg=SamplerConfig(temperature=temp))
    reqs = [Request(prompt=p, max_tokens=5)
            for p in ["alpha beta", "gamma", "delta epsilon", "zeta"]]
    stats = srv.run(reqs)
    assert stats.requests == 4 and stats.steps > 0
    for r in reqs:
        print("SRV-TEXT %d %d %r" % (pid, r.request_id, r.text), flush=True)
    print("SRV-OK", pid, flush=True)
""").format(repo=REPO)


def _run_two_process_server(temperature: float):
    """Shared harness: single-process sharded reference vs two workers
    over a dp=4 x tp=2 mesh whose dp axis crosses the process boundary."""
    from ntransformer_tpu.inference.sampler import SamplerConfig
    from ntransformer_tpu.inference.serve import BatchServer, Request
    from ntransformer_tpu.models.loader import load_model
    from ntransformer_tpu.parallel.multihost import make_mesh
    from tools.make_test_gguf import write_model
    import tempfile
    gguf = tempfile.mkdtemp() + "/mh_srv.gguf"
    write_model(gguf, "tiny", "q8_0", seed=77)

    # single-process sharded reference on the same prompts
    ref_model = load_model(gguf, device=False)
    srv = BatchServer(ref_model, batch_size=4, mesh=make_mesh(tp=2, dp=4),
                      sampler_cfg=SamplerConfig(temperature=temperature))
    ref_reqs = [Request(prompt=p, max_tokens=5)
                for p in ["alpha beta", "gamma", "delta epsilon", "zeta"]]
    srv.run(ref_reqs)
    want = {r.request_id: r.text for r in ref_reqs}

    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, "-c", SERVE_WORKER, str(i), port, gguf,
         str(temperature)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"SRV-OK {i}" in out
        for rid, text in want.items():
            assert f"SRV-TEXT {i} {rid} {text!r}" in out, \
                f"proc {i} text mismatch for request {rid}:\n{out[-2000:]}"


@pytest.mark.timeout(300)
def test_two_process_batch_server():
    """Continuous batching across two OS PROCESSES (the north star
    phrase, literally): the same BatchServer loop runs SPMD in both
    processes — host values enter as global arrays, sampled tokens come
    back through a replicate-then-fetch, and both processes must emit
    identical completions that match the single-process sharded server."""
    _run_two_process_server(0.0)


@pytest.mark.timeout(300)
def test_two_process_batch_server_sampled():
    """NON-greedy cross-process serving: the BatchedSampler's per-slot
    RNG/window state lives as dp-sharded GLOBAL arrays on the mesh, so
    the sampling program itself is SPMD — both processes draw identical
    tokens (deterministic request-id-keyed streams), matching the
    single-process sharded server bit for bit."""
    _run_two_process_server(0.7)


def test_make_mesh_subset_refused_multiprocess(monkeypatch):
    """A leading-subset mesh (dp*tp < n) can exclude every device of some
    process on a jax.distributed rig — that process would drive a mesh it
    is not in (hang / 'not addressable'). Multi-process meshes must cover
    the full device set; single-process subsets stay allowed."""
    import jax
    import pytest
    from ntransformer_tpu.parallel import multihost

    n = len(jax.devices("cpu"))
    assert n >= 4
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="multi-process"):
        multihost.make_mesh(tp=1, dp=n // 2)
    monkeypatch.setattr(jax, "process_count", lambda: 1)
    mesh = multihost.make_mesh(tp=1, dp=n // 2)  # subset OK single-process
    assert mesh.devices.size == n // 2
