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
