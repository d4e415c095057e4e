"""DP and DP×TP sharded batched decode vs the unsharded step (8-device
CPU mesh) — the multi-chip serving path must be bit-faithful."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ntransformer_tpu.models.batched import BatchedKV, batched_decode_step
from ntransformer_tpu.models.llama import KVCache, forward
from ntransformer_tpu.models.loader import load_model
from ntransformer_tpu.parallel.dp import (make_batched_decode_sharded,
                                          shard_server_state)
from ntransformer_tpu.parallel.multihost import make_mesh
from tools.make_test_gguf import write_model


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "dp_q8.gguf"
    write_model(str(path), "tiny", "q8_0", seed=12)
    return load_model(str(path))


def _prefill_batch(model, prompts):
    arch, w = model.arch, model.weights
    B = len(prompts)
    bkv = BatchedKV.create(arch, B)
    tokens, pos = [], []
    for b, ids in enumerate(prompts):
        kv = KVCache.create(arch)
        logits, kv, _ = forward(arch, w, kv, jnp.asarray(ids, jnp.int32), 0)
        bkv = BatchedKV(bkv.k.at[:, b].set(kv.k), bkv.v.at[:, b].set(kv.v))
        tokens.append(int(jnp.argmax(logits[0])))
        pos.append(len(ids))
    return (bkv, jnp.asarray(tokens, jnp.int32), jnp.asarray(pos, jnp.int32),
            jnp.ones(B, bool))


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2)])  # tiny model: Hkv=2 caps tp
def test_dp_tp_batched_matches_unsharded(model, dp, tp):
    arch, w = model.arch, model.weights
    prompts = [[1, 5], [9, 2, 7], [3], [11, 12, 13, 14],
               [4, 4], [6], [8, 1], [2, 9, 9]]
    bkv, tokens, pos, active = _prefill_batch(model, prompts)

    ref_logits, ref_kv = batched_decode_step(arch, w, bkv, tokens, pos, active)

    mesh = make_mesh(tp=tp, dp=dp)
    bkv2, t2, p2, a2 = _prefill_batch(model, prompts)
    w_sh, _ = shard_server_state(mesh, arch, w, len(prompts))
    step = make_batched_decode_sharded(mesh, arch, w)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ntransformer_tpu.parallel.dp import _specs
    _, kv_spec, _ = _specs(mesh, w)
    bkv2 = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), bkv2, kv_spec)
    logits, kv2 = step(w_sh, bkv2, t2, p2, a2)

    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(kv2.k).astype(np.float32),
        np.asarray(ref_kv.k).astype(np.float32), rtol=1e-2, atol=1e-2)
    # one more step chained on the sharded state
    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits2, _ = step(w_sh, kv2, nxt, p2 + 1, a2)
    rnxt = jnp.argmax(ref_logits, axis=-1).astype(jnp.int32)
    ref2, _ = batched_decode_step(arch, w, ref_kv, rnxt, pos + 1, active)
    # step-2 compares through a bf16 KV round-trip → looser absolute bound
    np.testing.assert_allclose(np.asarray(logits2), np.asarray(ref2),
                               atol=5e-3)
