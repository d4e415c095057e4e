"""Pipeline parallelism (parallel/pp.py): GPipe-schedule batched decode
over a pp-stage mesh must be BIT-identical to the single-device jnp step —
layers are partitioned, not approximated; the schedule only reorders which
stage touches which microbatch when.

Runs on the virtual 8-device CPU mesh (tests/conftest.py)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import Mesh

from ntransformer_tpu.models.batched import BatchedKV, batched_decode_step
from ntransformer_tpu.models.synth import synth_model
from ntransformer_tpu.parallel.pp import (PP_AXIS, make_pp_decode,
                                          shard_pp_state)


def _mesh(n):
    devs = jax.devices()[:n]
    return Mesh(np.array(devs), (PP_AXIS,))


@pytest.mark.parametrize("quant,n_micro", [(False, 1), (False, 2),
                                           (True, 2), (False, 4)])
def test_pp_decode_matches_single_device(quant, n_micro):
    cfg, arch, weights = synth_model("tiny", "q8_0", max_seq_len=64)
    S = 2 if arch.n_layers % 4 else 4
    assert arch.n_layers % S == 0
    mesh = _mesh(S)
    B = 4
    step = make_pp_decode(mesh, arch, weights, n_micro=n_micro,
                          quant=quant)
    w_pp, kv_pp = shard_pp_state(mesh, arch, weights, B, quant=quant)

    kv_ref = BatchedKV.create(arch, B, quant=quant)
    tokens = jnp.asarray([3, 7, 11, 5], jnp.int32)
    active = jnp.asarray([True, True, False, True])
    for t in range(3):
        pos = jnp.asarray([t, t + 2, 1, t], jnp.int32)
        lg_ref, kv_ref = batched_decode_step(arch, weights, kv_ref, tokens,
                                             pos, active, impl="jnp")
        lg_pp, kv_pp = step(w_pp, kv_pp, tokens, pos, active)
        np.testing.assert_array_equal(np.asarray(lg_pp),
                                      np.asarray(lg_ref),
                                      err_msg=f"step {t}")
        tokens = jnp.argmax(lg_ref, -1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(kv_pp.k),
                                  np.asarray(kv_ref.k))
    np.testing.assert_array_equal(np.asarray(kv_pp.v),
                                  np.asarray(kv_ref.v))


def test_pp_refuses_swa():
    cfg, arch, weights = synth_model("tiny", "q8_0", max_seq_len=64)
    arch = dataclasses.replace(arch, sliding_window=8, swa_pattern=2)
    with pytest.raises(NotImplementedError, match="sliding-window"):
        make_pp_decode(_mesh(2), arch, weights)


def test_pp_rejects_bad_layer_split():
    cfg, arch, weights = synth_model("tiny", "q8_0", max_seq_len=64)
    if arch.n_layers % 5 == 0:
        pytest.skip("divisible by 5")
    with pytest.raises(AssertionError):
        make_pp_decode(_mesh(5), arch, weights)
