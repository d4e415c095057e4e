"""Spatial pipeline parallelism (PP) for the batched decode step.

SURVEY §2.14's last open row (the reference has no PP either — this is a
target-plan capability, not reference parity). TP remains the recommended
intra-host axis (decode is weight-bandwidth-bound and TP divides the
weight stream); PP is the CROSS-HOST capacity axis: stages exchange one
[B_micro, H] activation per tick over their boundary — DCN-friendly where
TP's per-layer collectives are not (SURVEY §5.8 hierarchy).

Plan over a Mesh with a "pp" axis of S stages (layers L % S == 0):
  layer-stacked weights [L, ...]   -> P("pp", ...)  (each stage holds L/S)
  batched KV [L, B, Hkv, S, D]     -> P("pp", ...)  (KV lives with its layers)
  embed / head / final norm / rope -> replicated
  tokens / pos / active            -> replicated (every stage sees the batch)

Schedule: GPipe over M microbatches of B/M sequences. One decode step runs
T = S + M - 1 ticks inside ONE jitted shard_map program (a lax.scan): at
tick t, stage s processes microbatch m = t - s (when 0 <= m < M) through
its layer slice, then ppermutes its activation to stage s+1; stage 0
injects microbatch t's embedding; the last stage computes logits and
accumulates them into the batch slot. Invalid (bubble) ticks run with
active=False — KV frozen, outputs discarded — so the program is fully
static. Logits finish replicated via one psum (only the last stage
contributes non-zeros).

v1 scope: global-attention families (llama/qwen/mistral/MoE). SWA
families (gemma2/3) key layer_window on the GLOBAL layer index while each
stage indexes weights LOCALLY — refused loudly until the index is
threaded separately. Speculative draft/verify twins: not built (PP serves
the capacity regime; spec lives on the dp/tp path).
"""
from __future__ import annotations

import warnings
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.batched import BatchedKV, _batched_layer_step
from ..models.llama import Arch, ModelWeights, rms_norm
from ..ops.linear import embed_lookup, qmatmul

PP_AXIS = "pp"


def _stage_specs(weights_template: ModelWeights, quant: bool):
    """Shard specs: stacked per-layer arrays split on their leading [L]
    axis; everything else replicated."""
    # layer stacks live under .layers — every array there leads with [L]
    wspecs = jax.tree_util.tree_map_with_path(
        lambda p, x: P(*( (PP_AXIS,) + (None,) * (x.ndim - 1)
                          if "layers" in str(p[0]) else (None,) * x.ndim)),
        weights_template)
    cache = P(PP_AXIS, None, None, None, None)
    sc = P(PP_AXIS, None, None, None) if quant else None
    kv_spec = BatchedKV(cache, cache, sc, sc)
    return wspecs, kv_spec


def shard_pp_state(mesh: Mesh, arch: Arch, weights: ModelWeights,
                   batch: int, quant: bool = False):
    """Place stage-sharded weights and a stage-sharded batched KV."""
    wspecs, kv_spec = _stage_specs(weights, quant)
    w = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        weights, wspecs)
    kv_shape = BatchedKV.create(arch, batch, quant=quant)
    kv = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        kv_shape, kv_spec)
    return w, kv


def make_pp_decode(mesh: Mesh, arch: Arch, weights_template: ModelWeights,
                   n_micro: int = 2, quant: bool = False):
    """Build the jitted PP decode step: (weights, kv, tokens, pos, active)
    -> (logits [B, V] replicated, new kv). Requires arch.n_layers % S == 0
    and B % n_micro == 0."""
    S = mesh.shape[PP_AXIS]
    L = arch.n_layers
    assert L % S == 0, f"n_layers {L} not divisible by {S} pp stages"
    if arch.sliding_window:
        raise NotImplementedError(
            "PP v1 refuses sliding-window families: layer_window keys on "
            "the GLOBAL layer index but stages index weights locally — "
            "use TP/DP (or tiered streaming) for gemma2/3, or thread the "
            "global index through the stage step first")
    L_loc = L // S
    M = n_micro
    wspecs, kv_spec = _stage_specs(weights_template, quant)

    def body(weights, kv, tokens, pos, active):
        s = jax.lax.axis_index(PP_AXIS)
        B = tokens.shape[0]
        assert B % M == 0, f"batch {B} not divisible by {M} microbatches"
        Bm = B // M
        d2 = arch.head_dim // 2

        x_all = embed_lookup(weights.embed, tokens,
                             out_dtype=jnp.float32)          # [B, H]
        if arch.embed_scale != 1.0:
            x_all = x_all * arch.embed_scale

        def rope_rows(p):
            c = jax.lax.dynamic_slice(weights.rope_cos, (p, 0), (1, d2))
            sn = jax.lax.dynamic_slice(weights.rope_sin, (p, 0), (1, d2))
            return c, sn

        kv_k = (kv.k, kv.ks) if kv.quantized else kv.k
        kv_v = (kv.v, kv.vs) if kv.quantized else kv.v

        def _each(f, c):
            return tuple(f(x) for x in c) if isinstance(c, tuple) else f(c)

        def run_stage(x_m, kvk, kvv, pos_m, act_m):
            """My L_loc layers over one microbatch (jnp layer step — the
            portable path; the Pallas stacked-cache kernels slot in per
            stage exactly as on one chip)."""
            cos_t, sin_t = jax.vmap(rope_rows)(pos_m)

            def layer_body(carry, inp):
                xm = carry
                li, kk, vv = inp
                xm, kk, vv = _batched_layer_step(
                    arch, xm, weights.layers, kk, vv, pos_m, act_m,
                    cos_t, sin_t, layer=li)
                return xm, (kk, vv)

            idx = jnp.arange(L_loc, dtype=jnp.int32)
            x_m, (nk, nv) = jax.lax.scan(layer_body, x_m, (idx, kvk, kvv))
            return x_m, nk, nv

        T = S + M - 1
        perm = [(i, (i + 1) % S) for i in range(S)]
        logits0 = jnp.zeros((B, arch.vocab_size), jnp.float32)
        x0 = jnp.zeros((Bm, x_all.shape[-1]), jnp.float32)

        def tick(carry, t):
            x_cur, kv_k, kv_v, logits_acc = carry
            m = t - s                            # my microbatch this tick
            valid = (m >= 0) & (m < M)
            mc = jnp.clip(m, 0, M - 1)
            off = mc * Bm
            # stage 0 injects microbatch t's embedding (clamped; invalid
            # ticks run with active=False so the values never land)
            tc = jnp.clip(t, 0, M - 1)
            inject = jax.lax.dynamic_slice(x_all, (tc * Bm, 0),
                                           (Bm, x_all.shape[-1]))
            x_in = jnp.where(s == 0, inject, x_cur)
            pos_m = jax.lax.dynamic_slice(pos, (off,), (Bm,))
            act_m = jax.lax.dynamic_slice(active, (off,), (Bm,)) & valid
            # the stage cache holds the FULL batch; the layer step sees
            # only this tick's microbatch columns (invalid ticks write
            # frozen rows back — a no-op by the active mask)
            take = lambda c: jax.lax.dynamic_slice_in_dim(c, off, Bm, 1)
            kvk_m = _each(take, kv_k)
            kvv_m = _each(take, kv_v)
            x_out, kvk_m, kvv_m = run_stage(x_in, kvk_m, kvv_m, pos_m,
                                            act_m)
            put = lambda c, nc: jax.lax.dynamic_update_slice_in_dim(
                c, nc, off, 1)
            if isinstance(kv_k, tuple):
                kv_k = tuple(put(c, nc) for c, nc in zip(kv_k, kvk_m))
                kv_v = tuple(put(c, nc) for c, nc in zip(kv_v, kvv_m))
            else:
                kv_k = put(kv_k, kvk_m)
                kv_v = put(kv_v, kvv_m)
            # last stage: head + accumulate into the batch slot
            hf = rms_norm(x_out, weights.output_norm + arch.norm_bias
                          if arch.norm_bias != 0.0 else weights.output_norm,
                          arch.norm_eps)
            lg = qmatmul(hf.astype(jnp.bfloat16), weights.lm_head)
            if lg.shape[-1] > arch.vocab_size:
                lg = lg[:, : arch.vocab_size]
            if arch.final_softcap:
                lg = arch.final_softcap * jnp.tanh(lg / arch.final_softcap)
            emit = valid & (s == S - 1)
            cur = jax.lax.dynamic_slice(logits_acc, (off, 0),
                                        (Bm, arch.vocab_size))
            logits_acc = jax.lax.dynamic_update_slice(
                logits_acc, jnp.where(emit, lg, cur), (off, 0))
            x_nxt = jax.lax.ppermute(x_out, PP_AXIS, perm)
            return (x_nxt, kv_k, kv_v, logits_acc), None

        (xf, kv_k, kv_v, logits), _ = jax.lax.scan(
            tick, (x0, kv_k, kv_v, logits0),
            jnp.arange(T, dtype=jnp.int32))
        # only the last stage accumulated non-zeros; replicate
        logits = jax.lax.psum(
            jnp.where(s == S - 1, logits, jnp.zeros_like(logits)), PP_AXIS)
        if kv.quantized:
            new_kv = BatchedKV(kv_k[0], kv_v[0], kv_k[1], kv_v[1])
        else:
            new_kv = BatchedKV(kv_k, kv_v)
        return logits, new_kv

    vec = P(None)
    step = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(wspecs, kv_spec, vec, vec, vec),
        out_specs=(P(None, None), kv_spec),
        check_rep=False), donate_argnums=(1,))
    return step
