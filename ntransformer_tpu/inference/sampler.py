"""Token sampler — device-side (jit) with a numpy reference twin.

Capability parity with the reference sampler (src/inference/sampler.cpp):
temperature, top-k, top-p renormalization, categorical draw, repeat penalty
over a trailing window, greedy when temperature <= 0 (sampler.cpp:30-119).

TPU-native difference: the reference copies the full logits vector D2H every
token and samples on the CPU (engine.cpp:78-84). Here sampling runs on-device
under jit with jax.random, so only the sampled token id (4 bytes) crosses the
host boundary. The numpy twin exists for hermetic unit tests and as the
documented semantics.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SamplerConfig:
    """ref: engine.h:17-26 GenerateConfig sampling fields."""

    temperature: float = 0.8
    top_k: int = 40
    top_p: float = 0.95
    repeat_penalty: float = 1.1
    repeat_window: int = 64
    seed: int = 42

    @property
    def greedy(self) -> bool:
        return self.temperature <= 0.0


def apply_repeat_penalty_np(logits: np.ndarray, recent: np.ndarray,
                            penalty: float) -> np.ndarray:
    """Penalize tokens seen in the trailing window (sampler.cpp:30-45).

    Positive logits are divided by the penalty, negative multiplied; applied
    once per unique token.
    """
    if penalty == 1.0 or len(recent) == 0:
        return logits
    out = logits.copy()
    for t in np.unique(recent):
        if 0 <= t < len(out):
            out[t] = out[t] / penalty if out[t] > 0 else out[t] * penalty
    return out


def sample_np(logits: np.ndarray, cfg: SamplerConfig,
              rng: np.random.Generator) -> int:
    """Numpy reference: temperature → top-k → softmax → top-p → draw."""
    if cfg.greedy:
        return int(np.argmax(logits))
    x = logits.astype(np.float64) / cfg.temperature
    k = min(cfg.top_k if cfg.top_k > 0 else len(x), len(x))
    idx = np.argpartition(-x, k - 1)[:k]
    idx = idx[np.argsort(-x[idx], kind="stable")]
    p = np.exp(x[idx] - x[idx[0]])
    p /= p.sum()
    if cfg.top_p < 1.0:
        cum = np.cumsum(p)
        cut = int(np.searchsorted(cum, cfg.top_p) + 1)
        idx, p = idx[:cut], p[:cut]
        p /= p.sum()
    return int(rng.choice(idx, p=p))


@functools.partial(jax.jit, static_argnames=("cfg", "vocab_size"))
def sample_device(logits: jax.Array, key: jax.Array, recent: jax.Array,
                  cfg: SamplerConfig, vocab_size: int) -> jax.Array:
    """On-device sampling. `recent` is an int32 window padded with vocab_size
    (out-of-bounds ids are dropped by the scatter)."""
    logits = logits.astype(jnp.float32)
    if cfg.repeat_penalty != 1.0:
        seen = jnp.zeros((vocab_size,), jnp.bool_).at[recent].set(
            True, mode="drop")
        penalized = jnp.where(logits > 0, logits / cfg.repeat_penalty,
                              logits * cfg.repeat_penalty)
        logits = jnp.where(seen, penalized, logits)
    if cfg.greedy:
        return jnp.argmax(logits).astype(jnp.int32)
    x = logits / cfg.temperature
    k = min(cfg.top_k if cfg.top_k > 0 else vocab_size, vocab_size)
    vals, idx = jax.lax.top_k(x, k)
    logp = jax.nn.log_softmax(vals)
    if cfg.top_p < 1.0:
        probs = jnp.exp(logp)
        cum = jnp.cumsum(probs)
        # Keep the minimal prefix with cumulative prob >= top_p
        keep = (cum - probs) < cfg.top_p
        logp = jnp.where(keep, logp, -jnp.inf)
    choice = jax.random.categorical(key, logp)
    return idx[choice].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k_cap", "vocab_size"))
def _sample_one(lg, key, rec, temp, top_p, penalty, k_limit,
                k_cap: int, vocab_size: int):
    """Single-row twin of _sample_batched (slot admission)."""
    return _sample_row(lg, key, rec, jnp.float32(temp), jnp.float32(top_p),
                       jnp.float32(penalty), jnp.int32(k_limit), k_cap,
                       vocab_size)


def _sample_row(lg, key, rec, temp, top_p, penalty, k_limit,
                k_cap: int, vocab_size: int):
    """One slot with DYNAMIC per-slot params (temperature/top-p/penalty/
    top-k limit as traced scalars; only the top-k WIDTH k_cap is static).
    temp <= 0 means greedy for that slot."""
    lg = lg.astype(jnp.float32)
    seen = jnp.zeros((vocab_size,), jnp.bool_).at[rec].set(True, mode="drop")
    penalized = jnp.where(lg > 0, lg / penalty, lg * penalty)
    lg = jnp.where(seen & (penalty != 1.0), penalized, lg)
    x = lg / jnp.maximum(temp, 1e-6)
    vals, idx = jax.lax.top_k(x, k_cap)
    # per-slot top-k: mask ranks beyond the slot's own limit
    keep_k = jnp.arange(k_cap) < k_limit
    logp = jax.nn.log_softmax(jnp.where(keep_k, vals, -jnp.inf))
    probs = jnp.exp(logp)
    cum = jnp.cumsum(probs)
    keep_p = (cum - probs) < top_p
    logp = jnp.where(keep_p & keep_k, logp, -jnp.inf)
    choice = jax.random.categorical(key, logp)
    sampled = idx[choice].astype(jnp.int32)
    return jnp.where(temp <= 0.0, jnp.argmax(lg).astype(jnp.int32), sampled)


@functools.partial(jax.jit, static_argnames=("k_cap", "vocab_size"))
def _sample_batched(logits, keys, recent, n, temps, top_ps, penalties,
                    k_limits, k_cap: int, vocab_size: int):
    """Whole-batch sampling step with PER-SLOT parameters + on-device
    window push. Returns (tokens [B], keys, recent, n)."""
    B = logits.shape[0]
    splits = jax.vmap(jax.random.split)(keys)          # [B, 2, 2]
    keys_new, subs = splits[:, 0], splits[:, 1]
    toks = jax.vmap(
        lambda lg, k, rec, t, p, pen, kl: _sample_row(
            lg, k, rec, t, p, pen, kl, k_cap, vocab_size)
    )(logits, subs, recent, temps, top_ps, penalties, k_limits)
    w = recent.shape[1]
    recent = recent.at[jnp.arange(B), n % w].set(toks)
    return toks, keys_new, recent, n + 1


@functools.partial(jax.jit, static_argnames=("k_cap", "vocab_size"))
def _spec_accept_batched(vlogits, drafts, keys, recent, n, temps, top_ps,
                         penalties, k_limits, active,
                         k_cap: int, vocab_size: int):
    """Speculative ACCEPT for sampled serving: greedy-draft rejection
    sampling, exactly unbiased. The draft distribution is the point mass
    at the draft model's argmax d_j, so the Leviathan accept rule reduces
    to: accept d_j with probability p_j(d_j) (the slot's full tempered /
    top-k / top-p / penalty-adjusted target distribution); on rejection,
    sample the correction from p_j with d_j masked out and renormalized —
    the combined law is exactly p_j. All K+1 positions run in one on-device
    scan per slot (vmapped), with the repeat-penalty window advancing
    through the round so position j+1 sees position j's accepted token.

    vlogits [B, K+1, V], drafts [B, K] -> (toks [B, K+1] int32 with a
    vocab_size sentinel beyond each slot's emitted prefix, n_acc [B],
    new sampler state). Greedy slots (temp <= 0) reduce to the prefix-
    match rule (accept iff argmax == draft, correction = argmax) — the
    same tokens as the greedy host path."""
    B, K1, V = vlogits.shape
    splits = jax.vmap(jax.random.split)(keys)
    _, subs = splits[:, 0], splits[:, 1]

    def row(lg_all, dr, key, rec, cnt, t, p, pen, kl, alive0):
        w = rec.shape[0]

        def dist(lg, rec):
            lg = lg.astype(jnp.float32)
            seen = jnp.zeros((vocab_size,), jnp.bool_).at[rec].set(
                True, mode="drop")
            pl = jnp.where(lg > 0, lg / pen, lg * pen)
            lg = jnp.where(seen & (pen != 1.0), pl, lg)
            x = lg / jnp.maximum(t, 1e-6)
            vals, idx = jax.lax.top_k(x, k_cap)
            keep = jnp.arange(k_cap) < kl
            logp = jax.nn.log_softmax(jnp.where(keep, vals, -jnp.inf))
            probs = jnp.exp(logp)
            cum = jnp.cumsum(probs)
            keep = keep & ((cum - probs) < p)
            logp = jnp.where(keep, logp, -jnp.inf)
            return idx, logp, jnp.argmax(lg).astype(jnp.int32)

        def step(carry, inp):
            key, rec, cnt, alive, n_acc = carry
            lg, d, is_bonus = inp
            idx, logp, gmax = dist(lg, rec)
            key, ku, kc = jax.random.split(key, 3)
            p_d = jnp.sum(jnp.where(idx == d, jnp.exp(logp), 0.0))
            accept = jnp.where(t <= 0.0, gmax == d,
                               jax.random.uniform(ku) < p_d) & ~is_bonus
            # correction / bonus draw (bonus keeps the full distribution)
            logp_c = jnp.where((idx == d) & ~is_bonus, -jnp.inf, logp)
            corr = jnp.where(t <= 0.0, gmax,
                             idx[jax.random.categorical(kc, logp_c)]
                             .astype(jnp.int32))
            tok = jnp.where(accept, d, corr)
            tok_out = jnp.where(alive, tok, jnp.int32(vocab_size))
            rec = jnp.where(alive, rec.at[cnt % w].set(tok), rec)
            cnt = cnt + alive
            n_acc = n_acc + (alive & accept)
            alive = alive & accept  # bonus always ends the round
            return (key, rec, cnt, alive, n_acc), tok_out

        drs = jnp.concatenate([dr, jnp.full((1,), -1, jnp.int32)])
        bonus = jnp.arange(K1) == (K1 - 1)
        (key, rec, cnt, _alive, n_acc), toks = jax.lax.scan(
            step, (key, rec, cnt, alive0, jnp.int32(0)),
            (lg_all, drs, bonus))
        return toks, n_acc, key, rec, cnt

    toks, n_acc, keys2, rec2, n2 = jax.vmap(row)(
        vlogits, drafts, subs, recent, n, temps, top_ps, penalties,
        k_limits, active)
    return toks, n_acc, keys2, rec2, n2


class BatchedSampler:
    """Per-slot sampling state kept ON DEVICE for the serving loop: one
    jit + one D2H per STEP instead of one D2H per active sequence plus a
    window re-upload per token (r2 weak #3 — B×2 host round-trips per
    step on a rig with a ~27 ms readback floor). Slot RNG streams are
    request-deterministic: fold_in(seed, request_id).

    PER-REQUEST sampling: admit() accepts per-slot overrides for
    temperature / top_p / repeat_penalty / top_k / seed — all dynamic
    values in ONE compiled program. Only the top-k WIDTH is static
    (k_cap = the server config's top_k); per-request top_k can lower it
    but requests asking for more clamp to the cap. temp <= 0 = greedy
    for that slot."""

    def __init__(self, cfg: SamplerConfig, vocab_size: int, batch: int,
                 shard=None, lift=None, fetch=None):
        self.cfg = cfg
        self.V = vocab_size
        self.B = batch
        # Sharded serving (incl. multi-PROCESS SPMD meshes): `shard` places
        # [B, ...] state arrays on the serving mesh (dp on axis 0, matching
        # the step's logits), `lift` replicates small per-admission host
        # values onto the mesh, `fetch` replicates-then-reads device
        # results. Defaults keep the single-chip local behavior. Every
        # process computes identical host-side values (deterministic PRNG
        # from cfg.seed / request_id), so the SPMD programs stay lock-step.
        self._shard = shard if shard is not None else jnp.asarray
        self._lift = lift if lift is not None else jnp.asarray
        # device arrays only need lifting when a custom mesh hook is
        # supplied; the default single-chip path passes them through
        # without a device->host->device round trip
        self._lift_dev = ((lambda x: self._lift(np.asarray(x)))
                          if lift is not None else (lambda x: x))
        self._fetch = fetch if fetch is not None else np.asarray
        self.k_cap = min(cfg.top_k if cfg.top_k > 0 else vocab_size,
                         vocab_size)
        base = jax.random.PRNGKey(cfg.seed)
        keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
            jnp.arange(batch))
        self.keys = self._shard(np.asarray(keys))
        w = max(cfg.repeat_window, 1)
        self.recent = self._shard(np.full((batch, w), vocab_size, np.int32))
        self.n = self._shard(np.zeros((batch,), np.int32))
        self.temps = self._shard(np.full((batch,), cfg.temperature,
                                         np.float32))
        self.top_ps = self._shard(np.full((batch,), cfg.top_p, np.float32))
        self.penalties = self._shard(np.full((batch,), cfg.repeat_penalty,
                                             np.float32))
        self.k_limits = self._shard(np.full((batch,), self.k_cap, np.int32))

    def _slot_params(self, overrides: dict | None):
        o = overrides or {}
        temp = float(o.get("temperature", self.cfg.temperature))
        top_p = float(o.get("top_p", self.cfg.top_p))
        pen = float(o.get("repeat_penalty", self.cfg.repeat_penalty))
        k = o.get("top_k", self.cfg.top_k)
        k = self.k_cap if not k or k <= 0 else min(int(k), self.k_cap)
        seed = int(o.get("seed", self.cfg.seed))
        return temp, top_p, pen, k, seed

    def admit(self, slot: int, request_id: int, first_logits,
              overrides: dict | None = None) -> int:
        """Initialize a slot for a newly admitted request (applying its
        sampling overrides) and sample its FIRST token (single-row; one
        4-byte D2H — unavoidable, the host must check stop conditions)."""
        temp, top_p, pen, k, seed = self._slot_params(overrides)
        key = jax.random.fold_in(jax.random.PRNGKey(seed), 1 + request_id)
        key, sub = jax.random.split(key)
        blank = np.full((self.recent.shape[1],), self.V, np.int32)
        tok = _sample_one(first_logits, self._lift_dev(sub),
                          self._lift(blank), temp, top_p, pen, k,
                          self.k_cap, self.V)
        t = int(self._fetch(tok))
        row = blank.copy()
        row[0] = t
        self.keys = self.keys.at[slot].set(self._lift_dev(key))
        self.recent = self.recent.at[slot].set(self._lift(row))
        self.n = self.n.at[slot].set(1)
        self.temps = self.temps.at[slot].set(temp)
        self.top_ps = self.top_ps.at[slot].set(top_p)
        self.penalties = self.penalties.at[slot].set(pen)
        self.k_limits = self.k_limits.at[slot].set(k)
        return t

    def sample(self, logits) -> np.ndarray:
        """Sample the whole batch; returns host int32 [B] (one D2H)."""
        toks, self.keys, self.recent, self.n = _sample_batched(
            logits, self.keys, self.recent, self.n, self.temps,
            self.top_ps, self.penalties, self.k_limits, self.k_cap, self.V)
        return self._fetch(toks)

    def spec_accept(self, vlogits, drafts, active):
        """Speculative accept round (see _spec_accept_batched): returns
        host (toks [B, K+1] sentinel-padded, n_acc [B]) and advances the
        per-slot RNG/window state by each slot's emitted tokens. vlogits /
        drafts / active arrive as device (or mesh-global) arrays shaped
        [B, K+1, V] / [B, K] / [B] — the serving loop's _vec handles mesh
        placement."""
        toks, n_acc, self.keys, self.recent, self.n = _spec_accept_batched(
            vlogits, drafts, self.keys, self.recent, self.n, self.temps,
            self.top_ps, self.penalties, self.k_limits, active,
            self.k_cap, self.V)
        return self._fetch(toks), self._fetch(n_acc)


class Sampler:
    """Stateful convenience wrapper holding the PRNG key and recent-token window."""

    def __init__(self, cfg: SamplerConfig, vocab_size: int):
        self.cfg = cfg
        self.vocab_size = vocab_size
        self.key = jax.random.PRNGKey(cfg.seed)
        w = max(cfg.repeat_window, 1)
        self._recent = np.full((w,), vocab_size, dtype=np.int32)  # OOB padding
        self._recent_dev = jnp.asarray(self._recent)
        self._n = 0

    def observe(self, token: int):
        """Record a generated token into the repeat-penalty window."""
        w = len(self._recent)
        self._recent[self._n % w] = token
        self._n += 1
        self._recent_dev = jnp.asarray(self._recent)

    def sample(self, logits: jax.Array) -> jax.Array:
        """Sample on-device; returns a 0-d int32 device array (lazy)."""
        self.key, sub = jax.random.split(self.key)
        return sample_device(logits, sub, self._recent_dev, self.cfg,
                             self.vocab_size)

    @staticmethod
    def argmax(logits) -> int:
        return int(jnp.argmax(logits))
