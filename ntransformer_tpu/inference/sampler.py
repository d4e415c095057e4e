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
