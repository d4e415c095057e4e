"""Continuous batching: slot-based serving over the batched decode step.

Beyond the reference (strictly batch-1, SURVEY §0): a fixed pool of B
sequence slots decodes in lock-step through models/batched.py; finished
sequences retire and waiting requests are admitted mid-flight (their prefill
runs through the single-sequence forward and the resulting KV is inserted
into the slot), so the batch stays full — the standard production serving
loop, shaped for XLA: one compiled decode program regardless of arrival
order, no dynamic shapes.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..models.batched import BatchedKV, batched_decode_step
from ..models.llama import KVCache, forward
from ..models.loader import LoadedModel
from .engine import _bucket
from .sampler import Sampler, SamplerConfig


@dataclass
class Request:
    prompt: str
    max_tokens: int = 128
    request_id: int = 0
    # filled by the server:
    prompt_ids: list = field(default_factory=list)
    output_ids: list = field(default_factory=list)
    submitted_at: float = 0.0
    first_token_at: float = 0.0
    finished_at: float = 0.0
    _text: str = ""

    @property
    def text(self):
        return self._text

    def done(self, text: str):
        self._text = text
        self.finished_at = time.time()


@dataclass
class ServeStats:
    requests: int = 0
    tokens: int = 0
    wall_s: float = 0.0
    steps: int = 0

    @property
    def tokens_per_s(self) -> float:
        return self.tokens / self.wall_s if self.wall_s else 0.0

    def report(self) -> str:
        return (f"served {self.requests} requests, {self.tokens} tokens in "
                f"{self.wall_s:.2f}s ({self.tokens_per_s:.2f} tok/s, "
                f"{self.steps} batched steps)")


class BatchServer:
    """Greedy continuous-batching server (temperature via per-slot samplers)."""

    def __init__(self, model: LoadedModel, batch_size: int = 8,
                 sampler_cfg: SamplerConfig | None = None):
        self.model = model
        self.arch = model.arch
        self.B = batch_size
        self.scfg = sampler_cfg or SamplerConfig(temperature=0.0)
        self.tokenizer = model.tokenizer

    def _prefill_one(self, ids: list[int]):
        """Single-sequence bucketed prefill → (last logits [V], kv)."""
        kv = KVCache.create(self.arch)
        t = len(ids)
        p = min(_bucket(t), self.arch.max_seq_len)  # never pad past the cache
        padded = np.zeros(p, np.int32)
        padded[:t] = ids
        logits, kv, _ = forward(self.arch, self.model.weights, kv,
                                jnp.asarray(padded), 0, n_valid=t)
        return logits[0], kv

    def run(self, requests: list[Request]) -> ServeStats:
        """Serve all requests to completion; returns aggregate stats."""
        stats = ServeStats(requests=len(requests))
        queue = list(requests)
        max_prompt = max(1, self.arch.max_seq_len - 2)
        for i, r in enumerate(queue):
            r.request_id = i
            r.submitted_at = time.time()
            r.prompt_ids = self.tokenizer.encode(r.prompt, add_bos=True)
            if len(r.prompt_ids) > max_prompt:
                # clamp: a longer prompt would scatter past the cache end
                r.prompt_ids = r.prompt_ids[-max_prompt:]

        B = self.B
        bkv = BatchedKV.create(self.arch, B)
        slot_req: list[Request | None] = [None] * B
        tokens = np.zeros(B, np.int32)
        pos = np.zeros(B, np.int32)
        active = np.zeros(B, bool)
        samplers = [Sampler(self.scfg, self.arch.vocab_size) for _ in range(B)]
        eos = self.tokenizer.eos_id

        def admit(slot: int) -> bool:
            nonlocal bkv
            while queue:
                r = queue.pop(0)
                last_logits, kv = self._prefill_one(r.prompt_ids)
                samplers[slot] = Sampler(self.scfg, self.arch.vocab_size)
                if self.scfg.greedy:
                    first = int(jnp.argmax(last_logits))
                else:
                    first = int(samplers[slot].sample(last_logits))
                    samplers[slot].observe(first)
                r.output_ids = [first]
                r.first_token_at = time.time()
                stats.tokens += 1
                if first == eos or r.max_tokens <= 1:
                    # finished at the first token — don't occupy a slot
                    r.done(self.tokenizer.decode(r.output_ids))
                    continue
                bkv = bkv.insert(slot, kv)
                slot_req[slot] = r
                tokens[slot] = first
                pos[slot] = len(r.prompt_ids)
                active[slot] = True
                return True
            return False

        def retire(slot: int):
            r = slot_req[slot]
            r.done(self.tokenizer.decode(r.output_ids))
            slot_req[slot] = None
            active[slot] = False

        t0 = time.perf_counter()
        for b in range(B):
            admit(b)

        while any(active) or queue:
            logits, bkv = batched_decode_step(
                self.arch, self.model.weights, bkv,
                jnp.asarray(tokens), jnp.asarray(pos), jnp.asarray(active))
            stats.steps += 1
            logits_np = None
            for b in range(B):
                if not active[b]:
                    continue
                r = slot_req[b]
                if self.scfg.greedy:
                    if logits_np is None:
                        logits_np = np.asarray(jnp.argmax(logits, axis=-1))
                    nxt = int(logits_np[b])
                else:
                    nxt = int(samplers[b].sample(logits[b]))
                    samplers[b].observe(nxt)
                r.output_ids.append(nxt)
                stats.tokens += 1
                pos[b] += 1
                tokens[b] = nxt
                seq_len = pos[b] + 1
                if (nxt == eos or len(r.output_ids) >= r.max_tokens
                        or seq_len >= self.arch.max_seq_len):
                    retire(b)
                    admit(b)
        stats.wall_s = time.perf_counter() - t0
        return stats
