"""(layer, expert) streaming for tiered MoE decode (r5 verdict item 5).

Dense SLEP streams whole layers; an MoE layer only USES k of E experts per
token, so the right streaming unit is the (layer, expert) weight set —
the r4 cost model (experiments/moe_tiered_cost.py) measured the decisive
inputs on a traced routing distribution:

  * temporal prefetch ("the experts this layer used LAST token") hits 0.94;
  * a (layer, expert) plan moves ~E/k x fewer bytes than dense layers
    (1.9x at mixtral shapes after paying double for misses).

Design: an HBM LRU of device-resident expert weight sets over two host
tiers (whole-layer blobs in RAM; 4096-aligned per-expert O_DIRECT reads
from the pack for the rest), with:

  * PREFETCH at token start: async-load each layer's last-token expert set
    (hits make the H2D overlap compute, like SLEP's begin_h2d);
  * DEMAND loads when routing misses the prediction (the router output
    that names the expert only exists after the layer's attention ran —
    no pipeline distance to hide a miss in, so misses are the cost);
  * hit/miss/demand counters (the prefetch-hit telemetry the verdict
    asks for) via `stats()`.

The reference has no MoE support at all (llama-only, config.h:13); this
subsystem has no reference analogue — it extends the SLEP idea
(streamer.cu:1161-1370) to a routed working set.
"""
from __future__ import annotations

import os
from collections import OrderedDict

import jax
import numpy as np

from .native import StagePool, aligned_empty
from .pack import PackReader


class ExpertStreamer:
    """Serves (layer, expert) weight dicts ({w_gate, w_up, w_down}
    QLinears on device) through an HBM LRU backed by RAM/disk tiers."""

    def __init__(self, pack: PackReader, layers, *, hbm_slots: int,
                 ram_layers=None, pool: StagePool | None = None,
                 n_threads: int = 8):
        self.pack = pack
        self.layers = list(layers)
        self.hbm_slots = max(int(hbm_slots), 1)
        self.pool = pool or StagePool(n_threads)
        self.direct_io = os.environ.get("NT_DIRECT_IO", "1") != "0"
        # RAM tier: whole-layer blobs (parallel chunked reads, like the
        # dense streamer's tier B)
        self.ram_blobs: dict[int, np.ndarray] = {}
        ram_layers = set(ram_layers if ram_layers is not None else self.layers)
        jobs = []
        for layer in self.layers:
            if layer not in ram_layers:
                continue
            size = pack.layer_nbytes(layer)
            blob = aligned_empty((size + 4095) // 4096 * 4096)
            self.ram_blobs[layer] = blob
            meta = pack.layer_meta(layer)
            jobs.append(self.pool.read(pack.path, meta["offset"], size,
                                       blob, direct=self.direct_io))
        for j in jobs:
            self.pool.wait(j)
        # HBM LRU: (layer, e) -> device weight dict
        self._cache: OrderedDict[tuple[int, int], dict] = OrderedDict()
        # in-flight disk reads: (layer, e) -> (job, host buffer)
        self._pending: dict[tuple[int, int], tuple] = {}
        # last token's routing per layer — the temporal prediction
        self.last_sel: dict[int, list[int]] = {}
        self.hits = 0
        self.misses = 0
        self.demand_loads = 0
        self.prefetches = 0

    # -- internals -----------------------------------------------------------
    def _host_views(self, layer: int, e: int):
        if layer in self.ram_blobs:
            return self.pack.expert_weights(layer, e, self.ram_blobs[layer])
        key = (layer, e)
        if key in self._pending:
            job, buf = self._pending.pop(key)
            self.pool.wait(job)
        else:
            buf = np.empty(self.pack.expert_nbytes(layer, e), np.uint8)
            self.pack.read_expert(layer, e, buf)
        return self.pack.expert_weights(layer, e, buf, whole_layer=False)

    def _admit(self, layer: int, e: int) -> dict:
        """Device-load one expert set (async device_put) into the LRU."""
        host = self._host_views(layer, e)
        dev = jax.tree.map(jax.device_put, host)
        key = (layer, e)
        self._cache[key] = dev
        self._cache.move_to_end(key)
        while len(self._cache) > self.hbm_slots:
            self._cache.popitem(last=False)
        return dev

    # -- API ------------------------------------------------------------------
    def prefetch_token_start(self) -> None:
        """Async-load every layer's PREDICTED experts (last token's set).
        Device puts are async: the transfers overlap attention compute of
        earlier layers, the SLEP overlap idea applied to experts."""
        for layer in self.layers:
            for e in self.last_sel.get(layer, ()):
                key = (layer, e)
                if key in self._cache:
                    self._cache.move_to_end(key)
                    continue
                if layer not in self.ram_blobs and key not in self._pending:
                    # disk tier: start the pread on the worker pool now,
                    # device_put happens at get()
                    buf = np.empty(self.pack.expert_nbytes(layer, e),
                                   np.uint8)
                    lmeta = self.pack.layer_meta(layer)
                    emeta = lmeta["experts"][e]
                    job = self.pool.read(
                        self.pack.path, lmeta["offset"] + emeta["off"],
                        emeta["size"], buf, direct=self.direct_io)
                    self._pending[key] = (job, buf)
                else:
                    self._admit(layer, e)
                self.prefetches += 1

    def get(self, layer: int, e: int) -> dict:
        """The expert's device weights; counts prediction hits/misses."""
        key = (layer, e)
        cached = self._cache.get(key)
        predicted = (e in self.last_sel.get(layer, ())
                     or key in self._pending)
        if cached is not None:
            self.hits += 1
            self._cache.move_to_end(key)
            return cached
        if predicted and key in self._pending:
            self.hits += 1  # disk prefetch landed in time
        else:
            self.misses += 1
            self.demand_loads += 1
        return self._admit(layer, e)

    def note(self, layer: int, expert_ids) -> None:
        """Record this token's routing for next token's prefetch."""
        self.last_sel[layer] = [int(x) for x in np.asarray(expert_ids).ravel()]

    def stats(self) -> dict:
        total = self.hits + self.misses
        return {"hits": self.hits, "misses": self.misses,
                "demand_loads": self.demand_loads,
                "prefetches": self.prefetches,
                "hit_rate": self.hits / total if total else 0.0,
                "cached": len(self._cache), "slots": self.hbm_slots}

    def reset_stats(self) -> None:
        self.hits = self.misses = self.demand_loads = self.prefetches = 0

    def close(self):
        self.pool.close()
