"""SLEP layer streamer: double-buffered host→HBM weight pipeline.

TPU-native rebuild of the reference's LayerStreamer (src/memory/streamer.h:
74-143, streamer.cu) — the crown-jewel subsystem that runs models larger
than device memory by streaming layers through two rotating buffers while
compute proceeds:

  reference                      | here
  -------------------------------+----------------------------------------
  2 GPU slots + CUDA events      | 2 device slots holding async device_put
  (transfer_done/compute_done)   | results; XLA sequences compute after the
                                 | copies, Python never blocks on them
  worker thread + staging bufs   | StagePool (native C++ thread pool) reads
  (streamer.cu:1103-1156)        | pack blobs into 2 staging buffers
  pinned tier-B copies           | tier-B layer blobs held in RAM
  (streamer.cu:599-638)          | (read once at init, parallel chunked)
  NVMe tier C via VFIO           | tier-C contiguous .ntp pread (no
  (streamer.cu:384-525)          | userspace-NVMe analogue on TPU hosts)
  requant-on-stage Q6K→Q4K       | requant at pack build (pack.py)

Pipeline per streamed layer j (mirrors prefetch_staging → begin_h2d →
wait_transfer → signal_compute_done, streamer.cu:1161-1370):

  prefetch(j+2, slot)   worker: fence slot's previous H2D, read blob
  begin_h2d(j+1, slot') main thread: wrap planes, async device_put
  compute(j)            jit stream_layer_step on slot's device arrays
  release(j)            drop device refs so XLA can recycle the HBM

The staging-reuse hazard (reference solves it with compute_done events,
streamer.cu:1307-1310) is handled by fencing the previous device_put of a
staging buffer *on the worker thread* before overwriting it — a jitted
1-element reduction + D2H readback, because on some platforms (axon tunnel)
block_until_ready returns before device execution completes.
"""
from __future__ import annotations

import os
import sys
from dataclasses import dataclass

import jax
import numpy as np

from ..models.llama import LayerWeights
from ..utils.timing import PROFILER
from .native import StagePool, aligned_empty
from .pack import PackReader, make_device_unpacker, unpacker_signature
from .tiers import TierConfig


def coalesced_h2d_default() -> bool:
    """One device_put of the raw layer blob + on-device plane unpack
    (default) vs one device_put per plane (NT_H2D=planes). The coalesced
    path is the reference's single-DMA layer image (streamer.cu:253-298);
    per-plane puts pay a fixed per-transfer cost ~14x per layer."""
    return os.environ.get("NT_H2D", "blob") != "planes"


@jax.jit
def _probe(xs):
    import jax.numpy as jnp
    return sum(x.ravel()[0].astype(jnp.float32) for x in xs)


def _hard_fence(leaves) -> None:
    """Guarantee device-side completion of `leaves` (true H2D fence)."""
    if not leaves:
        return
    jax.block_until_ready(leaves)
    # axon-tunnel quirk: block_until_ready can return early; a D2H readback
    # of a value computed FROM the arrays is a real fence. (_probe is jitted
    # at module level so each pytree signature compiles once.)
    np.asarray(_probe(list(leaves)))


@dataclass
class _Slot:
    staging: np.ndarray                  # host staging buffer (tier C reads)
    device: LayerWeights | None = None   # device arrays of the current layer
    layer: int = -1
    stage_job: object = None             # StagePool handle for pending read
    # Device arrays whose H2D read from `staging` — survives
    # signal_compute_done so the fence covers cross-forward reuse (the
    # token-boundary hazard: slot.device is cleared per token, but the
    # device_put sourced from staging may still be in flight)
    staging_consumer: LayerWeights | None = None


class LayerStreamer:
    """Serves streamed layers (tier B/C) of a PackReader as device
    LayerWeights through a 2-slot pipeline."""

    def __init__(self, pack: PackReader, tiers: TierConfig, *,
                 pool: StagePool | None = None, n_threads: int = 8,
                 requant_ram=None):
        self.pack = pack
        self.tiers = tiers
        self.pool = pool or StagePool(n_threads)
        self.first = tiers.n_hbm                      # first streamed layer
        self.n_streamed = tiers.n_streamed
        # runtime tier-B requant (reference streamer.cu:45-153): Q6_K
        # tensors of RAM-tier layers requantize to `requant_ram` (DType,
        # usually Q4_K) as they load — ~31% less RAM and per-token H2D for
        # those layers, no pack rebuild, tier-C layers untouched. Default
        # from NT_REQUANT_RAM (a dtype name; unset/"" = off).
        if requant_ram is None:
            env = os.environ.get("NT_REQUANT_RAM", "")
            if env and env != "0":
                from ..core.dtypes import DType
                requant_ram = DType[env.upper()]
        self.requant_ram = requant_ram
        self.ram_meta: dict[int, dict] = {}  # per-layer overrides
        # tier-C reads bypass the page cache (O_DIRECT) by default — the
        # reference's entire tier-C design exists because page-cache thrash
        # gives 0.006 tok/s at 70B (docs/TIERED_CACHING.md:5); staging
        # buffers are 4096-aligned for it, rounded extents fit the pack's
        # padded layout, and every precondition failure falls back buffered
        self.direct_io = os.environ.get("NT_DIRECT_IO", "1") != "0"
        buf = (pack.max_layer_nbytes + 4095) // 4096 * 4096
        self.slots = [_Slot(aligned_empty(buf)),
                      _Slot(aligned_empty(buf))]
        self.ram_blobs: dict[int, np.ndarray] = {}
        # optional per-leaf shardings (LayerWeights-shaped pytree): under
        # tensor parallelism each shard receives its slice of the layer
        self.shardings = None
        # single-transfer layer H2D + on-device unpack (disabled under TP
        # shardings — each shard takes per-plane slices of the host blob)
        self.coalesce = coalesced_h2d_default()
        self._unpackers: dict[str, object] = {}
        # True = fence every stage (kills overlap; for measuring the SLEP
        # pipeline's benefit, like the reference's mmap-vs-tiered A/B)
        self.synchronous = False
        self._load_ram_tier()

    # -- init ---------------------------------------------------------------
    def _load_ram_tier(self):
        """Read tier-B layer blobs into RAM (parallel chunked reads —
        reference's pinned per-layer copies, streamer.cu:599-638); with
        requant_ram set, each blob is requantized as it lands (the
        reference's requant-on-stage, streamer.cu:45-153) and the smaller
        re-described blob is what stays resident."""
        jobs = []
        for layer in range(self.first, self.first + self.tiers.n_ram):
            size = self.pack.layer_nbytes(layer)
            # full rounded length so the O_DIRECT extent fits the buffer
            # (layer_weights views only touch the first `size` bytes)
            blob = aligned_empty((size + 4095) // 4096 * 4096)
            self.ram_blobs[layer] = blob
            meta = self.pack.layer_meta(layer)
            jobs.append(self.pool.read(self.pack.path, meta["offset"],
                                       size, blob, direct=self.direct_io))
        for j in jobs:
            self.pool.wait(j)
        if self.requant_ram is not None:
            from .pack import requant_layer_blob, requant_layer_meta
            saved = 0
            for layer, blob in list(self.ram_blobs.items()):
                meta = self.pack.layer_meta(layer)
                new_meta = requant_layer_meta(meta, self.requant_ram)
                if new_meta["size"] == meta["size"]:
                    continue  # nothing requantizable in this layer
                new_blob = aligned_empty(
                    (new_meta["size"] + 4095) // 4096 * 4096)
                requant_layer_blob(meta, blob, new_meta, self.requant_ram,
                                   out=new_blob)
                self.ram_blobs[layer] = new_blob
                self.ram_meta[layer] = new_meta
                saved += meta["size"] - new_meta["size"]
            if saved:
                print(f"streamer: tier B requant -> "
                      f"{self.requant_ram.name}, {saved / (1 << 20):.0f} "
                      f"MiB saved", file=sys.stderr)
        if self.ram_blobs:
            gb = sum(b.nbytes for b in self.ram_blobs.values()) / (1 << 30)
            print(f"streamer: tier B = {len(self.ram_blobs)} layers "
                  f"({gb:.1f} GiB in RAM)", file=sys.stderr)

    # -- pipeline -----------------------------------------------------------
    def prefetch_staging(self, layer: int, slot_id: int) -> None:
        """Non-blocking: make layer's blob available on the host
        (streamer.cu:1161-1230). Tier B is already in RAM → no-op; tier C
        queues a fence + chunked pread into the slot's staging buffer."""
        slot = self.slots[slot_id]
        if slot.stage_job is not None:
            # a pending stage (left over from an early-exit break) still owns
            # the staging buffer — two writers would interleave
            self.pool.wait(slot.stage_job)
            slot.stage_job = None
        if layer in self.ram_blobs:
            return
        meta = self.pack.layer_meta(layer)
        consumer = slot.staging_consumer
        slot.staging_consumer = None  # ownership passes to the job

        def job():
            # fence the H2D that last read this staging buffer (regardless of
            # slot.device — that field is cleared every token by
            # signal_compute_done while the device_put can still be in flight)
            if consumer is not None:
                _hard_fence(jax.tree.leaves(consumer))
            h = self.pool.read(self.pack.path, meta["offset"], meta["size"],
                               slot.staging, direct=self.direct_io)
            self.pool.wait(h)

        slot.stage_job = self.pool.run(job)
        if self.synchronous:
            self.pool.wait(slot.stage_job)
            slot.stage_job = None

    def begin_h2d(self, layer: int, slot_id: int) -> None:
        """Start the async host→HBM transfer of `layer` into `slot`
        (streamer.cu:1246-1370). Returns immediately; the jitted compute
        consuming the arrays is sequenced after the copies by XLA."""
        slot = self.slots[slot_id]
        if layer in self.ram_blobs:
            blob = self.ram_blobs[layer]
        else:
            if slot.stage_job is not None:
                with PROFILER.phase("stream/wait_staging"):
                    self.pool.wait(slot.stage_job)  # staging_ready_ handshake
                slot.stage_job = None
            blob = slot.staging
        with PROFILER.phase("stream/begin_h2d"):
            # requant-on-load re-describes RAM-tier blobs (smaller planes)
            meta = self.ram_meta.get(layer) or self.pack.layer_meta(layer)
            if self.shardings is None and self.coalesce:
                # ONE H2D DMA for the whole layer; planes reconstructed on
                # device by slice+bitcast (exact). The blob device array is
                # dropped right after dispatch — the runtime keeps it alive
                # until the unpack program retires, so peak HBM is
                # 2x layer_bytes per in-flight slot (accounted in the
                # tiered loader's reserve).
                sig = unpacker_signature(meta)
                fn = self._unpackers.get(sig)
                if fn is None:
                    fn = self._unpackers[sig] = make_device_unpacker(meta)
                blob_dev = jax.device_put(blob[: meta["size"]])
                slot.device = fn(blob_dev)
                del blob_dev
            else:
                host_lw = self.pack.layer_weights(layer, blob, meta=meta)
                if self.shardings is not None:
                    slot.device = jax.tree.map(
                        jax.device_put, host_lw,
                        self._shardings_for(layer, host_lw))
                else:
                    slot.device = jax.tree.map(jax.device_put, host_lw)
        slot.layer = layer
        if blob is slot.staging:
            slot.staging_consumer = slot.device
        if self.synchronous:
            _hard_fence(jax.tree.leaves(slot.device))

    def _shardings_for(self, layer: int, host_lw: LayerWeights):
        """Shardings matching `host_lw`'s ACTUAL pytree structure. The
        template shardings were built from the pack's layout; a runtime-
        requanted RAM layer has different plane names (Q6_K's ql/qh vs
        Q4_K's qs/mn) but the SAME per-matrix placement (every plane of a
        matrix shards on the same axis), so the requanted tree reuses each
        matrix's sharding across its new plane set (requant_ram x TP,
        r4 verdict item 7)."""
        if layer not in self.ram_meta:
            return self.shardings
        if not hasattr(self, "_requant_shardings"):
            from ..ops.linear import QLinear
            fields = {}
            for f in host_lw.__dataclass_fields__:
                v = getattr(host_lw, f)
                t = getattr(self.shardings, f)
                if isinstance(v, QLinear) and t is not None:
                    sh = next(iter(t.planes.values()))
                    fields[f] = QLinear(v.dtype, v.k, v.n,
                                        {nm: sh for nm in v.planes})
                else:
                    fields[f] = t
            self._requant_shardings = LayerWeights(**fields)
        return self._requant_shardings

    def get_weights(self, slot_id: int) -> LayerWeights:
        """Device LayerWeights for the slot (arrays may still be filling;
        consumers are sequenced by XLA, like wait_transfer's event)."""
        slot = self.slots[slot_id]
        assert slot.device is not None, "begin_h2d not called for slot"
        return slot.device

    def signal_compute_done(self, slot_id: int) -> None:
        """Drop the slot's device refs so XLA can recycle the HBM once the
        consuming computation retires (streamer.cu:959-964)."""
        self.slots[slot_id].device = None
        self.slots[slot_id].layer = -1

    # -- convenience --------------------------------------------------------
    def layer_nbytes(self, layer: int) -> int:
        """Bytes this layer actually moves host→HBM per token (RAM-tier
        requant shrinks them below the pack's on-disk size)."""
        meta = self.ram_meta.get(layer)
        return meta["size"] if meta else self.pack.layer_nbytes(layer)

    def schedule(self, skip: set[int] | frozenset[int] = frozenset()) -> list[int]:
        """Streamed layer ids in order, minus skipped ones (the layer-skip
        schedule rebuild, transformer.cpp:831-835 — skipping a streamed
        layer skips its I/O too, the real win)."""
        return [l for l in range(self.first, self.first + self.n_streamed)
                if l not in skip]

    def close(self):
        self.pool.close()
