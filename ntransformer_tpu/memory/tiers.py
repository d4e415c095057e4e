"""Tier sizing: how many layers live HBM-resident vs host-RAM vs disk.

TPU-native equivalent of the reference's TierConfig auto-sizing
(src/memory/streamer.cu:158-226): tier A = HBM free space minus a dynamic
reserve computed from the model config (KV cache + workspace + margin,
streamer.cu:539-559), tier B = host MemAvailable minus a safety margin
(streamer.cu:168-187), remainder = tier C (storage). Env overrides
NT_MAX_HBM_LAYERS / NT_MAX_RAM_LAYERS mirror GPUNVME_MAX_VRAM_LAYERS /
GPUNVME_MAX_RAM_LAYERS (streamer.cu:202-218).
"""
from __future__ import annotations

import os
from dataclasses import dataclass

RAM_SAFETY_BYTES = 6 << 30          # leave for OS/page cache (streamer.cu:184)
HBM_MARGIN_BYTES = 512 << 20        # compile workspace + fragmentation slack
DEFAULT_HBM_BYTES = 16 << 30        # v5e-class chip when stats unavailable


def hbm_free_bytes() -> int:
    """Free HBM on device 0; falls back to a v5e-sized default when the
    platform does not report memory stats (graceful-fallback idiom, §5.3)."""
    try:
        import jax
        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"]) - int(stats.get("bytes_in_use", 0))
    except Exception:
        pass
    return DEFAULT_HBM_BYTES


def ram_available_bytes() -> int:
    """Host MemAvailable (streamer.cu:168-187)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return 8 << 30


@dataclass
class TierConfig:
    """Per-tier layer counts. Layers are assigned in order: the first
    n_hbm are resident, the next n_ram stream from host RAM, the rest
    stream from storage (streamer.cu:566-574)."""

    n_hbm: int
    n_ram: int
    n_disk: int

    @property
    def n_layers(self) -> int:
        return self.n_hbm + self.n_ram + self.n_disk

    @property
    def n_streamed(self) -> int:
        return self.n_ram + self.n_disk

    def tier_of(self, layer: int) -> str:
        if layer < self.n_hbm:
            return "hbm"
        if layer < self.n_hbm + self.n_ram:
            return "ram"
        return "disk"

    @classmethod
    def compute(cls, n_layers: int, layer_bytes: int, reserve_bytes: int, *,
                hbm_bytes: int | None = None, ram_bytes: int | None = None,
                max_hbm_layers: int | None = None,
                max_ram_layers: int | None = None,
                ram_layer_bytes: int | None = None) -> "TierConfig":
        """Auto-size tiers (streamer.cu:158-226). reserve_bytes = resident
        non-layer weights + KV cache + workspace the model needs in HBM.
        ram_layer_bytes: per-layer RAM cost when it differs from the HBM
        cost (runtime tier-B requant shrinks RAM copies ~31% — more layers
        fit, which is the reference's whole motivation for requant-on-
        stage, streamer.cu:45-153)."""
        hbm = hbm_free_bytes() if hbm_bytes is None else hbm_bytes
        ram = ram_available_bytes() if ram_bytes is None else ram_bytes

        usable_hbm = max(0, hbm - reserve_bytes - HBM_MARGIN_BYTES)
        n_hbm = min(n_layers, usable_hbm // layer_bytes if layer_bytes else n_layers)

        env_hbm = os.environ.get("NT_MAX_HBM_LAYERS")
        if max_hbm_layers is None and env_hbm is not None:
            max_hbm_layers = int(env_hbm)
        if max_hbm_layers is not None:
            n_hbm = min(n_hbm, max_hbm_layers)

        rest = n_layers - n_hbm
        usable_ram = max(0, ram - RAM_SAFETY_BYTES)
        rlb = ram_layer_bytes if ram_layer_bytes is not None else layer_bytes
        n_ram = min(rest, usable_ram // rlb if rlb else rest)

        env_ram = os.environ.get("NT_MAX_RAM_LAYERS")
        if max_ram_layers is None and env_ram is not None:
            max_ram_layers = int(env_ram)
        if max_ram_layers is not None:
            n_ram = min(n_ram, max_ram_layers)

        return cls(int(n_hbm), int(n_ram), int(n_layers - n_hbm - n_ram))

    def describe(self, layer_bytes: int) -> str:
        gb = layer_bytes / (1 << 30)
        return (f"tiers: {self.n_hbm} HBM + {self.n_ram} RAM + "
                f"{self.n_disk} disk layers ({gb:.2f} GiB/layer; "
                f"streamed {self.n_streamed * gb:.1f} GiB/token)")
