"""Timers and a phase profiler (ref: src/utils/timer.h, profiler.h).

The reference's CUDA-event Profiler is dormant (zero call sites, SURVEY
§5.1); here the profiler is actually wired into the engine/CLI verbose path.
On the TPU, device-accurate timing needs a D2H readback fence — callers
pass a `fence` (e.g. lambda: np.asarray(x)) when timing device work, since
block_until_ready can return early on tunneled platforms.
"""
from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager


class Timer:
    """Wall-clock timer (ref: timer.h:12-30)."""

    def __init__(self):
        self.start()

    def start(self):
        self._t0 = time.perf_counter()

    def elapsed_ms(self) -> float:
        return (time.perf_counter() - self._t0) * 1e3


class Profiler:
    """Named-phase aggregate profiler (ref: profiler.h:21-48): begin/end or
    the `phase` context manager; `summary()` prints totals sorted by time."""

    def __init__(self):
        self._open: dict[str, float] = {}
        self._total = defaultdict(float)
        self._count = defaultdict(int)
        self.enabled = True

    def begin(self, name: str):
        if self.enabled:
            self._open[name] = time.perf_counter()

    def end(self, name: str, fence=None):
        if not self.enabled or name not in self._open:
            return
        if fence is not None:
            fence()
        dt = time.perf_counter() - self._open.pop(name)
        self._total[name] += dt
        self._count[name] += 1

    @contextmanager
    def phase(self, name: str, fence=None):
        self.begin(name)
        try:
            yield
        finally:
            self.end(name, fence)

    def summary(self) -> str:
        rows = sorted(self._total.items(), key=lambda kv: -kv[1])
        lines = [f"{'phase':<28} {'total ms':>10} {'count':>7} {'avg ms':>9}"]
        for name, tot in rows:
            c = self._count[name]
            lines.append(f"{name:<28} {tot*1e3:>10.1f} {c:>7} {tot*1e3/c:>9.2f}")
        return "\n".join(lines)

    def reset(self):
        self._open.clear()
        self._total.clear()
        self._count.clear()


PROFILER = Profiler()
PROFILER.enabled = False  # opt in via CLI -v / NT_PROFILE=1


def device_memory_report() -> str:
    """HBM usage summary (the reference prints VRAM usage at load and
    exposes Allocator::print_stats, allocator.cpp:182-192)."""
    import jax
    lines = []
    for d in jax.local_devices():
        try:
            st = d.memory_stats() or {}
        except Exception:
            st = {}
        if st:
            used = st.get("bytes_in_use", 0) / (1 << 30)
            limit = st.get("bytes_limit", 0) / (1 << 30)
            peak = st.get("peak_bytes_in_use", 0) / (1 << 30)
            lines.append(f"{d}: {used:.2f} / {limit:.2f} GiB in use "
                         f"(peak {peak:.2f})")
        else:
            lines.append(f"{d}: memory stats unavailable")
    return "\n".join(lines)
