"""ctypes bindings for the native staging engine (csrc/ntstage.cpp).

Builds the shared library on first use with g++ (cached next to the source
or under /tmp). Every entry point has a pure-Python fallback so the
framework works without a toolchain — the reference's graceful-fallback
idiom (SURVEY.md §5.3).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), os.pardir, "csrc", "ntstage.cpp")
_lock = threading.Lock()
_lib = None
_lib_tried = False


def _build_lib() -> str | None:
    """Build (or reuse) the shared library, keyed on a SOURCE HASH — a
    stale or foreign binary can never be picked up (mtime comparisons are
    unreliable after a fresh clone; advisor finding r1). Binaries are never
    committed (gitignored)."""
    src = os.path.abspath(_SRC)
    try:
        with open(src, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:12]
    except OSError:
        return None
    for d in (os.path.dirname(src), os.path.join(tempfile.gettempdir(), "ntstage")):
        so = os.path.join(d, f"libntstage-{tag}.so")
        try:
            if os.path.exists(so):
                return so
            os.makedirs(d, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
                 src, "-o", so + ".tmp"],
                check=True, capture_output=True)
            os.replace(so + ".tmp", so)
            return so
        except (OSError, subprocess.CalledProcessError):
            continue
    return None


def get_lib():
    """The loaded library, or None (→ callers use the Python fallback)."""
    global _lib, _lib_tried
    with _lock:
        if _lib_tried:
            return _lib
        _lib_tried = True
        so = _build_lib()
        if so is None:
            print("ntstage: native build unavailable, using Python fallback",
                  file=sys.stderr)
            return None
        lib = ctypes.CDLL(so)
        lib.ntstage_create.restype = ctypes.c_void_p
        lib.ntstage_create.argtypes = [ctypes.c_int]
        lib.ntstage_destroy.argtypes = [ctypes.c_void_p]
        lib.ntstage_open.restype = ctypes.c_int
        lib.ntstage_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.ntstage_close.argtypes = [ctypes.c_int]
        lib.ntstage_submit_read.restype = ctypes.c_uint64
        lib.ntstage_submit_read.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_void_p, ctypes.c_int]
        lib.ntstage_submit_copy.restype = ctypes.c_uint64
        lib.ntstage_submit_copy.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_uint64, ctypes.c_int]
        lib.ntstage_wait.restype = ctypes.c_int
        lib.ntstage_wait.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        _lib = lib
        return _lib


DIRECT_ALIGN = 4096


def aligned_empty(size: int, align: int = DIRECT_ALIGN) -> np.ndarray:
    """An uninitialized uint8 buffer whose data pointer is `align`-aligned
    (O_DIRECT requires aligned destination addresses). The returned view
    keeps the over-allocated base alive."""
    raw = np.empty(size + align, np.uint8)
    off = (-raw.ctypes.data) % align
    return raw[off: off + size]


class StagePool:
    """Thread-pooled chunked file reads / memcpys into preallocated staging
    buffers. Native when available; a Python ThreadPoolExecutor otherwise."""

    def __init__(self, n_threads: int = 8, chunks_per_read: int = 8):
        self.n_threads = n_threads
        self.chunks = chunks_per_read
        self._lib = get_lib()
        if self._lib is not None:
            self._pool = self._lib.ntstage_create(n_threads)
            self._fds: dict[tuple[str, bool], int] = {}
            self._fsizes: dict[str, int] = {}
        else:
            from concurrent.futures import ThreadPoolExecutor
            self._exec = ThreadPoolExecutor(max_workers=n_threads,
                                            thread_name_prefix="ntstage")

    @property
    def native(self) -> bool:
        return self._lib is not None

    def _fd(self, path: str, direct: bool = False) -> int:
        key = (path, direct)
        fd = self._fds.get(key)
        if fd is None:
            fd = self._lib.ntstage_open(path.encode(), 1 if direct else 0)
            if fd < 0:
                raise OSError(f"ntstage_open failed for {path}")
            self._fds[key] = fd
        return fd

    def _fsize(self, path: str) -> int:
        s = self._fsizes.get(path)
        if s is None:
            s = os.path.getsize(path)
            self._fsizes[path] = s
        return s

    def read(self, path: str, offset: int, size: int, dest: np.ndarray,
             direct: bool = False):
        """Async read file[offset:offset+size] -> dest[:size]. Returns a
        wait() handle.

        direct=True requests an O_DIRECT (page-cache-bypass) read — the
        reference's whole tier-C design exists because page-cache thrash
        collapses streaming throughput (docs/TIERED_CACHING.md:5,
        streamer.cu:384-525). Falls back to the buffered path whenever any
        O_DIRECT precondition fails (unaligned offset/buffer, rounded
        extent past EOF, filesystem without O_DIRECT — the C side already
        reopens buffered in that case): §5.3 graceful-fallback idiom."""
        assert dest.nbytes >= size
        if self._lib is not None:
            fd = None
            rd_size = size
            if direct:
                rounded = (size + DIRECT_ALIGN - 1) // DIRECT_ALIGN * DIRECT_ALIGN
                if (offset % DIRECT_ALIGN == 0
                        and dest.ctypes.data % DIRECT_ALIGN == 0
                        and dest.nbytes >= rounded
                        and offset + rounded <= self._fsize(path)):
                    fd = self._fd(path, direct=True)
                    rd_size = rounded
            if fd is None:
                fd = self._fd(path)
                rd_size = size
            job = self._lib.ntstage_submit_read(
                self._pool, fd, offset, rd_size,
                dest.ctypes.data_as(ctypes.c_void_p), self.chunks)
            return ("native", job)

        def _do():
            with open(path, "rb") as f:
                f.seek(offset)
                n = f.readinto(memoryview(dest.view(np.uint8))[:size])
                if n != size:
                    raise OSError(f"short read {n} != {size}")
        return ("py", self._exec.submit(_do))

    def copy(self, src: np.ndarray, dest: np.ndarray, size: int):
        """Async parallel memcpy src[:size] -> dest[:size]."""
        if self._lib is not None:
            job = self._lib.ntstage_submit_copy(
                self._pool, src.ctypes.data_as(ctypes.c_void_p),
                dest.ctypes.data_as(ctypes.c_void_p), size, self.chunks)
            return ("native", job)

        def _do():
            dest.view(np.uint8)[:size] = src.view(np.uint8)[:size]
        return ("py", self._exec.submit(_do))

    def run(self, fn):
        """Run an arbitrary callable on the pool (Python-side jobs: fences,
        relayout fallbacks)."""
        if self._lib is not None:
            # arbitrary Python work still needs a Python thread
            from concurrent.futures import ThreadPoolExecutor
            if not hasattr(self, "_exec"):
                self._exec = ThreadPoolExecutor(max_workers=2,
                                                thread_name_prefix="ntstage-py")
        return ("py", self._exec.submit(fn))

    def wait(self, handle) -> None:
        kind, h = handle
        if kind == "native":
            err = self._lib.ntstage_wait(self._pool, h)
            if err:
                raise OSError(err, "ntstage job failed")
        else:
            h.result()

    def close(self):
        if self._lib is not None and getattr(self, "_pool", None):
            for fd in self._fds.values():
                self._lib.ntstage_close(fd)
            self._fds.clear()
            self._lib.ntstage_destroy(self._pool)
            self._pool = None
        if hasattr(self, "_exec"):
            self._exec.shutdown(wait=False)

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
