"""C-API-shaped embedding interface (ref: include/ntransformer.h:15-38).

The reference *declares* nt_engine_create/destroy/load/generate/
vocab_size/n_layers/hidden_size but never implements them (Phase 5
unfinished, README.md:223; SURVEY §2.8). This module provides the same
surface, implemented, using opaque integer handles so it can be wrapped by
ctypes-style callers or embedded directly.
"""
from __future__ import annotations

import threading

_engines: dict[int, object] = {}
_next_handle = 1
_lock = threading.Lock()

NT_OK = 0
NT_ERROR = -1


def nt_engine_create() -> int:
    """Returns an opaque engine handle (ntransformer.h:15)."""
    global _next_handle
    with _lock:
        h = _next_handle
        _next_handle += 1
        _engines[h] = None
    return h


def nt_engine_load(handle: int, model_path: str, max_ctx: int = 4096,
                   streaming: bool = False) -> int:
    """Load a GGUF into the engine (ntransformer.h:20). Returns NT_OK/NT_ERROR."""
    from .inference.engine import Engine, TieredEngine
    if handle not in _engines:
        return NT_ERROR
    try:
        cls = TieredEngine if streaming else Engine
        _engines[handle] = cls.load(model_path, max_seq_len=max_ctx)
        return NT_OK
    except Exception:
        return NT_ERROR


def nt_engine_generate(handle: int, prompt: str, max_tokens: int = 128,
                       temperature: float = 0.8) -> str | None:
    """Generate a completion (ntransformer.h:25). None on error."""
    from .inference.engine import GenerateConfig
    eng = _engines.get(handle)
    if eng is None:
        return None
    cfg = GenerateConfig(max_tokens=max_tokens, temperature=temperature)
    text, _ = eng.generate(prompt, cfg)
    return text


def _prop(handle: int, name: str) -> int:
    eng = _engines.get(handle)
    return getattr(eng.arch, name) if eng is not None else NT_ERROR


def nt_engine_vocab_size(handle: int) -> int:
    return _prop(handle, "vocab_size")


def nt_engine_n_layers(handle: int) -> int:
    return _prop(handle, "n_layers")


def nt_engine_hidden_size(handle: int) -> int:
    return _prop(handle, "hidden_size")


def nt_engine_destroy(handle: int) -> int:
    """Release the engine (ntransformer.h:17)."""
    with _lock:
        _engines.pop(handle, None)
    return NT_OK


def nt_free(obj) -> None:
    """No-op parity shim (ntransformer.h:38) — Python owns the memory."""
