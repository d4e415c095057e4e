"""Stamp `ntransformer.rope_style` into an existing GGUF (in place).

GGUFs written by this repo's tools BEFORE the rope-pairing fix carry q/k
rows in HF half-split order but no style key — under the new
architecture-keyed default (llama → adjacent, matching llama.cpp's
converted files) they would load with the wrong pairing. Run this once
over any such file:

    python tools/stamp_rope_style.py model.gguf [half|adjacent]

Files converted by llama.cpp need NO stamping (the arch default is
already correct for them). Re-keying invalidates any .ntp pack sidecar;
it rebuilds automatically on next tiered load.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ntransformer_tpu.core.gguf import GGUFReader, GGUFWriter  # noqa: E402


def stamp(path: str, style: str = "half") -> bool:
    """Returns True if the file was rewritten (False: already stamped)."""
    assert style in ("adjacent", "half"), style
    r = GGUFReader(path)
    if r.metadata.get("ntransformer.rope_style") == style:
        r.close()
        return False
    w = GGUFWriter(path + ".new")
    for k, v in r.metadata.items():
        if k != "ntransformer.rope_style":
            w.add_meta(k, v)
    w.add_meta("ntransformer.rope_style", style)
    for name, info in r.tensors.items():
        w.add_tensor(name, raw=bytes(r.raw_bytes(name)),
                     shape=tuple(info.shape), dtype=info.dtype)
    w.write()
    r.close()
    check = GGUFReader(path + ".new")
    assert check.metadata["ntransformer.rope_style"] == style
    check.close()
    os.replace(path + ".new", path)
    return True


if __name__ == "__main__":
    if not 2 <= len(sys.argv) <= 3:
        print(__doc__)
        raise SystemExit(2)
    changed = stamp(sys.argv[1],
                    sys.argv[2] if len(sys.argv) > 2 else "half")
    print(f"{sys.argv[1]}: {'stamped' if changed else 'already stamped'}")
