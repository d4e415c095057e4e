"""Quantized linear layers: the QLinear pytree and matmul dispatch.

A QLinear holds the transposed planar arrays of one weight matrix
(core/layout.py). `qmatmul` dispatches to the fused dequant+matmul Pallas
kernel on TPU (ops/pallas/matmul.py) or a jnp fallback that materializes the
dequantized tile (used on CPU tests and for tiny shapes).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtypes import DType
from ..core.layout import LAYOUTS, SPLIT_UNIT
from .dequant_jnp import dequant_planes_jnp

_FLOAT_KINDS = (DType.F16, DType.BF16, DType.F32)

# "auto": Pallas kernels iff default backend is TPU. "on"/"off" override —
# needed when a process serves two backends at once (e.g. the multi-chip
# dry run on virtual CPU devices inside a TPU-default process).
KERNEL_MODE = "auto"


def use_pallas_default() -> bool:
    if KERNEL_MODE == "auto":
        return jax.default_backend() == "tpu"
    return KERNEL_MODE == "on"


@jax.tree_util.register_pytree_node_class
@dataclass
class QLinear:
    """One weight matrix as transposed planes; y = x @ W^T in file terms,
    i.e. x [T, K] → y [T, N] with planes stored [K-ish, N]."""

    dtype: DType
    k: int
    n: int
    planes: dict

    def tree_flatten(self):
        names = self.plane_names(self.dtype)
        return tuple(self.planes[nm] for nm in names), (self.dtype, self.k, self.n)

    @classmethod
    def tree_unflatten(cls, aux, children):
        dtype, k, n = aux
        names = cls.plane_names(dtype)
        return cls(dtype, k, n, dict(zip(names, children)))

    @staticmethod
    def plane_names(dtype: DType) -> tuple[str, ...]:
        if dtype in _FLOAT_KINDS:
            return ("w",)
        return tuple(s.name for s in LAYOUTS[dtype])

    @property
    def nbytes(self) -> int:
        return sum(int(v.size) * v.dtype.itemsize for v in self.planes.values())


def split_x_jnp(x: jnp.ndarray, dtype: DType):
    """jnp twin of core.layout.split_x (reshape-only activation reorder)."""
    u = SPLIT_UNIT[dtype]
    k = x.shape[-1]
    xs = x.reshape(*x.shape[:-1], k // u, u)
    lead = x.shape[:-1]
    return (xs[..., : u // 2].reshape(*lead, k // 2),
            xs[..., u // 2:].reshape(*lead, k // 2))


def plane_dims(planes: dict, dtype: DType) -> tuple[int, int]:
    """(k, n) inferred from the actual plane arrays — correct even for local
    shards inside shard_map (where QLinear's static k/n are global)."""
    if dtype in _FLOAT_KINDS:
        w = planes["w"]
        return w.shape[0], w.shape[1]
    first = LAYOUTS[dtype][0]
    arr = planes[first.name]
    return arr.shape[0] * first.rows_div, arr.shape[1]


def pad_qlinear_lanes(ql: QLinear, multiple: int) -> QLinear:
    """Zero-pad every plane's lane (N) axis to the next `multiple` — wider
    tn tiles for shapes whose N is not 512-divisible (the 128256-vocab LM
    head runs tn=256 → 501 grid steps). Padded columns dequantize to
    EXACTLY 0 for every supported dtype (all plane kinds — codes, scales,
    mins — multiply into w, and all pad to 0), so callers just slice the
    output back to the logical n (head_logits keeps arch.vocab_size)."""
    if ql.n % multiple == 0:
        return ql
    pad = multiple - ql.n % multiple
    first = next(iter(ql.planes.values()))
    xp = np if isinstance(first, np.ndarray) else jnp

    def padded(a):
        widths = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
        return xp.pad(a, widths)
    return QLinear(ql.dtype, ql.k, ql.n + pad,
                   {nm: padded(a) for nm, a in ql.planes.items()})


def qmatmul(x: jnp.ndarray, ql: QLinear, *, use_kernel: bool | None = None,
            out_dtype=jnp.float32, layer=None) -> jnp.ndarray:
    """y[T, N] = x[T, K] @ W^T. Dispatches Pallas kernel vs jnp fallback.

    layer: traced layer index when ql holds STACKED planes ([L, rows, N]) —
    the Pallas kernel selects the layer via scalar prefetch (zero-copy); the
    fallbacks slice first."""
    if use_kernel is None:
        use_kernel = use_pallas_default() and ql.dtype not in _FLOAT_KINDS
    if ql.dtype in _FLOAT_KINDS:
        w = ql.planes["w"]
        if layer is not None:
            w = jax.lax.dynamic_index_in_dim(w, layer, 0, keepdims=False)
        return jnp.dot(x.astype(w.dtype), w,
                       preferred_element_type=jnp.float32).astype(out_dtype)
    if use_kernel:
        if ql.dtype == DType.W4A8 and x.shape[0] == 1:
            # int8-MXU quantized-activation decode kernel; T>1 (prefill /
            # verify) falls through to the exact-dequant tile below
            from .pallas.w4a8 import w4a8_decode_pallas
            return w4a8_decode_pallas(x, ql, out_dtype=out_dtype,
                                      layer=layer)
        if ql.dtype == DType.W8A8:
            from .pallas.w8a8 import MAX_ROWS, w8a8_matmul_pallas
            if x.shape[0] <= MAX_ROWS:
                # one full-rate int8 MXU dot — decode at any batch size,
                # verify windows, AND chunked prefill (uniform numerics);
                # only an oversize T falls to the jnp dequant tail below
                return w8a8_matmul_pallas(x, ql, out_dtype=out_dtype,
                                          layer=layer)
        else:
            from .pallas.matmul import quant_matmul_pallas
            return quant_matmul_pallas(x, ql, out_dtype=out_dtype,
                                       layer=layer)
    planes = ql.planes
    if layer is not None:
        planes = {nm: jax.lax.dynamic_index_in_dim(v, layer, 0, keepdims=False)
                  for nm, v in planes.items()}
    k, n = plane_dims(planes, ql.dtype)
    if ql.dtype == DType.W4A8 and x.shape[0] == 1:
        # CPU fallback mirrors the decode kernel's quantized-activation
        # semantics (parity target: core/w4a8.w4a8_matmul_golden)
        from ..core.w4a8 import w4a8_matmul_golden
        return w4a8_matmul_golden(x.astype(jnp.float32), planes, k, n,
                                  xp=jnp).astype(out_dtype)
    if ql.dtype == DType.W8A8:
        from .pallas.w8a8 import MAX_ROWS
        if x.shape[0] <= MAX_ROWS:
            # CPU fallback mirrors the serving kernel's semantics
            from ..core.w8a8 import w8a8_matmul_golden
            return w8a8_matmul_golden(x.astype(jnp.float32), planes, k, n,
                                      xp=jnp).astype(out_dtype)
    w = dequant_planes_jnp(planes, ql.dtype, k, n, out_dtype=jnp.bfloat16)
    return jnp.dot(x.astype(jnp.bfloat16), w,
                   preferred_element_type=jnp.float32).astype(out_dtype)


def convert_qlinear_w4a8(ql: QLinear) -> QLinear:
    """Requantize any QLinear to the engine-native W4A8 format
    (core/w4a8.py): dequantize each [rows, N] plane set to f32 W^T and
    requantize per-(256-group, column). Handles stacked leading dims
    ([L, ...] layer stacks, [E, ...] expert stacks) by mapping over them.
    numpy planes stay numpy (host load path); jnp planes stay on device
    (synth/bench path). CHANGES NUMERICS — callers gate with --w4a8."""
    from ..core.w4a8 import requant_w4a8
    return _convert_qlinear(ql, DType.W4A8, requant_w4a8)


def convert_qlinear_w8a8(ql: QLinear) -> QLinear:
    """Requantize any QLinear to W8A8 (core/w8a8.py: per-column symmetric
    int8 + [1, N] scales) — the int8-MXU serving format. CHANGES
    NUMERICS — callers gate with --w8a8."""
    from ..core.w8a8 import requant_w8a8
    return _convert_qlinear(ql, DType.W8A8, requant_w8a8)


def _convert_qlinear(ql: QLinear, target: DType, requant_fn) -> QLinear:
    if ql.dtype == target:
        return ql
    names = QLinear.plane_names(ql.dtype)
    first = ql.planes[names[0]]
    xp = np if isinstance(first, np.ndarray) else jnp
    lead = first.shape[:-2]
    flat = {nm: v.reshape((-1,) + v.shape[len(lead):])
            for nm, v in ql.planes.items()}
    n_slices = flat[names[0]].shape[0]
    outs = []
    for i in range(n_slices):
        sl = {nm: flat[nm][i] for nm in names}
        if ql.dtype in _FLOAT_KINDS:
            w = sl["w"].astype(xp.float32)
            k, n = w.shape
        else:
            k, n = plane_dims(sl, ql.dtype)
            if xp is np:
                from ..core.layout import dequant_planes
                w = dequant_planes(sl, ql.dtype, k, n)
            else:
                w = dequant_planes_jnp(sl, ql.dtype, k, n)
        outs.append(requant_fn(w, xp))
    stacked = {nm: xp.stack([o[nm] for o in outs]) for nm in outs[0]}
    if lead:
        planes = {nm: v.reshape(lead + v.shape[1:])
                  for nm, v in stacked.items()}
    else:
        planes = {nm: v[0] for nm, v in stacked.items()}
    return QLinear(target, ql.k, ql.n, planes)


def gather_columns(ql: QLinear, ids: jnp.ndarray) -> QLinear:
    """Select output columns (lane dim) of a QLinear — used to gather token
    embedding columns from a transposed [K, V] table."""
    new_planes = {k: jnp.take(v, ids, axis=1) for k, v in ql.planes.items()}
    return QLinear(ql.dtype, ql.k, int(ids.shape[0]), new_planes)


def embed_lookup(table: QLinear, token_ids: jnp.ndarray,
                 out_dtype=jnp.bfloat16, tp_axis: str | None = None) -> jnp.ndarray:
    """Dequantized embedding rows [T, K] gathered from the transposed
    [K, V] table (shared with the LM head when embeddings are tied —
    the reference's tied-embedding fallback, transformer.cpp:92-99).

    Under tensor parallelism (inside shard_map) the table is row-sharded on
    K; each shard gathers its K-slice and the rows are reassembled with a
    tiled all-gather (tiny: K × T elements).
    """
    sub = gather_columns(table, token_ids)
    k, n = plane_dims(sub.planes, sub.dtype)
    w = dequant_planes_jnp(sub.planes, sub.dtype, k, n,
                           out_dtype=out_dtype)  # [K_local, T]
    if tp_axis is not None:
        w = jax.lax.all_gather(w, tp_axis, axis=0, tiled=True)  # [K, T]
    return w.T
