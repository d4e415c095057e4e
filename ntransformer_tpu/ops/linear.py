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
        from .pallas.matmul import quant_matmul_pallas
        return quant_matmul_pallas(x, ql, out_dtype=out_dtype, layer=layer)
    planes = ql.planes
    if layer is not None:
        planes = {nm: jax.lax.dynamic_index_in_dim(v, layer, 0, keepdims=False)
                  for nm, v in planes.items()}
    k, n = plane_dims(planes, ql.dtype)
    w = dequant_planes_jnp(planes, ql.dtype, k, n, out_dtype=jnp.bfloat16)
    return jnp.dot(x.astype(jnp.bfloat16), w,
                   preferred_element_type=jnp.float32).astype(out_dtype)


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
