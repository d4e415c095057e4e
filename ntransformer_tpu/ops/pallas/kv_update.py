"""In-place batched KV-cache row append — a Pallas scatter that replaces
XLA's pathological batched-dynamic-update-slice lowering.

The batched decode step writes ONE row per sequence per layer into
[B, Hkv, S, Dc] caches at per-sequence positions. vmap'd
dynamic_update_slice lowers to an XLA scatter, measured at ~40 ms of a
59.9 ms B=32 int8 step (experiments/batched_cost_bisect.py) — 2/3 of the
whole step spent writing 0.1% of the cache.

Here each grid step (one per sequence) touches only the dtype-native
SUBLANE TILE containing the row (int8: 32 rows, bf16: 16, f32: 8 — Mosaic
rejects 1-row blocks mid-axis): the cache is INPUT/OUTPUT ALIASED, the
tile is read, the new row is merged at pos[b] % tile, and the tile is
written back. Untouched tiles are never copied. Inactive slots keep their
previous contents (the merge predicate includes `active`)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_rows(dtype) -> int:
    itemsize = jnp.dtype(dtype).itemsize
    return {1: 32, 2: 16, 4: 8}[itemsize]


def _kernel(scal_ref, *refs, n_arrays, tiles):
    b = pl.program_id(0)
    pos = scal_ref[0, b]
    act = scal_ref[1, b]
    rows = refs[:n_arrays]
    curs = refs[n_arrays:2 * n_arrays]
    outs = refs[2 * n_arrays:]
    for row, cur, out, tile in zip(rows, curs, outs, tiles):
        r = pos % tile
        # [1, Hkv, tile, Dc]: merge the new row at sublane r when active
        sel = jax.lax.broadcasted_iota(jnp.int32, cur.shape, 2) == r
        write = jnp.logical_and(sel, act != 0)
        out[:] = jnp.where(write, row[:].astype(out.dtype), cur[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _append_impl(scal, caches, rows, *, interpret):
    n = len(caches)
    B, hkv = rows[0].shape[:2]
    tiles = tuple(_tile_rows(c.dtype) for c in caches)

    def row_map(b, s):
        return (b, 0, 0, 0)

    in_specs, out_specs, inputs = [], [], []
    for r in rows:
        dc = r.shape[-1]
        in_specs.append(pl.BlockSpec((1, hkv, 1, dc), row_map,
                                     memory_space=pltpu.VMEM))
        inputs.append(r.reshape(B, hkv, 1, dc))
    for c, tile in zip(caches, tiles):
        dc = c.shape[-1]

        def cache_map(b, s, _t=tile):
            return (b, 0, s[0, b] // _t, 0)
        spec = pl.BlockSpec((1, hkv, tile, dc), cache_map,
                            memory_space=pltpu.VMEM)
        in_specs.append(spec)
        inputs.append(c)
        out_specs.append(spec)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B,),
        in_specs=in_specs, out_specs=tuple(out_specs))
    out = pl.pallas_call(
        functools.partial(_kernel, n_arrays=n, tiles=tiles),
        out_shape=tuple(jax.ShapeDtypeStruct(c.shape, c.dtype)
                        for c in caches),
        grid_spec=grid_spec,
        # alias each cache input (after the n row inputs; +1 scalar arg)
        input_output_aliases={1 + n + i: i for i in range(n)},
        interpret=interpret,
    )(scal, *inputs)
    return out


def append_rows(caches, rows, pos, active, *, interpret: bool | None = None):
    """caches: tuple of [B, Hkv, S, Dc] buffers (consumed — aliased in
    place; S must divide by the dtype's sublane tile); rows: matching
    [B, Hkv, Dc] (or [B, Hkv, 1, Dc]) new values; pos [B] int32 write
    positions; active [B] bool (inactive slots keep their previous
    contents). Returns the updated caches, same order."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    caches = tuple(caches)
    rows = tuple(r.reshape(r.shape[0], r.shape[1], -1) for r in rows)
    scal = jnp.stack([jnp.asarray(pos, jnp.int32),
                      jnp.asarray(active, jnp.int32)])
    return _append_impl(scal, caches, rows, interpret=interpret)


def supports(caches) -> bool:
    """Code caches ([.., S, Dc]) need S to tile by the dtype's sublane
    height; S-minor scale buffers (rank one lower) always merge at a lane
    within a whole-S block."""
    return all(c.shape[-2] % _tile_rows(c.dtype) == 0
               for c in caches if c.ndim == 5)


def _stacked_kernel(scal_ref, *refs, n_arrays, tiles):
    b = pl.program_id(0)
    pos = scal_ref[0, b]
    act = scal_ref[1, b]
    rows = refs[:n_arrays]
    curs = refs[n_arrays:2 * n_arrays]
    outs = refs[2 * n_arrays:]
    for row, cur, out, tile in zip(rows, curs, outs, tiles):
        if tile is None:
            # scale cache tile [L, 1, Hkv, S] (S minor): merge each
            # layer's scalar at LANE pos — whole-S block, no clamping
            sel = jax.lax.broadcasted_iota(jnp.int32, cur.shape, 3) == pos
        else:
            r = pos % tile
            # [L, 1, Hkv, tile, Dc]: merge each layer's row at sublane r
            sel = jax.lax.broadcasted_iota(jnp.int32, cur.shape, 3) == r
        write = jnp.logical_and(sel, act != 0)
        out[:] = jnp.where(write, row[:].astype(out.dtype), cur[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _append_stacked_impl(scal, caches, rows, *, interpret):
    n = len(caches)
    L, B, hkv = rows[0].shape[:3]
    # 5D codes merge at a sublane tile; 4D S-minor scales merge at a lane
    # (tile=None -> whole-S block)
    tiles = tuple(_tile_rows(c.dtype) if c.ndim == 5 else None
                  for c in caches)

    def row_map(b, s):
        return (0, b, 0, 0, 0)

    def row4_map(b, s):
        return (0, b, 0, 0)

    in_specs, out_specs, inputs = [], [], []
    for r, c in zip(rows, caches):
        if c.ndim == 4:
            in_specs.append(pl.BlockSpec((L, 1, hkv, 1), row4_map,
                                         memory_space=pltpu.VMEM))
            inputs.append(r.reshape(L, B, hkv, 1))
        else:
            dc = c.shape[-1]
            in_specs.append(pl.BlockSpec((L, 1, hkv, 1, dc), row_map,
                                         memory_space=pltpu.VMEM))
            inputs.append(r.reshape(L, B, hkv, 1, dc))
    for c, tile in zip(caches, tiles):
        if c.ndim == 4:
            spec = pl.BlockSpec((L, 1, hkv, c.shape[-1]), row4_map,
                                memory_space=pltpu.VMEM)
        else:
            dc = c.shape[-1]

            def cache_map(b, s, _t=tile):
                return (0, b, 0, s[0, b] // _t, 0)
            spec = pl.BlockSpec((L, 1, hkv, tile, dc), cache_map,
                                memory_space=pltpu.VMEM)
        in_specs.append(spec)
        inputs.append(c)
        out_specs.append(spec)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B,),
        in_specs=in_specs, out_specs=tuple(out_specs))
    out = pl.pallas_call(
        functools.partial(_stacked_kernel, n_arrays=n, tiles=tiles),
        out_shape=tuple(jax.ShapeDtypeStruct(c.shape, c.dtype)
                        for c in caches),
        grid_spec=grid_spec,
        input_output_aliases={1 + n + i: i for i in range(n)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scal, *inputs)
    return out


def append_rows_stacked(caches, rows, pos, active, *,
                        interpret: bool | None = None):
    """All-layers bulk append: caches [L, B, Hkv, S, Dc] codes (aliased in
    place) and/or [L, B, Hkv, S] S-minor scale buffers; rows [L, B, Hkv,
    Dc] (or [L, B, Hkv, 1, Dc] — a layer scan's stacked ys; scales
    [L, B, Hkv, 1(, 1)]), pos/active [B]. ONE grid step per sequence
    writes every layer's row in a single whole-L tile DMA — the
    per-(layer, sequence) variant was latency-bound at 32 layers x 32
    sequences x ~30 us."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    caches = tuple(caches)
    rows = tuple(r.reshape(r.shape[0], r.shape[1], r.shape[2], -1)
                 for r in rows)
    scal = jnp.stack([jnp.asarray(pos, jnp.int32),
                      jnp.asarray(active, jnp.int32)])
    return _append_stacked_impl(scal, caches, rows, interpret=interpret)


def append_rows_stacked_dus(caches, rows, pos, active):
    """XLA dynamic-update-slice variant of append_rows_stacked (default at
    B=1, and NT_KV_APPEND=dus elsewhere): one scalar-indexed DUS per
    (cache, sequence) on the stacked buffers — at B=1 this is a single
    in-place row update per cache, bypassing the Pallas kernel's
    read-merge-write of a whole sublane tile. Semantics identical
    (inactive slots keep their previous rows). Rows may cover only a
    leading PREFIX of the layers (a speculative draft through the
    resident prefix writes layers [0, rows.shape[0]) and leaves the rest
    untouched), and may carry T > 1 positions per sequence (a speculative
    VERIFY window writes [pos, pos+T) contiguously)."""
    out = []
    b_n = rows[0].shape[1]
    for c, r in zip(caches, rows):
        hkv = c.shape[2]
        lr = r.shape[0]  # layers covered (may be a prefix of the cache's L)
        if c.ndim == 4:  # S-minor scale buffer [L, B, Hkv, S]
            t = r.size // (lr * b_n * hkv)  # window rows per sequence
            r4 = r.reshape(lr, b_n, hkv, t).astype(c.dtype)
            for b in range(b_n):
                cur = jax.lax.dynamic_slice(
                    c, (0, b, 0, pos[b]), (lr, 1, hkv, t))
                val = jnp.where(active[b], r4[:, b:b + 1], cur)
                c = jax.lax.dynamic_update_slice(c, val, (0, b, 0, pos[b]))
            out.append(c)
            continue
        dc = c.shape[-1]
        t = r.size // (lr * b_n * hkv * dc)
        r5 = r.reshape(lr, b_n, hkv, t, dc).astype(c.dtype)
        for b in range(b_n):
            cur = jax.lax.dynamic_slice(
                c, (0, b, 0, pos[b], 0), (lr, 1, hkv, t, dc))
            val = jnp.where(active[b], r5[:, b:b + 1], cur)
            c = jax.lax.dynamic_update_slice(c, val, (0, b, 0, pos[b], 0))
        out.append(c)
    return tuple(out)
