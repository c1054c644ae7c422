"""Pallas table gather: fast random row lookup from small VMEM tables.

XLA's gather on TPU costs ~15 ns/lookup regardless of table size - at
262k rays that is ~4 ms PER GATHER, and the shading loop needs dozens.
Mosaic exposes `tpu.dynamic_gather` (via jnp.take_along_axis) which gathers
along lanes within a single 128-wide vreg. This kernel composes it into a
general small-table row gather:

    out[c, r] = table[c, idx[r]]        (table [C, T], T <= a few thousand)

by looping over 128-entry table blocks and select-merging lanes whose index
falls in the block: R/1024 ray tiles x T/128 blocks x C columns vreg ops -
two orders of magnitude faster than XLA's gather for the table sizes the
shading loop uses (per-triangle shading rows, materials, lights).

Integer columns ride along bitcast to f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_TILE_SUBLANES = 32          # rays per tile = 32 * 128 = 4096
RAY_TILE = RAY_TILE_SUBLANES * 128
BLOCK = 128                      # dynamic_gather span


def pack_table(columns: list) -> np.ndarray:
    """Host-side: stack 1-D float32/int32 columns [T] into a [C, Tp] table.

    Integer columns are bitcast to f32 (recover with
    `jax.lax.bitcast_convert_type(row, jnp.int32)`).
    """
    t = len(columns[0])
    tp = max(((t + BLOCK - 1) // BLOCK) * BLOCK, BLOCK)
    out = np.zeros((len(columns), tp), np.float32)
    for c, col in enumerate(columns):
        col = np.asarray(col)
        if col.dtype.kind in "iu":
            col = col.astype(np.int32).view(np.float32)
        out[c, :t] = col.astype(np.float32)
    return out


def _gather_kernel(tbl_ref, idx_ref, out_ref, *, num_blocks, num_cols):
    """Per 128-ray group and 128-entry table block, ONE take_along_axis of
    shape [C, 128] gathers every column for the whole group:
        out[c, l] = tbl_block[c, idx_lo[l]]
    (dynamic_gather row-wise with the ray indices broadcast over rows)."""
    def group(g, _):
        idxrow = idx_ref[g]                 # [128]
        hi = idxrow // BLOCK
        lo = idxrow - hi * BLOCK
        lo_b = jnp.broadcast_to(lo[None, :], (num_cols, BLOCK))
        hi_b = jnp.broadcast_to(hi[None, :], (num_cols, BLOCK))

        def blk(b, acc):
            block = tbl_ref[:, b]                       # [C, 128]
            gat = jnp.take_along_axis(block, lo_b, axis=1)
            return jnp.where(hi_b == b, gat, acc)

        acc = jax.lax.fori_loop(
            0, num_blocks, blk, jnp.zeros((num_cols, BLOCK), jnp.float32))
        out_ref[g] = acc
        return 0

    jax.lax.fori_loop(0, idx_ref.shape[0], group, 0)


@functools.partial(jax.jit, static_argnames=())
def table_gather(table, idx):
    """Gather rows: table [C, Tp] f32 (Tp % 128 == 0), idx [R] i32 in [0, T).

    Returns [C, R] f32. Out-of-range indices are clamped host-of-kernel -
    callers mask invalid lanes themselves (idx 0 is always safe).
    """
    c, tp = table.shape
    r = idx.shape[0]
    rp = max(((r + RAY_TILE - 1) // RAY_TILE) * RAY_TILE, RAY_TILE)
    idx_p = jnp.zeros((rp,), jnp.int32).at[:r].set(
        jnp.clip(idx.astype(jnp.int32), 0, tp - 1))
    idx2d = idx_p.reshape(rp // 128, 128)

    if jax.default_backend() != "tpu":
        out = table[:, idx_p]              # XLA fallback (CPU tests)
        return out[:, :r]

    # table relaid block-major: [C, B, 128] -> kernel slices [C, 128] blocks
    tbl_blocks = table.reshape(c, tp // BLOCK, BLOCK)
    kernel = functools.partial(_gather_kernel, num_blocks=tp // BLOCK,
                               num_cols=c)
    grid = (rp // RAY_TILE,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((c, tp // BLOCK, BLOCK), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE_SUBLANES, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RAY_TILE_SUBLANES, c, 128),
                               lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp // 128, c, 128), jnp.float32),
    )(tbl_blocks, idx2d)
    # [G, C, 128] -> [C, R]
    return jnp.moveaxis(out, 1, 0).reshape(c, rp)[:, :r]


def int_rows(rows):
    """Bitcast gathered f32 rows back to int32."""
    return jax.lax.bitcast_convert_type(rows, jnp.int32)
