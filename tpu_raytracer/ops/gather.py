"""Fast table gathers: the MXU as a gather engine.

XLA's native gather on TPU costs ~15 ns/row (about 4 ms for a 262k-ray
G-buffer) and Mosaic's dynamic_gather spans only 128 lanes, so per-ray
random table lookups are reformulated as ONE-HOT MATMULS:

  * `select_gather`  - tiny tables (materials, lights, mesh infos; M <= 64):
    a plain XLA one-hot [R, M] @ table [M, C] matmul. With the framework's
    "highest" matmul precision this is exact f32 and costs microseconds.
  * `onehot_gather_cols` - mid tables (per-triangle shading rows,
    T <= ~64k): Pallas kernel, one-hot built in VMEM (never touches HBM),
    table split into three bf16 parts so three bf16 MXU passes
    reconstruct exact f32 (split_exact3).

Integer columns ride along bitcast to f32 through `pack_table` /
`int_rows` (bitcasts survive the hi/lo trick only if values fit f32's
mantissa as integers - use small ints (< 2^24) or dedicated int columns
gathered via select_gather; triangle tables store ids < 2^24).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_raytracer.ops.pallas_trace import _interpret


def pack_table_np(columns: list) -> np.ndarray:
    """Stack host columns [T] -> [T, C] f32. Int columns stored as FLOATS
    (exact below 2^24); recover with .astype(int32)."""
    t = len(columns[0])
    out = np.zeros((t, len(columns)), np.float32)
    for c, col in enumerate(columns):
        out[:, c] = np.asarray(col).astype(np.float32)
    return out


def select_gather(table, idx):
    """table [M, C] (M small), idx [R] -> [R, C] exact f32 one-hot matmul."""
    m = table.shape[0]
    oh = (idx[:, None] == jnp.arange(m, dtype=idx.dtype)[None, :]).astype(
        jnp.float32)
    return jax.lax.dot_general(
        oh, table, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def select_gather_cols(table, idx):
    """table [M, C] (M small), idx [R] -> list of C dense [R] columns.

    Transposed form of `select_gather`: the [C, R] one-hot product keeps
    the ray axis minor, so the result rows are dense [R] arrays with no
    T(8,128) lane padding (a [R, C<128] output pads C to 128 lanes - 42x
    traffic for C=3; PERF.md r3). Same exact-f32 one-hot guarantee."""
    m, c = table.shape
    oh = (idx[None, :] == jnp.arange(m, dtype=idx.dtype)[:, None]).astype(
        jnp.float32)                                   # [M, R]
    out = jax.lax.dot_general(
        table, oh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)           # [C, R]
    return [out[k] for k in range(c)]


# ---------------------------------------------------------------------------
# Transposed Pallas one-hot gather: [C, R] output, one-hot never in HBM
# ---------------------------------------------------------------------------

OGC_BR = 512     # rays per block


def split_exact3(table):
    """[T, C] f32 -> three bf16 parts whose f32 sum is EXACT.

    bf16 holds 8 mantissa bits; three staggered roundings cover f32's 24,
    so hi + mid + lo == table bit-exactly (each residual has <= 8
    significant bits left). The splits run at XLA level, so they MUST go
    through reduce_precision - XLA folds a naive f32->bf16->f32
    round-trip to identity under jit (PERF.md r2)."""
    hi = jax.lax.reduce_precision(table, 8, 7)
    rem = table - hi
    mid = jax.lax.reduce_precision(rem, 8, 7)
    lo = rem - mid
    return (hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16),
            lo.astype(jnp.bfloat16))


def _onehot_cols_kernel(idx_ref, hi_ref, mid_ref, lo_ref, out_ref, *, t):
    idx = idx_ref[0, :]                                    # [BR]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (OGC_BR, t), 1)
    oh = (lanes == idx[:, None]).astype(jnp.bfloat16)      # [BR, T] in VMEM

    def dt(tab_ref):
        # precision must be DEFAULT like every in-kernel bf16 dot: the
        # package forces jax_default_matmul_precision=highest, and jax
        # 0.9 Mosaic rejects contract_precision<fp32> on bf16 operands
        # ("Bad lhs type" at backend compile - AFTER verification, so
        # test_mosaic_lowering can't see it). bf16 x one-hot-bf16 into
        # f32 is exact regardless: one nonzero per one-hot row, and a
        # bf16 product (<=16 mantissa bits) is representable in f32.
        return jax.lax.dot_general(
            tab_ref[:], oh, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)           # [C, BR]

    # one nonzero per one-hot row and an exact 3-way split => the f32
    # accumulation reconstructs the table value bit-exactly
    out_ref[:, :] = dt(hi_ref) + dt(mid_ref) + dt(lo_ref)


def onehot_gather_cols(table, idx):
    """table [T, C] f32, idx [R] i32 -> [C, R] f32, bit-exact rows.

    The XLA transposed one-hot (`select_gather_cols`) materializes a
    [T, R] f32 one-hot in HBM - 1.5 GB (~3.1 ms HBM-bound) for a 1.4k-row
    tri table at 262k rays. Here each 512-ray block builds its [BR, T]
    one-hot IN VMEM and the MXU contracts it against the bf16-split
    table, so HBM traffic is just idx in + [C, R] out. Invalid idx
    (e.g. -1 miss lanes) return zero rows, like the XLA one-hot."""
    t, c = table.shape
    r = idx.shape[0]
    rp = max(((r + OGC_BR - 1) // OGC_BR) * OGC_BR, OGC_BR)
    idx_p = jnp.full((rp,), -1, jnp.int32).at[:r].set(idx.astype(jnp.int32))

    hi, mid, lo = split_exact3(table)
    kernel = functools.partial(_onehot_cols_kernel, t=t)
    out = pl.pallas_call(
        kernel,
        grid=(rp // OGC_BR,),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((1, OGC_BR), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, c), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, c), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, c), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, OGC_BR), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, rp), jnp.float32),
    )(idx_p[None, :], hi, mid, lo)
    return out[:, :r]


def pad_table(table: np.ndarray, row_mult: int = 128,
              col_mult: int = 128) -> np.ndarray:
    t, c = table.shape
    tp = max(((t + row_mult - 1) // row_mult) * row_mult, row_mult)
    cp = max(((c + col_mult - 1) // col_mult) * col_mult, col_mult)
    out = np.zeros((tp, cp), table.dtype)
    out[:t, :c] = table
    return out
