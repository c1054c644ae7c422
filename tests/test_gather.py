"""One-hot MXU gathers: exactness of the VMEM Pallas variant.

The winner-row fetch (ops/hit.fetch_cols) must be BIT-EXACT: t/u/v are
recomputed from the fetched row and integer ids ride bitcast-as-float
columns. `onehot_gather_cols` reconstructs f32 from three bf16 parts
(8+8+8 mantissa bits >= f32's 24), so its output must equal the XLA
exact-f32 one-hot to the bit, including zero rows for invalid (-1) idx.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_raytracer.ops.gather import (onehot_gather_cols,
                                      select_gather_cols, split_exact3)


def test_split_exact3_bitexact_under_jit():
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((777, 9))
         * np.exp(rng.uniform(-12, 12, (777, 9)))).astype(np.float32)
    x[:, 4] = rng.integers(0, 1 << 24, 777).astype(np.float32)
    h, m, lo = jax.jit(split_exact3)(jnp.asarray(x))
    rec = (np.asarray(h, np.float32) + np.asarray(m, np.float32)
           + np.asarray(lo, np.float32))
    assert np.array_equal(rec, x)


def test_onehot_gather_cols_matches_xla_onehot():
    rng = np.random.default_rng(9)
    t, c, r = 1408, 35, 2500
    table = (rng.standard_normal((t, c))
             * np.exp(rng.uniform(-6, 6, (t, c)))).astype(np.float32)
    table[:, 10] = rng.integers(0, 1 << 24, t).astype(np.float32)
    tj = jnp.asarray(table)
    idx = jnp.asarray(rng.integers(-1, t, r).astype(np.int32))

    ref = np.stack(select_gather_cols(tj, idx))         # [C, R] exact f32
    got = np.asarray(onehot_gather_cols(tj, idx))
    assert np.array_equal(ref, got)
    # miss lanes are zero rows
    miss = np.asarray(idx) < 0
    assert (got[:, miss] == 0.0).all()
