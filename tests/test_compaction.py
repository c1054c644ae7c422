"""Ray-stream permutation (ops/compaction.py) correctness.

The reorder modes are pure performance knobs: trace results must be
BIT-identical across "none"/"live"/"bins" (the kernel's argmin tie-breaks
on (chunk id, lane-in-chunk), both invariant to ray order).
"""

import jax.numpy as jnp
import numpy as np

from tpu_raytracer.ops import compaction, pallas_trace


def _perm_ok(src, dest, n):
    src = np.asarray(src)
    dest = np.asarray(dest)
    assert sorted(src.tolist()) == list(range(n))
    assert sorted(dest.tolist()) == list(range(n))
    # restored = permuted[dest] must undo permuted = x[src]
    x = np.arange(n) * 7 + 3
    assert (x[src][dest] == x).all()


def test_partition_live_stable():
    rng = np.random.default_rng(0)
    live = jnp.asarray(rng.random(513) < 0.3)
    src, dest, n_live = compaction.partition_live(live)
    _perm_ok(src, dest, 513)
    live_np = np.asarray(live)
    assert int(n_live) == live_np.sum()
    # live lanes first, original order preserved within each class
    perm_live = live_np[np.asarray(src)]
    assert perm_live[: int(n_live)].all() and not perm_live[int(n_live):].any()
    assert (np.diff(np.asarray(src)[perm_live]) > 0).all()


def test_partition_bins_stable():
    rng = np.random.default_rng(1)
    key = jnp.asarray(rng.integers(0, 9, 700), jnp.int32)
    src, dest = compaction.partition_bins(key, 9)
    _perm_ok(src, dest, 700)
    sorted_keys = np.asarray(key)[np.asarray(src)]
    assert (np.diff(sorted_keys) >= 0).all()
    for b in range(9):
        idx = np.asarray(src)[sorted_keys == b]
        assert (np.diff(idx) > 0).all()   # stability within bin


def test_trace_reorder_bit_identical():
    rng = np.random.default_rng(2)
    t = 300
    v0 = rng.standard_normal((t, 3)).astype(np.float32) * 2
    e1 = rng.standard_normal((t, 3)).astype(np.float32)
    e2 = rng.standard_normal((t, 3)).astype(np.float32)
    planes, aabb, _ = pallas_trace.pack_triangles(v0, e1, e2)
    planes = jnp.asarray(planes)
    aabb = jnp.asarray(aabb)

    r = 700
    ro = jnp.asarray(rng.standard_normal((r, 3)).astype(np.float32) * 3)
    rd = jnp.asarray(rng.standard_normal((r, 3)).astype(np.float32))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    active = jnp.asarray(rng.random(r) < 0.6)

    base = pallas_trace.trace_brute_pallas(
        planes, aabb, ro, rd, 1e-3, 50.0, active=active, reorder="none")
    for mode in ("live", "bins"):
        out = pallas_trace.trace_brute_pallas(
            planes, aabb, ro, rd, 1e-3, 50.0, active=active, reorder=mode)
        for k in base:
            np.testing.assert_array_equal(
                np.asarray(base[k]), np.asarray(out[k]),
                err_msg=f"{mode}:{k}")
