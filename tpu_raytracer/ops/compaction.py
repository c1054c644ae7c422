"""Ray-stream permutations: live-lane compaction and coherence binning.

The blocked Pallas intersector (ops/pallas_trace.py) gets its speed from
per-block chunk worklists: a block of BR consecutive rays only sweeps the
triangle chunks its rays can touch, and a fully dead block sweeps nothing.
That makes RAY ORDER a first-class performance knob:

  * live-compaction packs active lanes to the front so terminated
    wavefront lanes (the reference's per-thread early `break`,
    restir.wgsl:590-733) stop costing sweep time - trailing blocks die
    wholesale;
  * coherence binning groups rays by direction octant (and optionally an
    origin cell) so each block spans a narrow frustum and its chunk
    worklist stays short - the TPU stand-in for the coherence a per-ray
    hardware BVH walk (gbuffer.wgsl:108) gets for free.

Both are *stable counting sorts* built from cumsums + one scatter - no
`jax.lax.sort` (bitonic sort of a 262k-lane stream is slower than the
two wide-row gathers the permutation costs).

Permutation contract: `src`/`dest` are int32 [R];
    permuted = x[src]           (gather into permuted order)
    restored = y_perm[dest]     (undo on results)
Results are bit-identical with or without a permutation UP TO exact-t
ties between triangles in different chunks: within a chunk the argmin
tie-breaks on lane-in-chunk (block-invariant), but worklists are sorted
by per-block entry distance, so a ray whose closest hit is shared at
EXACTLY the same t by triangles in two different chunks (e.g. a quad's
shared diagonal) can resolve to either triangle depending on which rays
share its block. Geometry/shading is identical either way
(tests/test_compaction.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def partition_live(live):
    """Stable partition: live lanes first. Returns (src, dest, n_live)."""
    r = live.shape[0]
    li = live.astype(jnp.int32)
    pref_live = jnp.cumsum(li)
    n_live = pref_live[-1]
    pref_dead = jnp.cumsum(1 - li)
    dest = jnp.where(live, pref_live - 1, n_live + pref_dead - 1)
    src = jnp.zeros((r,), jnp.int32).at[dest].set(
        jnp.arange(r, dtype=jnp.int32))
    return src, dest, n_live


def partition_bins(bin_id, num_bins: int):
    """Stable counting sort by a small integer key in [0, num_bins).

    Returns (src, dest). Cost: one [R, num_bins] one-hot cumsum + one
    scatter - keep num_bins small (<= 32).
    """
    r = bin_id.shape[0]
    oh = jax.nn.one_hot(bin_id, num_bins, dtype=jnp.float32)    # [R, B]
    rank = jnp.cumsum(oh, axis=0) - oh                          # exclusive
    counts = jnp.sum(oh, axis=0)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), jnp.cumsum(counts)[:-1]])
    dest = jnp.sum(oh * (rank + offsets[None, :]), axis=1).astype(jnp.int32)
    src = jnp.zeros((r,), jnp.int32).at[dest].set(
        jnp.arange(r, dtype=jnp.int32))
    return src, dest


def direction_bins(ray_d, live):
    """Coherence key: direction octant, dead lanes in a trailing 9th bin.

    Octant = sign bits of (dx, dy, dz); rays in one octant share slab-test
    geometry, so a block of same-octant rays culls far more chunks than an
    incoherent block.
    """
    b = ((ray_d[:, 0] > 0).astype(jnp.int32)
         + 2 * (ray_d[:, 1] > 0).astype(jnp.int32)
         + 4 * (ray_d[:, 2] > 0).astype(jnp.int32))
    return jnp.where(live, b, 8), 9
