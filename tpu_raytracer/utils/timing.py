"""Honest timing anchors for the axon tunnel.

r4 platform fact: after the jax 0.9 toolchain upgrade,
`jax.block_until_ready` can return BEFORE the dispatch actually
executes on the remote chip (8 full ReSTIR frames "completed" in 13 ms
-> a 1734 Mrays/s fantasy headline, ~170x the physical ceiling of the
kernels involved; the per-frame ray counters materialized real values,
so the frames did run - only the readiness signal lied). A device->host
fetch of a VALUE cannot complete before the data exists, so every
timing-window boundary must be anchored on a materialized value, never
on block_until_ready.

Usage: frames still pipeline (no per-frame sync) - call `sync_value`
once at t0 and once at t1 on an array the full dependency chain feeds.
"""

import math

import jax
import jax.numpy as jnp


def sync_value(x) -> float:
    """Force REAL completion of everything `x` depends on.

    Returns the float of a nan-ignoring sum reduction fetched to host
    (one tiny extra dispatch + RTT per timing boundary). Raises if the
    fetch produces a non-finite value with NaNs already ignored - that
    means the buffer was never written (a stale/garbage readback would
    poison the measurement silently).
    """
    leaves = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "dtype")]
    total = 0.0
    for leaf in leaves:
        # clip BEFORE the sum: legitimate data carries INF sentinels
        # (miss lanes' t) and f32 sums of 3e38 overflow - the checksum
        # must stay finite on real data so the guard only fires on a
        # readback that truly failed to materialize
        v = jnp.clip(leaf.astype(jnp.float32), -1e6, 1e6)
        total += float(jnp.nansum(v))
    if not math.isfinite(total):
        raise RuntimeError(
            f"sync_value fetched a non-finite checksum ({total}); the "
            "readback did not materialize real data")
    return total
