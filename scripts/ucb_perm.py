"""Microbench: permutation mechanics at ray-stream sizes.

Decides HOW to implement live-compaction: XLA row gather / scatter
(~15 ns/row platform fact) vs lax.sort with payload columns (vector
compare-exchange, no per-row addressing). Chained varied inputs.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    carry = args
    for _ in range(iters):
        out = fn(*carry)
        # chain: perturb first arg so the tunnel can't dedupe
        first = carry[0]
        if first.dtype == jnp.float32:
            carry = (first + jnp.float32(1e-6),) + carry[1:]
        else:
            carry = (first ^ jnp.uint32(1),) + carry[1:] \
                if first.dtype == jnp.uint32 else carry
        jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name:34s} {dt:7.2f} ms")


def main():
    r = 262144
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.standard_normal((r, 8)).astype(np.float32))
    idx = jnp.asarray(rng.permutation(r).astype(np.int32))
    live = jnp.asarray((rng.random(r) < 0.4).astype(np.float32))
    keyf = jnp.asarray(rng.standard_normal(r).astype(np.float32))

    timeit("gather rows[idx]  [262k,8]",
           jax.jit(lambda rows, idx: rows[idx]), rows, idx)
    timeit("scatter iota at[idx]",
           jax.jit(lambda idx: jnp.zeros((r,), jnp.int32).at[idx].set(
               jnp.arange(r, dtype=jnp.int32))), idx)
    timeit("cumsum [262k]",
           jax.jit(lambda live: jnp.cumsum(live)), live)

    def sort_payload(keyf, rows):
        ops = (keyf,) + tuple(rows[:, i] for i in range(8))
        out = jax.lax.sort(ops, dimension=0, num_keys=1)
        return out[1]

    timeit("lax.sort key + 8 payload cols", jax.jit(sort_payload), keyf, rows)

    def sort_key_iota(keyf):
        _, perm = jax.lax.sort((keyf, jnp.arange(r, dtype=jnp.int32)),
                               dimension=0, num_keys=1)
        return perm

    timeit("lax.sort key + iota (argsort)", jax.jit(sort_key_iota), keyf)

    timeit("transpose [8,262k]->[262k,8]",
           jax.jit(lambda rows: rows.T.reshape(-1)), rows)


if __name__ == "__main__":
    main()
