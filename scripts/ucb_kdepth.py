"""Probe: does a K=16 MXU dot cost the same as K=128 in a Pallas kernel?

If yes, the MT feature matmul (K=16) can pack 8 chunks block-diagonally
into one K=128 dot for ~8x MXU throughput.
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BR = 256


def make(k, n, reps):
    def kern(a_ref, b_ref, o_ref):
        acc = jnp.zeros((BR, n), jnp.float32)

        def body(i, acc):
            return acc + jax.lax.dot_general(
                a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)

        acc = jax.lax.fori_loop(0, reps, body, acc)
        o_ref[:] = acc

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kern,
            grid=(64,),
            in_specs=[
                pl.BlockSpec((BR, k), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BR, n), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((64 * BR, n), jnp.float32),
        )(a, b)
    return run


def main():
    rng = np.random.default_rng(0)
    for k, n, reps in ((16, 512, 88), (128, 512, 88), (16, 4096, 11),
                       (128, 4096, 11)):
        a = jnp.asarray(rng.standard_normal((BR, k)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
        run = make(k, n, reps)
        out = run(a, b)
        jax.block_until_ready(out)
        iters = 10
        t0 = time.time()
        for i in range(iters):
            out = run(a + out[:1, :k] * 1e-9, b)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters * 1e3
        mac = 64 * reps * BR * k * n * 2 / 1e9
        print(f"K={k:4d} N={n:5d} reps={reps:3d}: {dt:7.2f} ms "
              f"({mac / dt:7.1f} GFLOP/ms-ish)")


if __name__ == "__main__":
    main()
