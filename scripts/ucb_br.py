"""A/B rays-per-block (TPU_RT_BR): full-live vs mostly-dead sweeps.

The per-program fixed cost (~10 us) sets a floor proportional to the
grid size; mostly-dead wavefronts (late bounce depths) are pure floor.
Run: TPU_RT_BR=512 python scripts/ucb_br.py
"""

import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    a0 = args[0]
    t0 = time.time()
    for _ in range(iters):
        out = fn(a0, *args[1:])
        a0 = a0 + jnp.minimum(jnp.abs(out[:1, None]), 10.0) * 1e-9
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3


def main():
    from tpu_raytracer.models import scenes
    from tpu_raytracer.ops import pallas_trace

    print(f"BR={pallas_trace.BR}")
    scene = scenes.create_cornell_box()
    r = 262144
    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.uniform(-0.9, 0.9, (r, 3)).astype(np.float32))
    rd = rng.standard_normal((r, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    live10 = jnp.asarray(rng.uniform(size=r) < 0.1)

    def closest(o, d, act):
        return pallas_trace.trace_brute_pallas(
            scene.tri_planes, scene.chunk_aabb, o, d, 1e-3, 100.0,
            active=act)["t"]

    def occl(o, d, act):
        return pallas_trace.trace_brute_pallas(
            scene.tri_planes, scene.chunk_aabb, o, d, 1e-3, 100.0,
            any_hit=True, active=act)["tri"].astype(jnp.float32)

    jc = jax.jit(closest)
    jo = jax.jit(occl)
    print(f"closest live100 {bench(jc, (ro, rd, None)):7.2f} ms")
    print(f"closest live10  {bench(jc, (ro, rd, live10)):7.2f} ms")
    print(f"anyhit  live100 {bench(jo, (ro, rd, None)):7.2f} ms")
    print(f"anyhit  live10  {bench(jo, (ro, rd, live10)):7.2f} ms")


if __name__ == "__main__":
    main()
