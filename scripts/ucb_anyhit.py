"""Measure occlusion-query (any-hit early-out kernel) vs closest-hit
cost on the real chip. VERDICT r1 item 2: done when shadow-query ms <
50% of closest-hit ms at 512^2-scale ray counts.

Two ray populations:
  - "shadow-like": origins on scene surfaces, directions at the light,
    t_max = light distance (mostly UNOCCLUDED in Cornell - worst case
    for the early-out, best case for t-bounded worklists).
  - "occluded": rays aimed inward with long t_max (early-out fires).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, ro, rd, iters=12):
    out = fn(ro, rd)
    jax.block_until_ready(out)
    o = ro
    t0 = time.time()
    for _ in range(iters):
        out = fn(o, rd)
        o = o + jnp.abs(out[:1]) * 1e-9
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3


def main():
    from tpu_raytracer.models import scenes
    from tpu_raytracer.ops import pallas_trace

    scene = (scenes.create_bunny_scene() if "--bunny" in sys.argv
             else scenes.create_cornell_box())
    r = 262144
    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.uniform(-0.9, 0.9, (r, 3)).astype(np.float32))
    rd = rng.standard_normal((r, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))

    light = np.array([0.0, 0.98, 0.0], np.float32)
    to_l = light[None, :] - np.asarray(ro)
    dist = np.linalg.norm(to_l, axis=-1, keepdims=True)
    rd_shadow = jnp.asarray(to_l / dist)
    tmax_shadow = jnp.asarray(dist[:, 0] - 1e-3)

    def closest(o, d):
        return pallas_trace.trace_brute_pallas(
            scene.tri_planes, scene.chunk_aabb, o, d, 1e-3, 100.0)["t"]

    def occl_far(o, d):
        return pallas_trace.trace_brute_pallas(
            scene.tri_planes, scene.chunk_aabb, o, d, 1e-3, 100.0,
            any_hit=True)["tri"].astype(jnp.float32)

    def occl_shadow(o, d):
        return pallas_trace.trace_brute_pallas(
            scene.tri_planes, scene.chunk_aabb, o, d, 1e-3, tmax_shadow,
            any_hit=True)["tri"].astype(jnp.float32)

    for name, fn, o, d in (
        ("closest   rand", jax.jit(closest), ro, rd),
        ("anyhit    rand", jax.jit(occl_far), ro, rd),
        ("anyhit  shadow", jax.jit(occl_shadow), ro, rd_shadow),
        ("closest shadowdir", jax.jit(closest), ro, rd_shadow),
    ):
        try:
            dt = bench(fn, o, d)
            print(f"{name:18s} {dt:7.2f} ms")
        except Exception as e:
            print(f"{name:18s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
