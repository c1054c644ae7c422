"""Microbench: trace_brute_pallas reorder modes vs live fraction.

Chained varied inputs (the axon tunnel dedupes identical dispatches).
Usage: python scripts/ucb_trace.py [--scene cornell|bunny] [--rays 262144]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cornell")
    ap.add_argument("--rays", type=int, default=262144)
    args = ap.parse_args()

    from tpu_raytracer.models import scenes
    from tpu_raytracer.ops import pallas_trace

    scene = (scenes.create_cornell_box() if args.scene == "cornell"
             else scenes.create_bunny_scene())
    tp = scene.tri_planes.shape[2]
    print(f"scene={args.scene} Tp={tp} chunks={tp // 128}")

    r = args.rays
    rng = np.random.default_rng(0)
    nvar = 4
    ros, rds = [], []
    for i in range(nvar):
        ro = rng.uniform(-0.9, 0.9, (r, 3)).astype(np.float32)
        rd = rng.standard_normal((r, 3)).astype(np.float32)
        rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
        ros.append(jnp.asarray(ro))
        rds.append(jnp.asarray(rd))

    @jax.jit
    def chain_seed(ro, x):
        # mutate origins slightly so chained dispatches differ
        return ro + x * 1e-4

    for frac in (1.0, 0.6, 0.3, 0.1):
        act = [jnp.asarray(rng.random(r) < frac) for _ in range(nvar)]
        for mode in ("none", "live", "bins"):
            fn = jax.jit(lambda ro, rd, a: pallas_trace.trace_brute_pallas(
                scene.tri_planes, scene.chunk_aabb, ro, rd, 1e-3, 100.0,
                active=a, reorder=mode)["t"])
            # warmup
            out = fn(ros[0], rds[0], act[0])
            jax.block_until_ready(out)
            iters = 12
            t0 = time.time()
            carry = jnp.float32(0)
            for i in range(iters):
                o = chain_seed(ros[i % nvar], carry)
                out = fn(o, rds[i % nvar], act[i % nvar])
                carry = out[0] * 1e-6
            jax.block_until_ready(out)
            dt = (time.time() - t0) / iters * 1e3
            print(f"frac={frac:4.1f} mode={mode:5s} {dt:7.2f} ms")


if __name__ == "__main__":
    main()
