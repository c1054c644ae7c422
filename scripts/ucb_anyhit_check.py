"""On-chip agreement check: any-hit early-out kernel vs vpu closest-hit
occlusion (hit/miss must match on windowed rays)."""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tpu_raytracer.models import scenes
    from tpu_raytracer.ops import pallas_trace

    scene = scenes.create_cornell_box()
    r = 65536
    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.uniform(-0.9, 0.9, (r, 3)).astype(np.float32))
    rd = rng.standard_normal((r, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    t_max = jnp.asarray(rng.uniform(0.05, 3.0, (r,)).astype(np.float32))
    active = jnp.asarray(rng.uniform(size=r) > 0.3)

    ref = pallas_trace.trace_brute_pallas(
        scene.tri_planes, scene.chunk_aabb, ro, rd, 1e-3, t_max,
        kernel="vpu", active=active)
    ref_hit = np.asarray(ref["tri"]) >= 0
    for mode in ("any2", "any4"):
        out = pallas_trace.trace_brute_pallas(
            scene.tri_planes, scene.chunk_aabb, ro, rd, 1e-3, t_max,
            any_hit=True, kernel=mode, active=active)
        got_hit = np.asarray(out["tri"]) >= 0
        agree = (ref_hit == got_hit).mean()
        fp = (got_hit & ~ref_hit).mean()
        fn = (~got_hit & ref_hit).mean()
        print(f"{mode}: agree={agree:.5f} false_occl={fp:.5f} "
              f"missed_occl={fn:.5f} inactive_ok="
              f"{not got_hit[~np.asarray(active)].any()}")


if __name__ == "__main__":
    main()
