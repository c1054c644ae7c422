"""Phantom bisect 2: failing ray through trace_brute_pallas for each
mxuf group width + worklist on/off (worklist off = sweep all groups)."""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tpu_raytracer.models import scenes
    from tpu_raytracer.ops import pallas_trace

    scene = scenes.create_cornell_box()
    o = np.array([-0.999, 0.96825397, 0.5474653], np.float32)
    d = np.array([0.85109353, 0.02118361, -0.5245866], np.float32)

    r = 256
    ro = jnp.asarray(np.tile(o, (r, 1)).astype(np.float32))
    rd = jnp.asarray(np.tile(d, (r, 1)).astype(np.float32))

    for mode in ("vpu", "mxu3", "mxuf1", "mxuf2", "mxuf4"):
        out = pallas_trace.trace_brute_pallas(
            scene.tri_planes, scene.chunk_aabb, ro, rd, 1e-3, 100.0,
            kernel=mode)
        tri = int(np.asarray(out["tri"])[0])
        t = float(np.asarray(out["t"])[0])
        print(f"{mode:6s}: tri={tri} t={t:.6f}")


if __name__ == "__main__":
    main()
