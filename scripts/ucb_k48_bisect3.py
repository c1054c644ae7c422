"""K=48 bisect round 3: trace_brute_pallas body EAGER vs JIT.

Replicates the wrapper's exact steps (rows scatter, prepass, argsort,
_run_kernel) outside jit, then compares with the jitted wrapper."""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tpu_raytracer.models import scenes
    from tpu_raytracer.ops import pallas_trace as pt

    scene = scenes.create_cornell_box()
    o = np.array([-0.999, 0.96825397, 0.5474653], np.float32)
    d = np.array([0.85109353, 0.02118361, -0.5245866], np.float32)
    r = 256
    ro = jnp.asarray(np.tile(o, (r, 1)).astype(np.float32))
    rd = jnp.asarray(np.tile(d, (r, 1)).astype(np.float32))

    BR, CT = pt.BR, pt.CT
    tp = scene.tri_planes.shape[2]
    num_chunks = tp // CT
    rp = max(((r + BR - 1) // BR) * BR, BR)

    t_min = jnp.broadcast_to(jnp.float32(1e-3), (r,))
    t_max = jnp.broadcast_to(jnp.float32(100.0), (r,))
    rows = jnp.zeros((rp, 8), jnp.float32)
    rows = rows.at[:r, 0:3].set(ro)
    rows = rows.at[:r, 3:6].set(rd)
    rows = rows.at[:r, 6].set(t_min)
    rows = rows.at[:r, 7].set(t_max)
    rays = rows.T

    nb = rp // BR
    o_b = rays[0:3].T.reshape(nb, BR, 1, 3)
    d_pad = rays[3:6].T
    eps = 1e-12
    inv_d = 1.0 / jnp.where(jnp.abs(d_pad) < eps,
                            jnp.where(d_pad < 0, -eps, eps), d_pad)
    inv_b = inv_d.reshape(nb, BR, 1, 3)
    tmin_b = rays[6].reshape(nb, BR, 1)
    tmax_b = rays[7].reshape(nb, BR, 1)
    aabb = scene.chunk_aabb
    a = (aabb[None, None, :, 0:3] - o_b) * inv_b
    bb = (aabb[None, None, :, 3:6] - o_b) * inv_b
    t_entry = jnp.maximum(jnp.max(jnp.minimum(a, bb), axis=-1), tmin_b)
    t_exit = jnp.minimum(jnp.min(jnp.maximum(a, bb), axis=-1), tmax_b)
    ray_hit = (t_entry <= t_exit) & (tmax_b > 0.0)
    block_hit = ray_hit.any(axis=1)
    counts = block_hit.sum(axis=1).astype(jnp.int32)
    chunk_list = jnp.argsort(~block_hit, axis=1, stable=True
                             ).astype(jnp.int32).T
    print("counts:", np.asarray(counts),
          "worklist:", np.asarray(chunk_list)[:, 0])

    out = pt._run_kernel(rays, scene.tri_planes, counts, chunk_list, r, rp,
                         nb, num_chunks, tp, False, dest=None, mode="mxuf1")
    print(f"eager _run_kernel mxuf1: tri={int(out['tri'][0])} "
          f"t={float(out['t'][0]):.6f}")

    out2 = pt.trace_brute_pallas(scene.tri_planes, scene.chunk_aabb,
                                 ro, rd, 1e-3, 100.0, kernel="mxuf1")
    print(f"jit wrapper mxuf1      : tri={int(out2['tri'][0])} "
          f"t={float(out2['t'][0]):.6f}")

    out3 = pt._run_kernel(rays, scene.tri_planes, counts, chunk_list, r, rp,
                          nb, num_chunks, tp, False, dest=None, mode="mxu3")
    print(f"eager _run_kernel mxu3 : tri={int(out3['tri'][0])} "
          f"t={float(out3['t'][0]):.6f}")


if __name__ == "__main__":
    main()
