"""Beyond-512k-tri intersector decision: swept path vs BVH pointer walk.

The COARSE-cull prepass (pallas_trace.py trace_brute_pallas: union-AABB
slab tests at TPU_RT_CULL_UNITS granularity, repeated back to kernel
units) bounds the slab cost that used to grow linearly with triangles,
so the segmented streamed sweep is now FUNCTIONAL at ~1M tris. Whether
it BEATS the per-lane stream-BVH gather walk (ops/traversal.py, ~15
ns/row per step) there is the routing question TPU_RT_BRUTE_MAX exists
to settle - this tool measures both on the same ~983k-tri scene with
both incoherent (bounce-like) and coherent (camera-like) ray sets.

Flip trace_api.BRUTE_FORCE_MAX_TRIS only from this tool's on-chip
numbers (CLAUDE.md: no default flips without chip evidence). Replaces
the reference's driver-BVH black box at sizes the reference never
reaches on WebGPU (src/wgpu_ctx.rs:37-42 just requires ray_query).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_raytracer.utils.timing import sync_value


def build_scene():
    from tpu_raytracer.models.scenes import PI
    from tpu_raytracer.scene.builder import SceneBuilder
    from tpu_raytracer.scene.geometry import create_plane, create_sphere
    from tpu_raytracer.scene.material import Material
    from tpu_raytracer.utils.math3d import rotation_x, scale, translation

    b = SceneBuilder()
    plane_id = b.add_mesh(create_plane())
    mat = b.add_material(Material((0.73, 0.73, 0.73, 1.0)))
    body = b.add_material(Material((0.8, 0.7, 0.5, 1.0)).roughness(0.4))
    b.add_instance(plane_id, mat, translation([0, -1, 0]) @ scale(2.0))
    b.register_quad_light(
        plane_id, translation([0, 0.99, 0]) @ rotation_x(PI) @ scale(0.5),
        [1.0, 1.0, 1.0], 10.0)
    s7 = b.add_mesh(create_sphere(7))            # 327,680 tris each
    for tx in (-0.6, 0.0, 0.6):
        b.add_instance(s7, body, translation([tx, -0.5, 0.0]) @ scale(0.42))
    return b.build(instancing="off")             # flatten: ~983k tris


def _time(fn, args, chain, n=6):
    out = fn(*args)
    sync_value(out)
    a = args
    t0 = time.time()
    for _ in range(n):
        out = fn(*a)
        a = chain(a, out)
    sync_value(out)
    return (time.time() - t0) / n * 1e3, out


def main():
    from tpu_raytracer.ops import pallas_trace, traversal

    scene = build_scene()
    print(f"scene tris={scene.num_triangles} "
          f"chunks={scene.chunk_aabb.shape[0]} "
          f"bvh_nodes={scene.bvh_rec.shape[0]}")

    r = 262144
    rng = np.random.default_rng(0)
    # incoherent: bounce-like rays from inside the scene volume
    ro_i = jnp.asarray(rng.uniform(-0.9, 0.9, (r, 3)).astype(np.float32))
    rd_i = rng.standard_normal((r, 3)).astype(np.float32)
    rd_i = jnp.asarray(rd_i / np.linalg.norm(rd_i, axis=-1, keepdims=True))
    # coherent: camera-like rays from one origin through a jittered grid
    px = rng.uniform(-0.5, 0.5, (r, 2)).astype(np.float32)
    rd_c = np.stack([px[:, 0], px[:, 1] - 0.3, np.full(r, -1.0, np.float32)],
                    axis=1)
    rd_c = jnp.asarray(rd_c / np.linalg.norm(rd_c, axis=-1, keepdims=True))
    ro_c = jnp.broadcast_to(jnp.asarray([0.0, 0.2, 2.5], jnp.float32),
                            (r, 3))

    def chain_o(args, out):
        o, d = args
        return (o + jnp.minimum(jnp.abs(out[:1]), 10.0) * 1e-9, d)

    for label, ro, rd in (("incoherent", ro_i, rd_i),
                          ("coherent  ", ro_c, rd_c)):
        base = None
        # swept path (coarse cull + segments); group width via the
        # standard mode resolution (mxuf2 -> mxus over the VMEM cap)
        fn_sweep = jax.jit(lambda o, d: pallas_trace.trace_brute_pallas(
            scene.tri_planes, scene.chunk_aabb, o, d, 1e-3, 100.0,
            kernel="mxuf2")["t"])
        # stream-BVH pointer walk (the current >512k default)
        fn_walk = jax.jit(lambda o, d: traversal.trace(
            scene.bvh_rec, scene.bvh_skip, scene.bvh_tri, o, d,
            1e-3, 100.0)["t"])
        for name, fn in (("walk ", fn_walk), ("sweep", fn_sweep)):
            try:
                dt, out = _time(fn, (ro, rd), chain_o)
            except Exception as e:
                print(f"  {label} {name} FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}")
                continue
            tt = np.asarray(out)
            if base is None:
                base = tt
                agree = 1.0
            else:
                agree = float((np.abs(tt - base) < 1e-3 * (1 + base)).mean())
            print(f"  {label} {name} {dt:8.2f} ms  t_agree={agree:.4f}")


if __name__ == "__main__":
    main()
