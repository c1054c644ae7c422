"""Validate + time the HBM-streamed kernel (mxus) on real large scenes:
~61k tris (3x icosphere-5 instances) and ~92k tris (icosphere-6 +
2x icosphere-4) - both past the 32k VMEM-resident coef cap."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_raytracer.utils.timing import sync_value


def build_scene(big=False):
    from tpu_raytracer.models.scenes import PI
    from tpu_raytracer.scene.builder import SceneBuilder
    from tpu_raytracer.scene.geometry import create_plane, create_sphere
    from tpu_raytracer.scene.material import Material
    from tpu_raytracer.utils.math3d import (rotation_x, scale, translation)

    b = SceneBuilder()
    plane_id = b.add_mesh(create_plane())
    mat = b.add_material(Material((0.73, 0.73, 0.73, 1.0)))
    body = b.add_material(Material((0.8, 0.7, 0.5, 1.0)).roughness(0.4))
    b.add_instance(plane_id, mat, translation([0, -1, 0]) @ scale(2.0))
    b.register_quad_light(
        plane_id, translation([0, 0.99, 0]) @ rotation_x(PI) @ scale(0.5),
        [1.0, 1.0, 1.0], 10.0)
    if big:
        s6 = b.add_mesh(create_sphere(6))
        s4 = b.add_mesh(create_sphere(4))
        b.add_instance(s6, body, translation([0, -0.4, 0]) @ scale(0.7))
        b.add_instance(s4, body, translation([-0.6, -0.8, 0.4]) @ scale(0.3))
        b.add_instance(s4, body, translation([0.6, -0.8, -0.4]) @ scale(0.3))
    else:
        s5 = b.add_mesh(create_sphere(5))
        for tx in (-0.6, 0.0, 0.6):
            b.add_instance(s5, body,
                           translation([tx, -0.6, 0.0]) @ scale(0.45))
    return b.build()


def main():
    from tpu_raytracer.ops import pallas_trace

    r = 262144
    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.uniform(-0.9, 0.9, (r, 3)).astype(np.float32))
    rd = rng.standard_normal((r, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))

    for big in (False, True):
        scene = build_scene(big)
        t = scene.num_triangles
        print(f"scene tris={t}")
        base = None
        for mode in ("vpu", "mxuf2"):      # mxuf2 -> mxus8 over the cap
            fn = jax.jit(lambda o, d, m=mode: pallas_trace.trace_brute_pallas(
                scene.tri_planes, scene.chunk_aabb, o, d, 1e-3, 100.0,
                kernel=m)["t"])
            try:
                out = fn(ro, rd)
                sync_value(out)
            except Exception as e:
                print(f"  {mode} FAILED: {type(e).__name__}: {str(e)[:120]}")
                continue
            o = ro
            t0 = time.time()
            for _ in range(8):
                out = fn(o, rd)
                o = o + jnp.minimum(jnp.abs(out[:1]), 10.0) * 1e-9
            sync_value(out)
            dt = (time.time() - t0) / 8 * 1e3
            tt = np.asarray(out)
            if base is None:
                base = tt
                agree = 1.0
            else:
                agree = float((np.abs(tt - base) < 1e-3 * (1 + base)).mean())
            print(f"  {mode:6s} {dt:8.2f} ms  t_agree={agree:.4f}")

        # any-hit (occlusion) streamed variant: early all-occluded exit,
        # no argmin/division (r3). t_max bounded like NEE shadow rays.
        fn_any = jax.jit(
            lambda o, d: pallas_trace.trace_brute_pallas(
                scene.tri_planes, scene.chunk_aabb, o, d, 1e-3, 2.0,
                any_hit=True, kernel="mxuf2")["tri"] >= 0)
        hit = fn_any(ro, rd)
        sync_value(hit)
        o = ro
        t0 = time.time()
        for _ in range(8):
            hit = fn_any(o, rd)
            o = o + jnp.where(hit[:1], 1e-9, 2e-9)
        sync_value(hit)
        dt = (time.time() - t0) / 8 * 1e3
        print(f"  anyhit {dt:8.2f} ms  occluded={float(hit.mean()):.3f}")


if __name__ == "__main__":
    main()
