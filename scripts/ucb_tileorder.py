"""Hypothesis test: does 16x16-tile pixel order (vs row-major) shrink
per-block chunk worklists and sweep time? Primary camera rays + NEE-like
shadow rays, Cornell and bunny, permutation applied HOST-side (cost of
the permutation itself measured separately by ucb_perm.py)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def tile_perm(w, h, ts=16):
    """Row-major index -> tile-major order permutation."""
    y, x = np.mgrid[0:h, 0:w]
    key = ((y // ts) * (w // ts + 1) + (x // ts)) * (ts * ts) \
        + (y % ts) * ts + (x % ts)
    return np.argsort(key.reshape(-1), kind="stable")


def bench(fn, ro, rd, iters=10):
    out = fn(ro, rd)
    jax.block_until_ready(out)
    o = ro
    t0 = time.time()
    for _ in range(iters):
        out = fn(o, rd)
        o = o + jnp.minimum(jnp.abs(out[:1]), 100.0) * 1e-9
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3


def main():
    from tpu_raytracer.models import scenes
    from tpu_raytracer.ops import gbuffer as gb_ops
    from tpu_raytracer.ops import pallas_trace
    from tpu_raytracer.render import camera as camera_mod
    from tpu_raytracer.render import renderer
    from tpu_raytracer.utils import math3d

    w = h = 512
    perm = tile_perm(w, h)

    for name, ctor in (("cornell", scenes.create_cornell_box),
                       ("bunny", scenes.create_bunny_scene)):
        scene = ctor()
        cam = camera_mod.CameraController()
        uniform = renderer.camera_to_device(
            cam.uniform(1.0, 0, scene.num_lights))
        from tpu_raytracer.ops.gbuffer import generate_primary_rays

        gb = gb_ops.render_gbuffer(scene, uniform, w, h)
        pos = np.asarray(gb["pos"])
        normal = np.asarray(math3d.oct_decode(gb["oct_normal"]))
        valid = np.asarray(gb["valid"])

        # EXACT primary rays of the gbuffer pass (no NaNs for miss px)
        ro_j, rd_j = generate_primary_rays(uniform, w, h)
        o = np.asarray(ro_j)
        d = np.asarray(rd_j)
        pos = np.where(valid[:, None], pos, 0.0)

        # shadow rays to light 0
        lp = np.asarray(scene.light_table)[0, 0:3]
        sd = lp[None] - (pos + normal * 1e-3)
        sdist = np.linalg.norm(sd, axis=-1)
        sdir = (sd / np.maximum(sdist, 1e-9)[:, None]).astype(np.float32)
        so = (pos + normal * 1e-3).astype(np.float32)
        stmax = np.where(valid, sdist * 0.999, 0.0).astype(np.float32)

        def closest(oo, dd):
            return pallas_trace.trace_brute_pallas(
                scene.tri_planes, scene.chunk_aabb, oo, dd, 1e-3, 100.0)["t"]

        def occl(oo, dd, tm):
            return pallas_trace.trace_brute_pallas(
                scene.tri_planes, scene.chunk_aabb, oo, dd, 1e-3,
                jnp.asarray(tm), any_hit=True)["tri"].astype(jnp.float32)

        jc = jax.jit(closest)
        for label, p in (("rowmajor", None), ("tile16", perm)):
            oo = o if p is None else o[p]
            dd = d if p is None else d[p]
            dt = bench(jc, jnp.asarray(oo), jnp.asarray(dd))
            print(f"{name:8s} primary {label:9s} {dt:7.2f} ms")
        jo = jax.jit(lambda oo, dd, tm: occl(oo, dd, tm))
        for label, p in (("rowmajor", None), ("tile16", perm)):
            oo = jnp.asarray(so if p is None else so[p])
            dd = jnp.asarray(sdir if p is None else sdir[p])
            tm = jnp.asarray(stmax if p is None else stmax[p])
            out = jo(oo, dd, tm)
            jax.block_until_ready(out)
            t0 = time.time()
            for _ in range(10):
                out = jo(oo, dd, tm + 1e-9 * jnp.minimum(jnp.abs(out[:1]), 100.0))
            jax.block_until_ready(out)
            print(f"{name:8s} shadow  {label:9s} "
                  f"{(time.time()-t0)/10*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
