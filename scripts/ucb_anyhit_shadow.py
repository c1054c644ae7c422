"""Reproduce the any-hit quality regression with REAL shadow-ray
geometry: rays from G-buffer surface points toward light samples
(exactly the NEE setup of ops/path_trace.py:60-90)."""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tpu_raytracer.models import scenes
    from tpu_raytracer.ops import gbuffer as gb_ops
    from tpu_raytracer.ops import pallas_trace
    from tpu_raytracer.render import camera as camera_mod
    from tpu_raytracer.render import renderer
    from tpu_raytracer.utils import math3d

    scene = scenes.create_cornell_box()
    w = h = 64
    cam = camera_mod.CameraController()
    uniform = renderer.camera_to_device(cam.uniform(1.0, 0, scene.num_lights))
    gb = gb_ops.render_gbuffer(scene, uniform, w, h)

    pos = np.asarray(gb["pos"])
    normal = np.asarray(math3d.oct_decode(gb["oct_normal"]))
    valid = np.asarray(gb["valid"])
    r = pos.shape[0]

    rng = np.random.default_rng(1)
    lt = np.asarray(scene.light_table)
    li = rng.integers(0, scene.num_lights, r)
    row = lt[li]
    su = rng.uniform(-1, 1, (r, 1)).astype(np.float32)
    sv = rng.uniform(-1, 1, (r, 1)).astype(np.float32)
    lpos = row[:, 0:3] + row[:, 4:7] * su + row[:, 8:11] * sv

    off = pos + normal * 1e-3
    delta = lpos - off
    dist = np.linalg.norm(delta, axis=-1)
    ldir = delta / np.maximum(dist, 1e-12)[:, None]
    t_max = np.maximum(dist * 0.999, 0.0).astype(np.float32)

    ro = jnp.asarray(off.astype(np.float32))
    rd = jnp.asarray(ldir.astype(np.float32))
    tm = jnp.asarray(t_max)
    act = jnp.asarray(valid)

    ref = pallas_trace.trace_brute_pallas(
        scene.tri_planes, scene.chunk_aabb, ro, rd, 1e-3, tm,
        kernel="vpu", active=act)
    ref_hit = np.asarray(ref["tri"]) >= 0
    print(f"vpu: occluded={ref_hit[valid].mean():.4f} of {valid.sum()} valid")

    for mode in ("any2", "mxuf2"):
        out = pallas_trace.trace_brute_pallas(
            scene.tri_planes, scene.chunk_aabb, ro, rd, 1e-3, tm,
            any_hit=(mode.startswith("any")), kernel=mode, active=act)
        got_hit = np.asarray(out["tri"]) >= 0
        m = valid
        agree = (ref_hit[m] == got_hit[m]).mean()
        fp = (got_hit[m] & ~ref_hit[m]).mean()
        fn = (~got_hit[m] & ref_hit[m]).mean()
        print(f"{mode}: agree={agree:.4f} false_occl={fp:.4f} "
              f"missed_occl={fn:.4f}")
        if agree < 0.999:
            bad = np.where(m & (ref_hit != got_hit))[0][:5]
            for i in bad:
                print(f"  lane {i}: o={off[i]} d={ldir[i]} tmax={t_max[i]}"
                      f" ref={ref_hit[i]} got={got_hit[i]}"
                      f" ref_t={np.asarray(ref['t'])[i]:.4f}")


if __name__ == "__main__":
    main()
