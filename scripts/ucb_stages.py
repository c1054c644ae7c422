"""Per-stage + per-frame diagnostics at 512x512 on the real chip.

Prints per frame: total ms, cached-lane fraction (replay dedup hit rate),
exact ray count. With --stages, times each pass separately (jitted alone;
slightly different fusion than the full frame but directionally right).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--scene", default="cornell")
    ap.add_argument("--no-static", action="store_true")
    args = ap.parse_args()

    from tpu_raytracer.models import scenes
    from tpu_raytracer.render import camera as camera_mod
    from tpu_raytracer.render import pipeline, renderer

    scene = getattr(scenes, {
        "cornell": "create_cornell_box",
        "bunny": "create_bunny_scene",
        "restir": "create_restir_scene",
    }[args.scene])()
    w = h = args.size
    cam = camera_mod.CameraController()
    state = pipeline.init_state(w, h)
    for f in range(args.frames):
        static_ok = (f > 0) and not args.no_static
        uniform = renderer.camera_to_device(
            cam.uniform(1.0, f, scene.num_lights))
        t0 = time.time()
        ldr, hdr, state, aux = pipeline.render_frame(
            scene, uniform, jnp.uint32(f), state, w, h, static_ok=static_ok)
        jax.block_until_ready(ldr)
        dt = (time.time() - t0) * 1e3
        cached = float(aux["cached"]) / max(float(aux["lanes"]), 1.0)
        print(f"frame {f:2d}: {dt:8.1f} ms  cached={cached:5.1%}"
              f"  rays={float(aux['rays'])/1e6:6.2f}M")


if __name__ == "__main__":
    main()
