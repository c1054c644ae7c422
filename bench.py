"""Headline benchmark: Cornell Box ReSTIR, Mrays/s/chip sustained.

Runs the full flagship pipeline (G-buffer -> ReSTIR temporal -> spatial ->
post) on the real device and reports exactly-counted traversal queries per
second (primary + bounce + NEE shadow + spatial visibility + replay rays).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the BASELINE.md north-star floor of 100 Mrays/s/chip.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    from tpu_raytracer.models import scenes
    from tpu_raytracer.render import camera as camera_mod
    from tpu_raytracer.render import pipeline, renderer

    width = height = 512
    warmup, measured = 2, 8

    scene = scenes.create_cornell_box()
    cam = camera_mod.CameraController()
    state = pipeline.init_state(width, height)

    total_rays = 0.0
    t0 = None
    for frame in range(warmup + measured):
        uniform = renderer.camera_to_device(
            cam.uniform(width / height, frame, scene.num_lights))
        ldr, hdr, state, aux = pipeline.render_frame(
            scene, uniform, jnp.uint32(frame), state, width, height)
        if frame == warmup - 1:
            jax.block_until_ready(ldr)
            t0 = time.time()
        elif frame >= warmup:
            total_rays += float(aux["rays"])
    jax.block_until_ready(ldr)
    dt = time.time() - t0

    mrays = total_rays / dt / 1e6
    fps = measured / dt
    print(json.dumps({
        "metric": f"cornell_restir_{width}x{height}_mrays_per_s_per_chip",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 3),
        "detail": {"fps": round(fps, 2), "frames": measured,
                   "rays": int(total_rays),
                   "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()
