"""Profile N frames with jax.profiler and print per-op device time.

THE trustworthy timing tool on the axon tunnel (PERF.md): separately
jitted stage benches get deduped or distorted; the profiler reports real
on-device op durations inside the fused frame.

Usage: python scripts/ucb_profile.py [--size 512] [--frames 3]
"""

import argparse
import collections
import glob
import gzip
import json
import shutil
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--scene", default="cornell")
    ap.add_argument("--top", type=int, default=25)
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
    for f in range(3):
        u = renderer.camera_to_device(cam.uniform(1.0, f, scene.num_lights))
        ldr, hdr, state, aux = pipeline.render_frame(
            scene, u, jnp.uint32(f), state, w, h, static_ok=f > 0)
    jax.block_until_ready(ldr)

    shutil.rmtree("/tmp/rt_trace", ignore_errors=True)
    with jax.profiler.trace("/tmp/rt_trace"):
        for f in range(3, 3 + args.frames):
            u = renderer.camera_to_device(
                cam.uniform(1.0, f, scene.num_lights))
            ldr, hdr, state, aux = pipeline.render_frame(
                scene, u, jnp.uint32(f), state, w, h, static_ok=True)
        jax.block_until_ready(ldr)

    path = sorted(glob.glob("/tmp/rt_trace/**/*.trace.json.gz",
                            recursive=True))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    names = {e["pid"]: e["args"].get("name", "") for e in ev
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e \
                and "TPU" in names.get(e.get("pid"), ""):
            dur[e["name"]] += e["dur"]
    n = args.frames
    print(f"per-frame device ms over {n} frames ({args.scene} {w}x{h}):")
    for name, d in dur.most_common(args.top):
        print(f"{d / 1e3 / n:10.2f} ms  {name[:90]}")


if __name__ == "__main__":
    main()
