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

from tpu_raytracer.utils.timing import sync_value


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--width", type=int, default=0)
    ap.add_argument("--height", type=int, default=0)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--scene", default="cornell")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--config4", action="store_true",
                    help="profile the BASELINE config-4 flow: 1920x1080, "
                         "camera motion + crystal refit + accumulation "
                         "reset every frame (bench.py config 4)")
    args = ap.parse_args()

    import numpy as np

    from tpu_raytracer.models import scenes
    from tpu_raytracer.ops import refit as refit_ops
    from tpu_raytracer.render import camera as camera_mod
    from tpu_raytracer.render import pipeline, renderer
    from tpu_raytracer.utils.math3d import rotation_y, scale, translation

    scene = getattr(scenes, {
        "cornell": "create_cornell_box",
        "bunny": "create_bunny_scene",
        "restir": "create_restir_scene",
    }[args.scene])()
    if args.config4:
        w = args.width or 1920
        h = args.height or 1080
    else:
        w = args.width or args.size
        h = args.height or args.size
    base = np.asarray(scene.inst_transform)

    def wobble(i):
        tf = base.copy()
        crystal = (translation([0.4, -0.5 + 0.02 * (i % 8), 0.3])
                   @ rotation_y(0.1 * i) @ scale(0.5))
        tf[6] = crystal[:3, :4]
        return jnp.asarray(tf)

    cam = camera_mod.CameraController()
    state = pipeline.init_state(w, h)

    def step(scene, i, state):
        if args.config4:
            cam.press("d")
            cam.update(1.0 / 60.0)
            cam.release("d")
            scene = refit_ops.update_instances(scene, wobble(i),
                                               changed=(6,))
        fc = 0 if args.config4 else i
        u = renderer.camera_to_device(
            cam.uniform(w / h, fc, scene.num_lights))
        ldr, hdr, state, aux = pipeline.render_frame(
            scene, u, jnp.uint32(fc), state, w, h,
            static_ok=(not args.config4) and i > 0)
        return scene, ldr, state

    for f in range(3):
        scene, ldr, state = step(scene, f, state)
    sync_value(ldr)               # value-anchored (utils/timing.py)

    shutil.rmtree("/tmp/rt_trace", ignore_errors=True)
    with jax.profiler.trace("/tmp/rt_trace"):
        for f in range(3, 3 + args.frames):
            scene, ldr, state = step(scene, f, state)
        # the profiler context must stay open until the work has REALLY
        # run (block_until_ready returns early on this tunnel - a trace
        # closed on it records a truncated timeline)
        sync_value(ldr)

    path = sorted(glob.glob("/tmp/rt_trace/**/*.trace.json.gz",
                            recursive=True))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    names = {e["pid"]: e["args"].get("name", "") for e in ev
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = collections.Counter()
    n_exec = 0
    for e in ev:
        if e.get("ph") == "X" and "dur" in e \
                and "TPU" in names.get(e.get("pid"), ""):
            dur[e["name"]] += e["dur"]
            if e["name"].startswith("jit_render_frame"):
                n_exec += 1
    # r4 fact: the trace frequently records only SOME of the dispatched
    # module executions (1 of 8 observed) - dividing by the REQUESTED
    # frame count silently produced a 3x-too-fast fantasy profile (the
    # "295 ms frame" that was really 885 ms). Divide by the number of
    # module executions actually present in the trace.
    n = max(n_exec, 1)
    print(f"per-frame device ms over {n} RECORDED frame executions "
          f"(requested {args.frames}; {args.scene} {w}x{h}):")
    for name, d in dur.most_common(args.top):
        print(f"{d / 1e3 / n:10.2f} ms  {name[:90]}")


if __name__ == "__main__":
    main()
