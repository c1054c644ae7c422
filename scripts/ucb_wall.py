"""Split the headline frame's wall time: host dispatch vs device busy (r4).

The honest bench says 890 ms/frame wall; the profiler says 295 ms device.
ucb_rtt.py ruled out tunnel RTT (~3 ms/dispatch). This measures, in ONE
process over the SAME chained frame loop:

  - per-frame host time of the dispatch call itself (does render_frame
    block the host?)
  - total wall of the window (value-anchored)
  - the profiler's device-op total for the same frames

If dispatches return fast and the window is still ~890 ms/frame, the gap
is device-side (queue idle or unattributed device time). If each dispatch
BLOCKS ~600 ms, the serializer is host-side (donation, transfers, ...).
"""

import collections
import glob
import gzip
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tpu_raytracer.utils.timing import sync_value


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    from tpu_raytracer.models import scenes
    from tpu_raytracer.render import camera as camera_mod
    from tpu_raytracer.render import pipeline, renderer

    scene = scenes.create_cornell_box()
    w = h = 512
    cam = camera_mod.CameraController()
    state = pipeline.init_state(w, h)

    def step(i, state):
        u = renderer.camera_to_device(cam.uniform(1.0, i, scene.num_lights))
        ldr, hdr, state, aux = pipeline.render_frame(
            scene, u, jnp.uint32(i), state, w, h, static_ok=i > 0)
        return ldr, state, aux

    for i in range(2):
        ldr, state, aux = step(i, state)
    sync_value(ldr)

    t0 = time.time()
    host_ts = []
    counts = []
    for i in range(2, 2 + frames):
        ta = time.time()
        ldr, state, aux = step(i, state)
        host_ts.append(time.time() - ta)
        counts.append(aux["rays"])
    t_loop = time.time() - t0
    sync_value(ldr)
    t_all = time.time() - t0
    rays = sum(float(x) for x in counts)
    print(f"host loop: {t_loop * 1e3:8.1f} ms total "
          f"({t_loop / frames * 1e3:.1f} ms/frame dispatch)")
    print("per-dispatch host ms:",
          " ".join(f"{x * 1e3:.0f}" for x in host_ts))
    print(f"window wall: {t_all * 1e3:8.1f} ms "
          f"({t_all / frames * 1e3:.1f} ms/frame) "
          f"-> {rays / t_all / 1e6:.2f} Mrays/s")

    # same frames under the profiler
    import shutil
    shutil.rmtree("/tmp/rt_wall_trace", ignore_errors=True)
    t0 = time.time()
    with jax.profiler.trace("/tmp/rt_wall_trace"):
        for i in range(2 + frames, 2 + 2 * frames):
            ldr, state, aux = step(i, state)
        sync_value(ldr)
    t_prof = time.time() - t0
    path = sorted(glob.glob("/tmp/rt_wall_trace/**/*.trace.json.gz",
                            recursive=True))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    names = {e["pid"]: e["args"].get("name", "") for e in ev
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    # total device-attributed op time + the span of the module executions
    dur = collections.Counter()
    spans = []
    for e in ev:
        if e.get("ph") == "X" and "dur" in e \
                and "TPU" in names.get(e.get("pid"), ""):
            dur[e["name"]] += e["dur"]
            if e["name"].startswith("jit_render_frame"):
                spans.append((e["ts"], e["ts"] + e["dur"]))
    mod_total = sum(d for n, d in dur.items()
                    if n.startswith("jit_render_frame"))
    print(f"profiled window wall: {t_prof * 1e3:8.1f} ms "
          f"({t_prof / frames * 1e3:.1f} ms/frame)")
    print(f"device module total: {mod_total / 1e3:8.1f} ms "
          f"({mod_total / 1e3 / frames:.1f} ms/frame)")
    if spans:
        spans.sort()
        gaps = [b[0] - a[1] for a, b in zip(spans, spans[1:])]
        span_total = (spans[-1][1] - spans[0][0]) / 1e3
        print(f"module span (first start -> last end): {span_total:8.1f} ms; "
              f"inter-module gaps ms: "
              + " ".join(f"{g / 1e3:.0f}" for g in gaps))
    # what ELSE shows up on the TPU track besides the module?
    other = [(n, d) for n, d in dur.most_common(40)
             if not n.startswith("jit_render_frame")]
    print("top non-module TPU-track events (total ms over window):")
    for n, d in other[:12]:
        print(f"{d / 1e3:10.2f} ms  {n[:80]}")


if __name__ == "__main__":
    main()
