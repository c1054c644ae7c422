"""Benchmarks.

Default (driver) mode prints ONE JSON headline line:
Cornell Box ReSTIR at 512x512, exactly-counted Mrays/s per chip
(vs_baseline = ratio to the BASELINE.md 100 Mrays/s/chip north-star floor).

`--config N` (1..5) runs the BASELINE.md benchmark configs:
  1 Cornell diffuse-only, fixed camera, 512x512, 1 spp progressive
  2 Cornell specular/dielectric, accumulate toward 1024 spp (measured rate,
    extrapolated wall-clock)
  3 dense-mesh instancing scene (bunny-class), TLAS/BLAS two-level path
  4 interactive fly-through at 1080p with per-frame instance refit and
    accumulation reset
  5 4K render with the in-loop a-trous denoiser (OIDN screenshot analogue)
  6 dense textured mesh (~100k-tri procedural knot .glb through the real
    loader + full texture stack; DamagedHelmet-class workload)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def _measure_restir(scene, width, height, warmup, measured, move=False,
                    refit_transforms=None, refit_changed=None):
    from tpu_raytracer.ops import refit as refit_ops
    from tpu_raytracer.ops.pallas_trace import maybe_cap_stream_br
    from tpu_raytracer.render import camera as camera_mod
    from tpu_raytracer.render import pipeline, renderer
    from tpu_raytracer.utils.timing import sync_value

    # beyond-VMEM scenes cap a TUNED block size at the streamed route's
    # own measured optimum (PERF.md r5, config 6 regression)
    maybe_cap_stream_br(scene.tri_planes.shape[2],
                        instanced=bool(scene.instanced))

    cam = camera_mod.CameraController()
    state = pipeline.init_state(width, height)
    ray_counts = []               # device scalars; converted AFTER the clock
    t0 = None
    frame_count = 0
    for i in range(warmup + measured):
        if move:
            cam.press("d")
            cam.update(1.0 / 60.0)
            cam.release("d")
            frame_count = 0       # accumulation reset on motion
        if refit_transforms is not None:
            scene = refit_ops.update_instances(
                scene, refit_transforms(i, scene), changed=refit_changed)
        # replay-dedup eligibility: world unchanged since the last frame
        static_ok = (i > 0) and not move and refit_transforms is None
        uniform = renderer.camera_to_device(
            cam.uniform(width / height, frame_count, scene.num_lights))
        ldr, hdr, state, aux = pipeline.render_frame(
            scene, uniform, jnp.uint32(frame_count), state, width, height,
            static_ok=static_ok)
        frame_count += 1
        if i == warmup - 1:
            # VALUE-anchored boundary: block_until_ready can return
            # before the dispatch executes on this tunnel (jax 0.9 -
            # utils/timing.py r4 fact), so both window edges fetch a
            # reduction to host instead
            sync_value(ldr)
            t0 = time.time()
        elif i >= warmup:
            # keep the exact per-frame ray counter as a DEVICE scalar: a
            # float() here would block on the frame, and over the axon
            # tunnel that host sync costs a full RTT per frame and stops
            # successive frames from pipelining (async dispatch is the
            # product behavior - app/interactive.py reads telemetry a
            # frame late for the same reason)
            ray_counts.append(aux["rays"])
    sync_value(ldr)
    dt = time.time() - t0
    total_rays = sum(float(x) for x in ray_counts)
    return {"fps": measured / dt, "mrays": total_rays / dt / 1e6,
            "ms_per_frame": dt / measured * 1e3}


def headline():
    from tpu_raytracer.models import scenes

    scene = scenes.create_cornell_box()
    r = _measure_restir(scene, 512, 512, 2, 8)
    print(json.dumps({
        "metric": "cornell_restir_512x512_mrays_per_s_per_chip",
        "value": round(r["mrays"], 2),
        "unit": "Mrays/s",
        "vs_baseline": round(r["mrays"] / 100.0, 3),
        "detail": {"fps": round(r["fps"], 2),
                   "device": str(jax.devices()[0])},
    }))


def headline_tiled(n_tiles: int):
    """Multi-chip headline: the Cornell ReSTIR frame row-band-sharded over
    the first N devices (parallel/tiles.py). On a 1-chip host this only
    validates plumbing; on a pod slice it measures ICI scaling."""
    from tpu_raytracer.models import scenes
    from tpu_raytracer.parallel import tiles
    from tpu_raytracer.render import camera as camera_mod
    from tpu_raytracer.render import pipeline, renderer
    from tpu_raytracer.utils.timing import sync_value

    devs = jax.devices()
    if len(devs) < n_tiles:
        print(json.dumps({"error": f"--tiles {n_tiles} needs {n_tiles} "
                          f"devices, have {len(devs)}"}))
        return
    mesh = tiles.make_mesh(devs[:n_tiles])
    w = h = 512
    scene = tiles.replicate(scenes.create_cornell_box(), mesh)
    cam = camera_mod.CameraController()
    state = tiles.shard_state(pipeline.init_state(w, h), mesh)
    render = tiles.make_render_frame_tiled(mesh, w, h)
    warmup, measured = 2, 8
    total_rays, t0 = 0.0, None
    for i in range(warmup + measured):
        uniform = tiles.replicate(renderer.camera_to_device(
            cam.uniform(1.0, i, 2)), mesh)
        ldr, hdr, state, aux = render(scene, uniform, jnp.uint32(i), state,
                                      static_ok=i > 0)
        if i == warmup - 1:
            sync_value(ldr)        # value-anchored (utils/timing.py)
            t0 = time.time()
        elif i >= warmup:
            total_rays += float(aux["rays"])
    sync_value(ldr)
    dt = time.time() - t0
    print(json.dumps({
        "metric": f"cornell_restir_512x512_mrays_per_s_{n_tiles}tiles",
        "value": round(total_rays / dt / 1e6, 2),
        "unit": "Mrays/s",
        "detail": {"fps": round(measured / dt, 2), "tiles": n_tiles},
    }))


def config(n: int):
    from tpu_raytracer.models import scenes
    from tpu_raytracer.utils.timing import sync_value

    if n == 1:
        from tpu_raytracer.render import camera as camera_mod
        from tpu_raytracer.render import renderer

        scene = scenes.create_cornell_box_diffuse()
        w = h = 512
        cam = camera_mod.CameraController()
        accum = renderer.make_accum(w, h)
        t0 = None
        frames = 34
        for f in range(frames):
            uniform = renderer.camera_to_device(
                cam.uniform(1.0, f, scene.num_lights))
            accum, rad = renderer.render_progressive(
                scene, uniform, jnp.uint32(f), accum, w, h)
            if f == 1:
                sync_value(accum)  # value-anchored (utils/timing.py)
                t0 = time.time()
        sync_value(accum)
        dt = time.time() - t0
        out = {"config": 1, "fps_1spp_progressive": round((frames - 2) / dt, 2),
               "resolution": "512x512"}
    elif n == 2:
        # HONEST run: actually accumulate 1024 spp (frames) wall-clock,
        # including compile warmup excluded via 2 warmup frames.
        scene = scenes.create_cornell_box()
        r = _measure_restir(scene, 512, 512, 2, 1024)
        out = {"config": 2, "fps": round(r["fps"], 2),
               "measured_s_to_1024spp": round(1024 / r["fps"], 1),
               "mrays_per_s": round(r["mrays"], 2)}
    elif n == 3:
        scene = scenes.create_bunny_scene()
        r = _measure_restir(scene, 512, 512, 2, 8)
        out = {"config": 3, "fps": round(r["fps"], 2),
               "tris": scene.num_triangles,
               "mrays_per_s": round(r["mrays"], 2)}
    elif n == 4:
        scene = scenes.create_cornell_box()
        from tpu_raytracer.utils.math3d import (rotation_y, scale,
                                                translation)

        base = np.asarray(scene.inst_transform)

        def wobble(i, s):
            tf = base.copy()
            crystal = (translation([0.4, -0.5 + 0.02 * (i % 8), 0.3])
                       @ rotation_y(0.1 * i) @ scale(0.5))
            tf[6] = crystal[:3, :4]
            return jnp.asarray(tf)

        # only the crystal (instance 6) moves - the refit is restricted
        # to its triangle range (TLAS-update economics, builder.rs:454)
        r = _measure_restir(scene, 1920, 1080, 2, 6, move=True,
                            refit_transforms=wobble, refit_changed=(6,))
        out = {"config": 4, "fps_1080p_flythrough_refit": round(r["fps"], 3),
               "mrays_per_s": round(r["mrays"], 2)}
    elif n == 5:
        from tpu_raytracer.app.screenshot import denoised_screenshot
        from tpu_raytracer.render import camera as camera_mod
        from tpu_raytracer.render import pipeline, renderer

        from tpu_raytracer.ops.post import resolve_tonemap
        from tpu_raytracer.utils.image import psnr

        scene = scenes.create_cornell_box()
        # true 4K. jax 0.9's XLA:TPU scheduler cannot hold the whole
        # 3840x2160 frame as one program (22 GB of copy/prefetch temps
        # vs 15.75 GB HBM - the r4 regression), so huge frames render
        # as sequential row-band programs (pipeline.render_frame_banded,
        # bit-identical to render_frame); the 1440p fallback remains
        # only as a safety net.
        res_note = "3840x2160"
        for w, h in ((3840, 2160), (2560, 1440)):
            bands = pipeline.auto_bands(w, h)

            def render(scene_, u, fc, st, static_ok=False):
                if bands > 1:
                    return pipeline.render_frame_banded(
                        scene_, u, fc, st, w, h, bands,
                        static_ok=static_ok)
                return pipeline.render_frame(scene_, u, fc, st, w, h,
                                             static_ok=static_ok)

            try:
                cam = camera_mod.CameraController()
                state = pipeline.init_state(w, h)
                uniform = renderer.camera_to_device(
                    cam.uniform(w / h, 0, scene.num_lights))
                ldr, hdr, state, aux = render(
                    scene, uniform, jnp.uint32(0), state)
                sync_value(ldr)    # also forces a real OOM to surface
                res_note = f"{w}x{h}"
                break
            except Exception as e:  # noqa: BLE001 - HBM OOM
                print(f"# config 5: {w}x{h} failed "
                      f"({type(e).__name__}); retrying smaller",
                      file=sys.stderr)
        print(f"# config 5: {res_note} in {bands} row bands",
              file=sys.stderr)
        # warm the static_ok variant + the denoiser so the timed frame
        # measures steady-state work, not tunnel compiles
        uniform = renderer.camera_to_device(
            cam.uniform(w / h, 1, scene.num_lights))
        ldr, hdr, state, aux = render(
            scene, uniform, jnp.uint32(1), state, static_ok=True)
        sync_value(denoised_screenshot(state["gb"], hdr, w, h))
        t0 = time.time()
        uniform = renderer.camera_to_device(
            cam.uniform(w / h, 2, scene.num_lights))
        ldr, hdr, state, aux = render(
            scene, uniform, jnp.uint32(2), state, static_ok=True)
        den_img = denoised_screenshot(state["gb"], hdr, w, h)
        sync_value(den_img)
        dt = time.time() - t0
        den = np.asarray(resolve_tonemap(den_img))
        # quality AT THE RENDERED RESOLUTION: PSNR of the 3-spp denoised
        # image vs a 32-frame progressive accumulation of the same scene
        # (the OIDN-screenshot stand-in judged against converged ground
        # truth), both in tonemapped space.
        for f in range(3, 32):
            uq = renderer.camera_to_device(
                cam.uniform(w / h, f, scene.num_lights))
            ldr, hdr, state, _ = render(
                scene, uq, jnp.uint32(f), state, static_ok=True)
        ref = np.asarray(resolve_tonemap(state["accum"].reshape(h, w, 3)))
        q = psnr(den, ref)
        out = {"config": 5, "resolution": res_note,
               "s_per_denoised_frame": round(dt, 2),
               f"denoised_psnr_vs_32spp_{res_note}": round(float(q), 2)}
    elif n == 6:
        # dense textured mesh through the REAL product path: ~100k-tri
        # procedural knot .glb (models/dense_asset.py) -> glTF loader ->
        # full texture stack (base/normal/MR) -> beyond-VMEM streamed
        # intersector. Role-equivalent to the reference's DamagedHelmet
        # runs (src/scene/scenes.rs:334-347).
        scene = scenes.create_dense_knot_scene()
        r = _measure_restir(scene, 512, 512, 2, 4)
        out = {"config": 6, "fps": round(r["fps"], 3),
               "tris": scene.num_triangles,
               "mrays_per_s": round(r["mrays"], 2)}
    elif n == 7:
        # shared-BLAS two-level instancing on the device (VERDICT r3 item
        # 6): 100 instances of one ~5k-tri mesh through
        # trace_instanced_pallas (one object-space coef block + per
        # -instance inverse affines; src/scene/builder.rs:181-189
        # economics). Compare against config 3's flattened dense path.
        scene = scenes.create_instancing_gallery_scene()
        r = _measure_restir(scene, 512, 512, 2, 4)
        out = {"config": 7, "fps": round(r["fps"], 3),
               "tris": scene.num_triangles,
               "instanced": bool(scene.instanced),
               "mrays_per_s": round(r["mrays"], 2)}
    else:
        raise SystemExit(f"unknown config {n}")
    print(json.dumps(out))


def _fail_line(error: str) -> str:
    return json.dumps({
        "metric": "cornell_restir_512x512_mrays_per_s_per_chip",
        "value": 0.0, "unit": "Mrays/s", "vs_baseline": 0.0,
        "error": error,
    })


def _backend_watchdog(timeout_s: float = 600.0):
    """Emit ONE honest JSON line and exit if backend INIT hangs - then
    re-arm for the run itself.

    Two distinct axon failure modes, two timers (both observed in r3):
    - the tunnel's claim leg hangs at init when the terminal is down
      (>3 h observed); jax.devices() never returns. 600 s catches it -
      healthy init takes seconds.
    - the tunnel wedges MID-RUN after a healthy init (post-fault every
      dispatch hangs or raises UNAVAILABLE). Compiles via the tunnel
      legitimately take minutes on a cold cache, so this timer is much
      longer (BENCH_WATCHDOG_S, default 3300 s > the ladder's 2400 s
      external step timeout so it never fires first under the ladder).
    Either way the driver records an honest error line instead of
    nothing."""
    import os as _os
    import threading

    done = threading.Event()

    def _watch():
        if not done.wait(timeout_s):
            print(_fail_line(
                f"axon backend init exceeded {timeout_s:.0f}s "
                "(tunnel down) - no measurement possible"), flush=True)
            _os._exit(3)

    threading.Thread(target=_watch, daemon=True).start()
    jax.devices()
    done.set()

    run_s = float(_os.environ.get("BENCH_WATCHDOG_S", "3300"))

    def _watch_run():
        time.sleep(run_s)
        print(_fail_line(
            f"run exceeded {run_s:.0f}s after a healthy backend init "
            "(tunnel wedged mid-run?) - no measurement possible"),
            flush=True)
        _os._exit(4)

    threading.Thread(target=_watch_run, daemon=True).start()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=0,
                    help="BASELINE config 1-5 (+6: dense textured knot, "
                         "+7: instanced gallery); default: driver headline")
    ap.add_argument("--tiles", type=int, default=0,
                    help="run the headline sharded over N devices")
    args = ap.parse_args()
    # off-chip escape hatch (tests, tunnel-down debugging): the axon
    # plugin ignores the JAX_PLATFORMS env var, so force CPU the only
    # way that works - the config knob, before any backend use
    if os.environ.get("TPU_RT_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    # measured-winner gate defaults (TUNED.json; explicit env always wins;
    # must run before the first jit trace - gates are read at trace time)
    from tpu_raytracer.utils.tuned import apply_tuned
    _tuned = apply_tuned()
    if _tuned:
        print(f"# tuned gates: {_tuned}", file=sys.stderr)
    _backend_watchdog()
    if args.tiles:
        headline_tiled(args.tiles)
    elif args.config:
        config(args.config)
    else:
        headline()
