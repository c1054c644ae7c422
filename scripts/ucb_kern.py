"""A/B the intersector kernel variants on the real chip (Cornell scene,
262k incoherent rays, chained inputs)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_raytracer.utils.timing import sync_value


def main():
    from tpu_raytracer.models import scenes
    from tpu_raytracer.ops import pallas_trace

    scene = (scenes.create_bunny_scene() if "--bunny" in sys.argv
             else scenes.create_cornell_box())
    r = 262144
    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.uniform(-0.9, 0.9, (r, 3)).astype(np.float32))
    rd = rng.standard_normal((r, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))

    base = None
    # VMEM hazard gate: a [BR, 4*CT*grp] f32 window product past ~8.4 MB
    # FAULTS the kernel and can wedge the axon tunnel for hours
    # (PERF.md r3). The envelope lives in ONE place - pallas_trace
    # (_mxus_grp + the mxuv half-width rule in _vmem_cap_mode); asking
    # for a mode and checking what the clamp returns keeps this sweep
    # honest if the validated ceiling ever changes.
    modes = ["vpu", "mxu3"]
    for g in (1, 2, 4, 8):
        for m in (f"mxuf{g}", f"mxuv{g}"):
            if pallas_trace._vmem_cap_mode(m) == m:
                modes.append(m)
    modes += ["mxuw2", "mxuw4"]
    for mode in modes:
        fn = jax.jit(lambda o, d, m=mode: pallas_trace.trace_brute_pallas(
            scene.tri_planes, scene.chunk_aabb, o, d, 1e-3, 100.0,
            kernel=m)["t"])
        try:
            out = fn(ro, rd)
            sync_value(out)        # value-anchored (utils/timing.py)
        except Exception as e:
            print(f"{mode:6s} FAILED: {type(e).__name__}")
            continue
        iters = 12
        o = ro
        t0 = time.time()
        for _ in range(iters):
            out = fn(o, rd)
            o = o + out[:1] * 1e-9
        sync_value(out)
        dt = (time.time() - t0) / iters * 1e3
        tt = np.asarray(out)
        if base is None:
            base = tt
            agree = 1.0
        else:
            agree = float((np.abs(tt - base) < 1e-3 * (1 + base)).mean())
        print(f"{mode:6s} {dt:7.2f} ms  t_agree={agree:.4f}")


if __name__ == "__main__":
    main()
