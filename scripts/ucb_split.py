"""Per-stage frame-time split at 512x512 on the real chip.

Times each pass jitted SEPARATELY with realistic inputs (fusion across
stage boundaries is lost, so the parts can sum above the fused frame -
directionally right). Chained inputs to defeat tunnel dedup.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, *args, iters=6, chain=None):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    a = list(args)
    for i in range(iters):
        out = fn(*a)
        if chain is not None:
            a = chain(a, out, i)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.time() - t0) / iters * 1e3:8.2f} ms")
    return out


def main():
    from tpu_raytracer.models import scenes
    from tpu_raytracer.ops import gbuffer as gb_ops
    from tpu_raytracer.ops import path_trace, restir as restir_ops
    from tpu_raytracer.ops import post as post_ops
    from tpu_raytracer.parallel import views as views_mod
    from tpu_raytracer.render import camera as camera_mod
    from tpu_raytracer.render import pipeline, renderer
    from tpu_raytracer.utils import rng

    w = h = 512
    scene = scenes.create_cornell_box()
    cam = camera_mod.CameraController()
    uniform = renderer.camera_to_device(cam.uniform(1.0, 3, scene.num_lights))
    state = pipeline.init_state(w, h)
    ctx = restir_ops.make_ctx(w, h)

    def mv(flat):
        return views_mod.trivial_view(flat, w, h)

    # warm full frames to get a realistic state
    for f in range(3):
        u = renderer.camera_to_device(cam.uniform(1.0, f, scene.num_lights))
        ldr, hdr, state, aux = pipeline.render_frame(
            scene, u, jnp.uint32(f), state, w, h, static_ok=f > 0)
    jax.block_until_ready(ldr)

    t0 = time.time()
    for f in range(3, 9):
        u = renderer.camera_to_device(cam.uniform(1.0, f, scene.num_lights))
        ldr, hdr, state, aux = pipeline.render_frame(
            scene, u, jnp.uint32(f), state, w, h, static_ok=True)
    jax.block_until_ready(ldr)
    print(f"{'FULL FRAME (static dedup)':28s} {(time.time()-t0)/6*1e3:8.2f} ms")

    gbuf = jax.jit(lambda s, u: gb_ops.render_gbuffer(s, u, w, h))
    gb = bench("gbuffer", gbuf, scene, uniform,
               chain=lambda a, o, i: a)

    gbp = gb_ops.pack_gb(gb)
    seeds = rng.pcg_hash(jnp.arange(w * h, dtype=jnp.uint32))

    tp = jax.jit(lambda s, g, sd: path_trace.trace_path(
        s, g, uniform["view_pos"][:3], sd))
    bench("trace_path (1 full path)", tp, scene, gb, seeds,
          chain=lambda a, o, i: [a[0], a[1], o["radiance"][:, 0].astype(
              jnp.uint32) + a[2] + jnp.uint32(i)])

    temporal = jax.jit(lambda s, g, pc, u, fc: restir_ops.restir_temporal(
        s, g, mv(pc), u, fc, ctx, static_ok=True))
    prev_comb = jnp.concatenate([state["gb"], state["res"]], axis=-1)
    res_t, _ = bench("restir_temporal (cand+reuse)", temporal, scene, gb,
                     prev_comb, uniform, jnp.uint32(5),
                     chain=lambda a, o, i: a[:4] + [jnp.uint32(5 + i)])

    spatial = jax.jit(lambda s, g, c, r, u, fc: restir_ops.restir_spatial(
        s, g, mv(c), r, u, fc, ctx))
    comb_t = jnp.concatenate(
        [gbp, restir_ops.pack_reservoirs(res_t)], axis=-1)
    out = bench("restir_spatial (reuse+replay)", spatial, scene, gb, comb_t,
                res_t, uniform, jnp.uint32(5),
                chain=lambda a, o, i: a[:5] + [jnp.uint32(5 + i)])
    hdr = out[1]

    post = jax.jit(lambda hv, g, gv, av, fc: post_ops.post_process(
        mv(hv), g, mv(gv), mv(av), fc, ctx))
    bench("post (bilateral+TAA)", post, hdr, gb, gbp, state["accum"],
          jnp.uint32(5), chain=lambda a, o, i: a[:4] + [jnp.uint32(5 + i)])


if __name__ == "__main__":
    main()
