"""Diagnose the rowmajor-vs-tile16 22x anomaly: same compiled kernel,
permuted inputs. Print worklist count stats for both orders and time the
vpu + mxuf2 kernels on both."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ucb_tileorder import tile_perm


def main():
    from tpu_raytracer.models import scenes
    from tpu_raytracer.ops import pallas_trace as pt
    from tpu_raytracer.ops.gbuffer import generate_primary_rays
    from tpu_raytracer.render import camera as camera_mod
    from tpu_raytracer.render import renderer

    w = h = 512
    perm = tile_perm(w, h)
    scene = scenes.create_cornell_box()
    cam = camera_mod.CameraController()
    uniform = renderer.camera_to_device(cam.uniform(1.0, 0, scene.num_lights))
    ro, rd = generate_primary_rays(uniform, w, h)
    o = np.asarray(ro)
    d = np.asarray(rd)

    BR, CT = pt.BR, pt.CT
    for label, p in (("rowmajor", None), ("tile16", perm)):
        oo = o if p is None else o[p]
        dd = d if p is None else d[p]
        r = oo.shape[0]
        nb = r // BR
        # replicate the prepass counts
        inv_d = 1.0 / np.where(np.abs(dd) < 1e-12,
                               np.where(dd < 0, -1e-12, 1e-12), dd)
        aabb = np.asarray(scene.chunk_aabb)
        a = (aabb[None, :, 0:3] - oo[:, None]) * inv_d[:, None]
        b = (aabb[None, :, 3:6] - oo[:, None]) * inv_d[:, None]
        t_en = np.maximum(np.minimum(a, b).max(axis=-1), 1e-3)
        t_ex = np.minimum(np.maximum(a, b).min(axis=-1), 100.0)
        hit = t_en <= t_ex                         # [R, NC]
        blk = hit.reshape(nb, BR, -1).any(axis=1)  # [nb, NC]
        nc = blk.shape[1]
        grp_hit = blk.reshape(nb, (nc + 1) // 2, -1).any(axis=2) \
            if nc % 2 == 0 else None
        counts = blk.sum(axis=1)
        print(f"{label}: NC={nc} counts mean={counts.mean():.2f} "
              f"max={counts.max()} p50={np.median(counts):.0f}")

        for mode in ("vpu", "mxuf2", "mxu3"):
            fn = jax.jit(lambda a_, b_, m=mode: pt.trace_brute_pallas(
                scene.tri_planes, scene.chunk_aabb, a_, b_, 1e-3, 100.0,
                kernel=m)["t"])
            ooj, ddj = jnp.asarray(oo), jnp.asarray(dd)
            out = fn(ooj, ddj)
            jax.block_until_ready(out)
            t0 = time.time()
            oc = ooj
            for _ in range(8):
                out = fn(oc, ddj)
                oc = oc + jnp.minimum(jnp.abs(out[:1, None]), 100.0) * 1e-9
            jax.block_until_ready(out)
            print(f"  {mode:6s} {(time.time()-t0)/8*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
