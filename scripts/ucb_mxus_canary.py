"""Tiny first-contact canary for the HBM-streamed kernel (mxus).

The r3 fix to the mxus front-to-back early-exit DMA drain (wait the slot
of the copy actually in flight, ops/pallas_trace.py) is UNPROVABLE in
interpret mode - the old bug would HANG only on real hardware and
plausibly contributed to the r3 config-6 tunnel wedge. Per VERDICT r3
item 2, the first on-chip mxus contact each session must be THIS tiny
dispatch - small ray count, forced early exit - not a long dense-scene
sweep, so a fault (if any) costs seconds of evidence, not the round.

Three dispatches, each checked against the vpu reference kernel:
  1. closest-hit, rays 1e-2 above the floor pointing DOWN: every block's
     best t is tiny, every later unit's entry is beyond it -> the early
     exit + drain runs in (nearly) every block.
  2. closest-hit, mixed rays (floor + spheres + misses).
  3. any-hit on the down rays: the all-occluded early exit + drain.
Exit code 0 only if all three agree exactly and a trailing trivial
dispatch confirms the tunnel is still healthy.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from tpu_raytracer.utils.timing import sync_value


def build_scene():
    from tpu_raytracer.models.scenes import PI
    from tpu_raytracer.scene.builder import SceneBuilder
    from tpu_raytracer.scene.geometry import create_plane, create_sphere
    from tpu_raytracer.scene.material import Material
    from tpu_raytracer.utils.math3d import rotation_x, scale, translation

    b = SceneBuilder()
    plane_id = b.add_mesh(create_plane())
    mat = b.add_material(Material((0.73, 0.73, 0.73, 1.0)))
    body = b.add_material(Material((0.8, 0.7, 0.5, 1.0)).roughness(0.4))
    b.add_instance(plane_id, mat, translation([0, -1, 0]) @ scale(2.0))
    b.register_quad_light(
        plane_id, translation([0, 0.99, 0]) @ rotation_x(PI) @ scale(0.5),
        [1.0, 1.0, 1.0], 10.0)
    s5 = b.add_mesh(create_sphere(5))
    b.add_instance(s5, body, translation([-0.4, -0.4, 0]) @ scale(0.5))
    b.add_instance(s5, body, translation([0.5, -0.3, 0.2]) @ scale(0.4))
    return b.build()


def main():
    from tpu_raytracer.ops import pallas_trace

    scene = build_scene()
    tp = scene.tri_planes.shape[2]
    assert tp > pallas_trace.MXUF_MAX_TP, (
        f"canary scene too small to engage mxus: {tp}")
    print(f"canary scene tris={scene.num_triangles} (padded {tp})")

    import os

    r = int(os.environ.get("TPU_RT_CANARY_R", "16384"))
    rng = np.random.default_rng(7)
    # down rays: origins just above the floor plane (y=-1), direction -Y
    o_dn = np.stack([rng.uniform(-1.5, 1.5, r),
                     np.full(r, -0.99),
                     rng.uniform(-1.5, 1.5, r)], -1).astype(np.float32)
    d_dn = np.tile([0.0, -1.0, 0.0], (r, 1)).astype(np.float32)
    # mixed rays: random origins in the box, random directions
    o_mx = rng.uniform(-0.9, 0.9, (r, 3)).astype(np.float32)
    d_mx = rng.standard_normal((r, 3)).astype(np.float32)
    d_mx /= np.linalg.norm(d_mx, axis=-1, keepdims=True)

    def run(mode, o, d, any_hit):
        fn = jax.jit(lambda o, d: pallas_trace.trace_brute_pallas(
            scene.tri_planes, scene.chunk_aabb, o, d, 1e-3, 100.0,
            any_hit=any_hit, kernel=mode,
            coef48=scene.coef48, coef48_grp=scene.coef48_grp))
        out = fn(jnp.asarray(o), jnp.asarray(d))
        sync_value(out)
        return out

    ok = True
    for name, o, d, any_hit in (
            ("early-exit closest (down rays)", o_dn, d_dn, False),
            ("mixed closest", o_mx, d_mx, False),
            ("early-exit any-hit (down rays)", o_dn, d_dn, True)):
        t0 = time.time()
        got = run("mxuf2", o, d, any_hit)       # auto-remaps to mxus
        dt = time.time() - t0
        ref = run("vpu", o, d, any_hit)
        if any_hit:
            agree = float(jnp.mean(((got["tri"] >= 0)
                                    == (ref["tri"] >= 0)).astype(jnp.float32)))
        else:
            # the kernel's t carries the 3-pass bf16 window (the EXACT
            # winner t is recomputed downstream in ops/hit.py); compare
            # at the same relative tolerance ucb_mxus.py uses
            gt, rt = got["t"], ref["t"]
            agree = float(jnp.mean((jnp.abs(gt - rt) < 1e-3 * (1 + rt))
                          .astype(jnp.float32)))
        print(f"{name}: {dt * 1e3:.1f} ms  t_agree={agree:.4f}")
        # The 3-pass bf16 window has a KNOWN precision floor on
        # edge-crossing hits: det/u/v are cancellation-heavy sums, and a
        # hit within ~2e-3 of a triangle edge (u+v ~ 1) can be rejected
        # when |det| ~ the product's 1e-5-level absolute error - ~1 ray
        # in 16k on this scene (r5 analysis: ray 994, u+v=0.998,
        # det=9e-6; exact winner recovered by the vpu kernel). The
        # canary's job is the DMA-drain HANG check and gross-accuracy
        # sanity, so it budgets that floor instead of demanding 1.0.
        ok &= agree >= 0.9995
        if agree < 1.0 and not any_hit:
            bad = jnp.nonzero(~(jnp.abs(gt - rt) < 1e-3 * (1 + rt)))[0][:4]
            for k in np.asarray(bad):
                print(f"    ray {k}: mxus t={float(gt[k]):.5f} "
                      f"vpu t={float(rt[k]):.5f} (edge-window class)")

    # trailing health probe: a trivial dispatch must still work
    h = float(jnp.sum(jnp.arange(16.0)).block_until_ready())
    print(f"health probe sum={h} (expect 120.0)")
    ok &= h == 120.0
    print("CANARY PASS" if ok else "CANARY FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
