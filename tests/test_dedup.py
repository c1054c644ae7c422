"""Replay-dedup equivalence: static_ok must not change the image.

The final ReSTIR replay (restir_spatial.wgsl:996) is deterministic in
(gb, seed); the dedup cache returns the identical radiance without the
trace. On a static camera the dedup'd render must match the non-dedup'd
one (up to XLA fusion-level float noise) while tracing strictly fewer
rays.
"""

import jax.numpy as jnp
import numpy as np

from tpu_raytracer.models import scenes
from tpu_raytracer.render import camera as camera_mod
from tpu_raytracer.render import pipeline, renderer

W = H = 64
FRAMES = 4


def _run(static_flags):
    scene = scenes.create_cornell_box()
    cam = camera_mod.CameraController()
    state = pipeline.init_state(W, H)
    outs, rays = [], []
    for f in range(FRAMES):
        uniform = renderer.camera_to_device(
            cam.uniform(1.0, f, scene.num_lights))
        ldr, hdr, state, aux = pipeline.render_frame(
            scene, uniform, jnp.uint32(f), state, W, H,
            static_ok=static_flags(f))
        outs.append(np.asarray(ldr))
        rays.append(float(aux["rays"]))
    return outs, rays


def test_static_dedup_matches_full_replay():
    base, base_rays = _run(lambda f: False)
    dedup, dedup_rays = _run(lambda f: f > 0)
    for f in range(FRAMES):
        np.testing.assert_allclose(dedup[f], base[f], atol=2e-5,
                                   err_msg=f"frame {f}")
    # frame 0 identical ray count; later frames trace strictly fewer
    assert dedup_rays[0] == base_rays[0]
    assert all(d < b for d, b in zip(dedup_rays[1:], base_rays[1:])), (
        dedup_rays, base_rays)


def test_gb_reuse_matches_compute(trace_env):
    """TPU_RT_GB_REUSE=1: under static_ok the G-buffer is reused from
    FrameState instead of re-traced (render_gbuffer is deterministic in
    (scene, camera); pack/unpack roundtrips exactly), so the image must
    match the compute-always default and primary rays drop from the
    honest query count."""
    trace_env.setenv("TPU_RT_GB_REUSE", "1")
    reuse, reuse_rays = _run(lambda f: f > 0)
    trace_env.delenv("TPU_RT_GB_REUSE")
    base, base_rays = _run(lambda f: f > 0)
    for f in range(FRAMES):
        np.testing.assert_allclose(reuse[f], base[f], atol=2e-5,
                                   err_msg=f"frame {f}")
    assert reuse_rays[0] == base_rays[0]
    n_primary = W * H
    for rr, br in zip(reuse_rays[1:], base_rays[1:]):
        assert rr == br - n_primary, (reuse_rays, base_rays)
