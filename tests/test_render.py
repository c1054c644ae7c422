"""Render-path tests: G-buffer, reservoir invariants, post helpers,
denoiser, checkpoint roundtrip, camera controller, debug views."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu_raytracer.models import scenes
from tpu_raytracer.ops import gbuffer as gbuffer_ops
from tpu_raytracer.ops import post as post_ops
from tpu_raytracer.ops import restir as restir_ops
from tpu_raytracer.ops import denoise as denoise_ops
from tpu_raytracer.render import camera as camera_mod
from tpu_raytracer.render import checkpoint, pipeline, renderer

W = H = 32


def _scene():
    global _SCENE
    try:
        return _SCENE
    except NameError:
        pass
    globals()["_SCENE"] = scenes.create_cornell_box_diffuse()
    return _SCENE


def test_gbuffer_contents():
    scene = _scene()
    cam = camera_mod.CameraController()
    uniform = renderer.camera_to_device(cam.uniform(1.0, 0, scene.num_lights))
    gb = gbuffer_ops.render_gbuffer(scene, uniform, W, H)
    assert bool(jnp.all(gb["valid"]))          # camera inside open box: all hit
    # first frame: no motion
    assert float(jnp.abs(gb["motion"]).max()) < 1e-5
    # normals are unit after decode
    from tpu_raytracer.utils import math3d

    n = math3d.oct_decode(gb["oct_normal"])
    assert float(jnp.abs(jnp.linalg.norm(n, axis=1) - 1).max()) < 1e-4
    # pack/unpack roundtrip
    rt = gbuffer_ops.unpack_gb(gbuffer_ops.pack_gb(gb))
    for k in gb:
        assert np.array_equal(np.asarray(rt[k]), np.asarray(gb[k])), k


def test_reservoir_update_invariants():
    """update_reservoir semantics (restir.wgsl:746-756)."""
    res = restir_ops.empty_reservoirs(4)
    mask = jnp.asarray([True, True, True, False])
    w = jnp.asarray([1.0, 0.0, 2.0, 5.0])
    from tpu_raytracer.utils import vec3
    ones3 = vec3.of(jnp.ones((4, 3)))
    res2 = restir_ops._update_reservoir(
        res, mask, jnp.uint32(7), w, jnp.asarray([0.4, 0.4, 0.9, 0.1]),
        1, jnp.asarray([3.0] * 4), ones3, ones3, jnp.bool_(True))
    assert np.allclose(np.asarray(res2["w_sum"]), [1.0, 0.0, 2.0, 0.0])
    assert list(np.asarray(res2["M"])) == [1, 1, 1, 0]
    # lane0: rnd*w_sum = 0.4 < 1 -> take; lane1: w=0 -> no; lane3 masked
    assert list(np.asarray(res2["y"])) == [7, 0, 7, 0]
    # pack/unpack roundtrip preserves raw seed bits
    res2["y"] = jnp.asarray([0xDEADBEEF, 1, 2, 3], jnp.uint32)
    rt = restir_ops.unpack_reservoirs(restir_ops.pack_reservoirs(res2))
    assert np.array_equal(np.asarray(rt["y"]), np.asarray(res2["y"]))
    for k in ("w_sum", "W", "p_hat", "s_path"):
        assert np.array_equal(np.asarray(rt[k]), np.asarray(res2[k]))


def test_post_tonemap_roundtrip():
    c = jnp.asarray(np.random.rand(128, 3) * 20.0)
    tm = post_ops.resolve_tonemap(c)
    assert float(tm.max()) <= 1.0
    back = post_ops.resolve_inverse_tonemap(tm)
    assert float(jnp.abs(back - c).max() / c.max()) < 1e-2
    # YCoCg roundtrip
    y = post_ops.rgb_to_ycocg(c)
    assert float(jnp.abs(post_ops.ycocg_to_rgb(y) - c).max()) < 1e-4


def test_full_frame_and_accumulation_reset():
    scene = _scene()
    cam = camera_mod.CameraController()
    state = pipeline.init_state(W, H)
    outs = []
    for frame in range(3):
        uniform = renderer.camera_to_device(
            cam.uniform(1.0, frame, scene.num_lights))
        ldr, hdr, state, aux = pipeline.render_frame(
            scene, uniform, jnp.uint32(frame), state, W, H)
        outs.append(np.asarray(ldr))
        assert np.isnan(outs[-1]).sum() == 0
        assert float(aux["rays"]) > W * H          # at least primaries + some
    # accumulation reduces temporal variance: frame2 vs frame1 difference
    # is smaller than frame1 vs frame0
    d01 = np.abs(outs[1] - outs[0]).mean()
    d12 = np.abs(outs[2] - outs[1]).mean()
    assert d12 < d01


def test_denoiser_reduces_noise():
    h = w = 32
    rng = np.random.default_rng(0)
    clean = np.tile([[0.5, 0.4, 0.3]], (h * w, 1)).astype(np.float32)
    noisy = clean + rng.normal(0, 0.3, clean.shape).astype(np.float32)
    albedo = np.ones((h, w, 3), np.float32)
    octn = np.zeros((h, w, 2), np.float32)   # all normals = +Z
    pos = np.zeros((h, w, 3), np.float32)    # flat plane
    out = np.asarray(denoise_ops.atrous_denoise(
        jnp.asarray(noisy.reshape(h, w, 3)), jnp.asarray(albedo),
        jnp.asarray(octn), jnp.asarray(pos)))
    err_before = np.abs(noisy.reshape(h, w, 3) - clean.reshape(h, w, 3)).mean()
    err_after = np.abs(out - clean.reshape(h, w, 3)).mean()
    assert err_after < err_before * 0.2


def test_checkpoint_roundtrip(tmp_path):
    state = pipeline.init_state(8, 8)
    state["accum"] = jnp.asarray(np.random.rand(64, 3).astype(np.float32))
    path = str(tmp_path / "ckpt.npz")
    cam_state = {"position": np.asarray([1.0, 2.0, 3.0]), "yaw": 0.5,
                 "pitch": -0.25, "prev_view_proj": np.eye(4)}
    checkpoint.save(path, jax.device_get(state), 42, cam_state)
    st, frames, cs = checkpoint.load(path)
    assert frames == 42
    assert np.allclose(st["accum"], np.asarray(state["accum"]))
    assert np.allclose(cs["position"], [1, 2, 3])
    assert cs["yaw"] == 0.5 and cs["pitch"] == -0.25


def test_checkpoint_format_mismatch_rejected(tmp_path):
    """A checkpoint from an older packed-row layout must fail LOUDLY at
    load (ADVICE r2: pre-dedup 8-col reservoirs silently clamped)."""
    import json

    import pytest

    path = str(tmp_path / "old.npz")
    meta = {"format": {"gb_cols": 14, "res_cols": 8},  # pre-dedup layout
            "frame_count": 3,
            "camera": {"position": [0, 0, 0], "yaw": 0.0, "pitch": 0.0,
                       "prev_view_proj": None}}
    np.savez_compressed(path, meta=json.dumps(meta),
                        accum=np.zeros((64, 3), np.float32))
    with pytest.raises(ValueError, match="incompatible"):
        checkpoint.load(path)


def test_camera_controller_dynamics():
    cam = camera_mod.CameraController()
    p0 = cam.position.copy()
    assert not cam.update(0.1)
    cam.press("w")
    assert cam.update(0.5)
    # default yaw -90 deg: forward is -Z, speed 2.0 (camera.rs:115)
    assert abs((cam.position - p0)[2] + 1.0) < 1e-5
    cam.release("w")
    cam.press("up")
    cam.update(2.0)   # pitch clamps at +1.5 rad (camera.rs:140)
    assert abs(cam.pitch - 1.5) < 1e-6


def test_halton_jitter_disabled():
    # camera.rs:202-203 multiplies by zero - jitter must be exactly 0
    assert camera_mod.get_halton_jitter(5, 1280, 720) == (0.0, 0.0)


def _render_mode(scene, w, h, frames, tap_batch):
    from tpu_raytracer.parallel import views as views_mod

    cam = camera_mod.CameraController()
    state = pipeline.init_state(w, h)
    ctx = restir_ops.make_ctx(w, h)
    ctx["tap_batch"] = tap_batch

    def mv(flat):
        return views_mod.trivial_view(flat, w, h)

    step = jax.jit(lambda s, u, fc, st: pipeline.render_band(
        s, u, fc, st, ctx, mv))
    for f in range(frames):
        u = renderer.camera_to_device(cam.uniform(1.0, f, scene.num_lights))
        ldr, hdr, state, aux = step(scene, u, jnp.uint32(f), state)
    return np.asarray(ldr)


def test_tap_batch_exact_when_unoccluded():
    """The batched spatial-tap path moves the reservoir-update draw from
    post-visibility (restir_spatial.wgsl:993) to the visibility test
    itself; the streams can only diverge when a shadow_active tap is
    BLOCKED. In a scene with no occluder between any surface point and
    any reconnection vertex, the two paths must be bitwise identical."""
    import numpy as np

    from tpu_raytracer.scene.builder import SceneBuilder
    from tpu_raytracer.scene.geometry import create_plane
    from tpu_raytracer.scene.material import Material
    from tpu_raytracer.utils.math3d import (rotation_x, scale, translation)

    b = SceneBuilder()
    plane_id = b.add_mesh(create_plane())
    m_white = b.add_material(Material((0.73, 0.73, 0.73, 1.0)))
    b.add_instance(plane_id, m_white,
                   translation([0, -1, 0]) @ scale(4.0))
    b.register_quad_light(
        plane_id, translation([0, 1.5, 0]) @ rotation_x(np.pi) @ scale(0.5),
        [1.0, 1.0, 1.0], 10.0)
    scene = b.build()
    a = _render_mode(scene, 32, 32, 3, True)
    s = _render_mode(scene, 32, 32, 3, False)
    assert np.array_equal(a, s)


def test_tap_batch_converges_same():
    """Cornell (taps DO get blocked near box edges): batched vs
    sequential differ only as another unbiased noise realization - tiny
    fraction of lanes, matching image means."""
    scene = _scene()
    a = _render_mode(scene, W, H, 8, True)
    b = _render_mode(scene, W, H, 8, False)
    d = np.abs(a - b)
    assert d.mean() < 1e-3
    assert abs(float(a.mean()) - float(b.mean())) < 1e-3
