"""Post-pass semantics (post.wgsl parity): bilateral edge preservation,
variance clipping, dual static/TAA accumulation modes, denoise gating."""

import numpy as np
import jax.numpy as jnp

from tpu_raytracer.ops import gbuffer as gbuffer_ops
from tpu_raytracer.ops import post as post_ops
from tpu_raytracer.ops import restir as restir_ops
from tpu_raytracer.parallel import views as views_mod

W = H = 16
N = W * H


def _gb(albedo, normal_z_up=True, motion=0.0):
    oct0 = np.zeros((N, 2), np.float32)  # +Z normals everywhere
    return {
        "valid": jnp.ones((N,), bool),
        "pos": jnp.asarray(np.tile([0, 0, 1.0], (N, 1)).astype(np.float32)),
        "mat_id": jnp.zeros((N,), jnp.int32),
        "oct_normal": jnp.asarray(oct0),
        "uv": jnp.zeros((N, 2), jnp.float32),
        "albedo": jnp.asarray(albedo, jnp.float32),
        "motion": jnp.full((N, 2), motion, jnp.float32),
    }


def _run_post(hdr, gb, history, frame):
    ctx = restir_ops.make_ctx(W, H)
    mv = lambda flat: views_mod.trivial_view(flat, W, H)
    return post_ops.post_process(
        mv(jnp.asarray(hdr, jnp.float32)), gb,
        mv(gbuffer_ops.pack_gb(gb)), mv(jnp.asarray(history, jnp.float32)),
        jnp.uint32(frame), ctx)


def test_bilateral_preserves_uniform_and_edges():
    # uniform field: filter must be (near) identity
    hdr = np.full((N, 3), 0.5, np.float32)
    albedo = np.full((N, 3), 0.7, np.float32)
    ldr, accum = _run_post(hdr, _gb(albedo), np.zeros((N, 3)), frame=0)
    assert np.abs(np.asarray(accum) - 0.5).max() < 1e-3

    # albedo edge: radiance must not bleed across it (w_color kills taps)
    img = np.zeros((H, W, 3), np.float32)
    img[:, : W // 2] = 2.0
    alb = np.full((H, W, 3), 0.1, np.float32)
    alb[:, : W // 2] = 0.9
    ldr, accum = _run_post(img.reshape(N, 3), _gb(alb.reshape(N, 3)),
                           np.zeros((N, 3)), frame=0)
    out = np.asarray(accum).reshape(H, W, 3)
    assert np.abs(out[:, : W // 2] - 2.0).max() < 1e-2
    assert np.abs(out[:, W // 2:]).max() < 1e-2


def test_static_accumulation_is_progressive_average():
    """Static pixels (speed < 0.5 px) blend 1-1/(N+1) with UNCLAMPED
    history (post.wgsl:246-259): accumulating constants must converge to
    their running mean in tonemapped space."""
    gb = _gb(np.full((N, 3), 0.5, np.float32))
    history = np.zeros((N, 3), np.float32)
    values = [1.0, 0.0, 1.0, 1.0]
    for frame, v in enumerate(values):
        hdr = np.full((N, 3), v, np.float32)
        ldr, history = _run_post(hdr, gb, history, frame)
    # running mean in tonemapped space: tm(1)=0.5, tm(0)=0
    tm_mean = (0.5 + 0.0 + 0.5 + 0.5) / 4
    expect = tm_mean / (1 - tm_mean)   # inverse tonemap
    got = np.asarray(history)
    assert np.abs(got - expect).max() < 2e-2, (got.mean(), expect)


def test_moving_pixels_use_clamped_taa():
    """Moving pixels clamp history to the 3x3 neighborhood statistics -
    a wildly wrong history cannot survive (post.wgsl:261-266)."""
    gb = _gb(np.full((N, 3), 0.5, np.float32), motion=2.0 / W)  # 2 px/frame
    history = np.full((N, 3), 50.0, np.float32)      # bogus bright history
    hdr = np.full((N, 3), 0.2, np.float32)
    ldr, accum = _run_post(hdr, gb, history, frame=3)
    # clipped toward the current frame's statistics, far below 50
    assert np.asarray(accum).max() < 1.0


def test_gamma_encode():
    gb = _gb(np.full((N, 3), 0.5, np.float32))
    hdr = np.full((N, 3), 0.25, np.float32)
    ldr, accum = _run_post(hdr, gb, np.zeros((N, 3)), frame=0)
    assert np.abs(np.asarray(ldr) - 0.25 ** (1 / 2.2)).max() < 1e-2
