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


def test_read_cols_quad_matches_independent_reads():
    """read_cols_quad (one overlapping-quad gather) must return, corner by
    corner, exactly what four independent read() calls return - values
    where valid AND the valid flags - including the edge anchors gx=-1,
    gx=width-1 and rows at/over the coverage boundary."""
    rng = np.random.default_rng(7)
    w, h = 16, 32
    for y0, band_h, halo in [(0, h, 0), (8, 8, 2)]:
        cover = band_h + 2 * halo
        data = jnp.asarray(rng.normal(size=(cover * w, 3)).astype(np.float32))
        view = views_mod.BandView(data=data, y0=jnp.int32(y0), width=w,
                                  height=h, band_h=band_h, halo=halo)
        gy = jnp.asarray(np.concatenate([
            rng.integers(-2, h + 2, size=64),
            [y0 - halo - 1, y0 - halo, y0 + band_h + halo - 2,
             y0 + band_h + halo - 1, y0 + band_h + halo],
        ]).astype(np.int32))
        gx = jnp.asarray(np.concatenate([
            rng.integers(-1, w + 1, size=64),
            [-1, 0, w - 2, w - 1, w],
        ]).astype(np.int32))
        n = min(gy.shape[0], gx.shape[0])
        gy, gx = gy[:n], gx[:n]
        out = view.read_cols_quad(gy, gx)
        corners, valids = out[:4], out[4:]
        for (dy, dx), cols, v in zip(
                [(0, 0), (0, 1), (1, 0), (1, 1)],
                corners, valids):
            want_vals, want_ok = view.read(gy + dy, gx + dx)
            np.testing.assert_array_equal(np.asarray(v), np.asarray(want_ok))
            got = np.stack([np.asarray(c) for c in cols], axis=-1)
            ok = np.asarray(want_ok)
            np.testing.assert_array_equal(got[ok], np.asarray(want_vals)[ok])


def test_hist_quad_gate_bit_identical(trace_env):
    """TPU_RT_HIST_QUAD=1 (one-gather 2x2 history footprint) must be
    bit-identical to the default two-gather path, including reprojection
    taps pushed outside the image by motion."""
    rng = np.random.default_rng(3)
    hdr = rng.uniform(0, 2, size=(N, 3)).astype(np.float32)
    history = rng.uniform(0, 2, size=(N, 3)).astype(np.float32)
    gb = _gb(rng.uniform(0, 1, size=(N, 3)).astype(np.float32),
             motion=3.7 / W)  # pushes edge pixels' taps out of bounds
    ldr0, acc0 = _run_post(hdr, gb, history, frame=5)
    trace_env.setenv("TPU_RT_HIST_QUAD", "1")
    ldr1, acc1 = _run_post(hdr, gb, history, frame=5)
    np.testing.assert_array_equal(np.asarray(ldr0), np.asarray(ldr1))
    np.testing.assert_array_equal(np.asarray(acc0), np.asarray(acc1))


def test_gamma_encode():
    gb = _gb(np.full((N, 3), 0.5, np.float32))
    hdr = np.full((N, 3), 0.25, np.float32)
    ldr, accum = _run_post(hdr, gb, np.zeros((N, 3)), frame=0)
    assert np.abs(np.asarray(ldr) - 0.25 ** (1 / 2.2)).max() < 1e-2
