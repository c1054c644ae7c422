"""Post pass: joint bilateral filter, variance-clipped TAA / progressive
accumulation, reversible tonemap, gamma encode.

Vectorized port of post.wgsl:61-282:
  - 5x5 joint bilateral over the HDR input, weighted by spatial Gaussian
    (sigma 1.5), albedo similarity (sigma 0.2), normal^20, position
    (sigma 0.1) (post.wgsl:85-141); stencils are roll+mask sums over
    image-shaped arrays - no gathers on TPU.
  - 3x3 variance clipping statistics in YCoCg of reversibly-tonemapped
    color, gamma 1.2 (post.wgsl:143-177).
  - history reprojection through per-pixel motion vectors with manual
    bilinear taps of the accumulation buffer (post.wgsl:180-228).
  - dual accumulation mode (post.wgsl:246-266): static pixels (< 0.5 px
    motion) do a pure progressive average with UNCLAMPED history
    (blend = 1 - 1/(N+1)); moving pixels do variance-clipped TAA with
    speed-dependent feedback 0.98 -> 0.85.
  - inverse tonemap back to linear HDR for the accumulation buffer;
    gamma-2.2 encode for display (post.wgsl:269-281).

All neighbor reads run on BandViews (parallel/views.py): single-chip uses
the trivial full-image view; the sharded path feeds ppermute-halo-extended
bands (stencils need halo >= 2; history reprojection uses the full halo).

The reference's TAA camera jitter is disabled upstream exactly like the
reference (camera.rs:202-203 multiplies the Halton jitter by zero), so the
unjitter resampling path (post.wgsl:73-77) reduces to identity and is
omitted here.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..utils import math3d

SIGMA_SPATIAL = 1.5
SIGMA_COLOR = 0.2
SIGMA_POS = 0.1
KERNEL_RADIUS = 2
VARIANCE_GAMMA = 1.2


def _gauss(x2, sigma):
    return jnp.exp(-x2 / (2.0 * sigma * sigma))


def rgb_to_ycocg(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return jnp.stack([
        0.25 * r + 0.5 * g + 0.25 * b,
        0.5 * r - 0.5 * b,
        -0.25 * r + 0.5 * g - 0.25 * b,
    ], axis=-1)


def ycocg_to_rgb(c):
    y, co, cg = c[..., 0], c[..., 1], c[..., 2]
    return jnp.stack([y + co - cg, y + cg, y - co - cg], axis=-1)


def resolve_tonemap(c):
    """Reversible Reinhard-max (post.wgsl:51-53)."""
    return c / (1.0 + jnp.max(c, axis=-1, keepdims=True))


def resolve_inverse_tonemap(c):
    return c / jnp.maximum(1.0 - jnp.max(c, axis=-1, keepdims=True), 1e-4)


class _Stencil:
    """Shifted-window reader over a BandView for static (dy, dx) offsets.

    Returns center-band-shaped [band_h, W, C] values + validity; wraps from
    jnp.roll are masked by global image bounds (single chip) or always land
    outside the sliced center when halo >= |offset| (sharded bands).
    """

    def __init__(self, view, ctx):
        self.ext = view.as_2d()
        self.halo = view.halo
        self.band_h = ctx["band_h"]
        self.width = ctx["width"]
        self.height = ctx["height"]
        self.y0 = ctx["y0"]

    def tap(self, dy: int, dx: int):
        rolled = jnp.roll(self.ext, (-dy, -dx), axis=(0, 1))
        center = rolled[self.halo:self.halo + self.band_h]
        gy = self.y0 + jnp.arange(self.band_h, dtype=jnp.int32)[:, None] + dy
        gx = jnp.arange(self.width, dtype=jnp.int32)[None, :] + dx
        valid = (gy >= 0) & (gy < self.height) & (gx >= 0) & (gx < self.width)
        return center, valid


def post_process(hdr_view, gb, gb_view, history_view, frame_count, ctx):
    """Full post pass over one band.

    Args:
      hdr_view: BandView of the spatial-pass HDR output (halo >= 2 when
        sharded).
      gb: this band's flat G-buffer (motion used directly).
      gb_view: BandView of the PACKED G-buffer (stencil weights slice
        albedo / oct-normal / pos channels from each tap).
      history_view: BandView of the accumulation buffer (reprojection taps).
      frame_count: scalar; the SPP counter (resets on camera motion).
      ctx: band context from restir.make_ctx.

    Returns (ldr_flat [n,3] gamma-encoded, new_accum_flat [n,3] linear HDR).
    """
    from .gbuffer import GB_ALBEDO, GB_OCT, GB_POS

    band_h, width, height = ctx["band_h"], ctx["width"], ctx["height"]
    frame = jnp.asarray(frame_count, jnp.float32)

    s_hdr = _Stencil(hdr_view, ctx)
    s_gb = _Stencil(gb_view, ctx)

    hdr, _ = s_hdr.tap(0, 0)
    gb0, _ = s_gb.tap(0, 0)
    albedo = gb0[..., GB_ALBEDO]
    normal = math3d.oct_decode(gb0[..., GB_OCT])
    pos = gb0[..., GB_POS]

    # ---- 5x5 joint bilateral (post.wgsl:85-141) ----
    sum_color = jnp.zeros_like(hdr)
    sum_weight = jnp.zeros(hdr.shape[:2], hdr.dtype)
    for dy in range(-KERNEL_RADIUS, KERNEL_RADIUS + 1):
        for dx in range(-KERNEL_RADIUS, KERNEL_RADIUS + 1):
            c, ok = s_hdr.tap(dy, dx)
            gbt, _ = s_gb.tap(dy, dx)
            a = gbt[..., GB_ALBEDO]
            p = gbt[..., GB_POS]
            nrm = math3d.oct_decode(gbt[..., GB_OCT])

            w_spatial = math.exp(-(dx * dx + dy * dy)
                                 / (2.0 * SIGMA_SPATIAL ** 2))
            dc = a - albedo
            w_color = _gauss(jnp.sum(dc * dc, -1), SIGMA_COLOR)
            dn = jnp.clip(jnp.sum(nrm * normal, -1), 0.0, 1.0)
            w_normal = dn ** 20
            dp = p - pos
            w_pos = _gauss(jnp.sum(dp * dp, -1), SIGMA_POS)

            w = w_spatial * w_color * w_normal * w_pos * ok
            sum_color = sum_color + c * w[..., None]
            sum_weight = sum_weight + w
    filtered = jnp.where((sum_weight > 1e-3)[..., None],
                         sum_color / jnp.maximum(sum_weight, 1e-3)[..., None],
                         hdr)

    # ---- 3x3 YCoCg variance bounds (post.wgsl:143-177) ----
    m1 = jnp.zeros_like(hdr)
    m2 = jnp.zeros_like(hdr)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            c, ok = s_hdr.tap(dy, dx)
            c = jnp.where(ok[..., None], c, filtered)
            s = rgb_to_ycocg(resolve_tonemap(c))
            m1 = m1 + s
            m2 = m2 + s * s
    m1 = m1 / 9.0
    m2 = m2 / 9.0
    sigma = jnp.sqrt(jnp.maximum(m2 - m1 * m1, 0.0))
    c_min = m1 - VARIANCE_GAMMA * sigma
    c_max = m1 + VARIANCE_GAMMA * sigma

    tm_filtered = resolve_tonemap(filtered)

    # ---- history reprojection (post.wgsl:180-228) ----
    motion = gb["motion"].reshape(band_h, width, 2)
    gy = ctx["y0"] + jnp.arange(band_h, dtype=jnp.int32)
    ys, xs = jnp.meshgrid(gy.astype(jnp.float32),
                          jnp.arange(width, dtype=jnp.float32), indexing="ij")
    uv_x = (xs + 0.5) / width + motion[..., 0]
    uv_y = (ys + 0.5) / height + motion[..., 1]
    hist_valid = (uv_x >= 0.0) & (uv_x <= 1.0) & (uv_y >= 0.0) & (uv_y <= 1.0)

    px = uv_x * width - 0.5
    py = uv_y * height - 0.5
    x0 = jnp.floor(px).astype(jnp.int32)
    y0i = jnp.floor(py).astype(jnp.int32)
    fx = (px - x0.astype(jnp.float32))[..., None]
    fy = (py - y0i.astype(jnp.float32))[..., None]

    def hist_tap(yy, xx):
        c, ok = history_view.read(yy.reshape(-1), xx.reshape(-1))
        c = jnp.where(ok[:, None], resolve_tonemap(c), 0.0)
        return c.reshape(band_h, width, 3)

    c00 = hist_tap(y0i, x0)
    c10 = hist_tap(y0i, x0 + 1)
    c01 = hist_tap(y0i + 1, x0)
    c11 = hist_tap(y0i + 1, x0 + 1)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    hist_tm = top * (1 - fy) + bot * fy

    hist_valid = hist_valid & (frame > 0.0)
    hist_tm = jnp.where(hist_valid[..., None], hist_tm, tm_filtered)

    # variance-clipped history for the TAA branch (post.wgsl:235-239)
    clipped = ycocg_to_rgb(jnp.clip(rgb_to_ycocg(hist_tm), c_min, c_max))

    motion_px = motion * jnp.asarray([width, height], jnp.float32)
    speed = jnp.sqrt(jnp.sum(motion_px * motion_px, -1))

    # static: pure progressive average with raw history (post.wgsl:246-259)
    accum_blend = jnp.clip(1.0 - 1.0 / (frame + 1.0), 0.0, 1.0)
    static_tm = tm_filtered * (1.0 - accum_blend) + hist_tm * accum_blend
    # moving: clamped history with dynamic feedback (post.wgsl:261-266)
    t = jnp.clip(speed / 2.0, 0.0, 1.0)
    feedback = (0.98 + (0.85 - 0.98) * (t * t * (3.0 - 2.0 * t)))[..., None]
    moving_tm = tm_filtered * (1.0 - feedback) + clipped * feedback

    final_tm = jnp.where((speed < 0.5)[..., None], static_tm, moving_tm)
    final_tm = jnp.where(hist_valid[..., None], final_tm, tm_filtered)

    final = jnp.maximum(resolve_inverse_tonemap(final_tm), 0.0)
    ldr = jnp.power(jnp.clip(final, 0.0, 1.0), 1.0 / 2.2)
    return ldr.reshape(-1, 3), final.reshape(-1, 3)
