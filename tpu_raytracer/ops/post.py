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

The whole pass runs on per-channel [band_h, W] PLANES (r3): a rank-3
[band_h, W, 3] intermediate tiles its minor dim 3 to 128 lanes on TPU
(42x HBM traffic), so the packed view data is de-interleaved by ONE
tiled transpose up front and every stencil tap / blend operates on dense
2D planes (V3-of-planes for colors), restacking only the two flat
outputs.

The reference's TAA camera jitter is disabled upstream exactly like the
reference (camera.rs:202-203 multiplies the Halton jitter by zero), so the
unjitter resampling path (post.wgsl:73-77) reduces to identity and is
omitted here.
"""

from __future__ import annotations

import math
import os

import jax.numpy as jnp

from ..utils import vec3
from ..utils.vec3 import V3

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


# --- V3-of-planes forms (same expressions per element) ---

def _ycocg_v3(c: V3) -> V3:
    return V3(0.25 * c.x + 0.5 * c.y + 0.25 * c.z,
              0.5 * c.x - 0.5 * c.z,
              -0.25 * c.x + 0.5 * c.y - 0.25 * c.z)


def _rgb_v3(c: V3) -> V3:
    return V3(c.x + c.y - c.z, c.x + c.z, c.x - c.y - c.z)


def _tonemap_v3(c: V3) -> V3:
    return c / (1.0 + vec3.vmax(c))


def _inv_tonemap_v3(c: V3) -> V3:
    return c / jnp.maximum(1.0 - vec3.vmax(c), 1e-4)


class _PlaneStencil:
    """Shifted-window reader over per-channel [H', W] planes for static
    (dy, dx) offsets.

    Planes come from ONE tiled transpose of the BandView's packed rows;
    each tap is a roll + center slice of dense 2D planes. Wraps from
    jnp.roll are masked by global image bounds (single chip) or always
    land outside the sliced center when halo >= |offset| (sharded bands).
    """

    def __init__(self, view, ctx, channels):
        h2 = view.band_h + 2 * view.halo
        ext_t = view.data.T                     # [C, H'*W] one transpose
        self.planes = [ext_t[k].reshape(h2, view.width) for k in channels]
        self.halo = view.halo
        self.band_h = ctx["band_h"]
        self.width = ctx["width"]
        self.height = ctx["height"]
        self.y0 = ctx["y0"]

    def tap(self, dy: int, dx: int):
        out = [jnp.roll(p, (-dy, -dx), axis=(0, 1)
                        )[self.halo:self.halo + self.band_h]
               for p in self.planes]
        gy = self.y0 + jnp.arange(self.band_h, dtype=jnp.int32)[:, None] + dy
        gx = jnp.arange(self.width, dtype=jnp.int32)[None, :] + dx
        valid = (gy >= 0) & (gy < self.height) & (gx >= 0) & (gx < self.width)
        return out, valid


def post_process(hdr_view, gb, gb_view, history_view, frame_count, ctx):
    """Full post pass over one band.

    Args:
      hdr_view: BandView of the spatial-pass HDR output (halo >= 2 when
        sharded).
      gb: this band's flat G-buffer (motion used directly).
      gb_view: BandView of the PACKED G-buffer (stencil weights use the
        albedo / oct-normal / pos channels of each tap).
      history_view: BandView of the accumulation buffer (reprojection taps).
      frame_count: scalar; the SPP counter (resets on camera motion).
      ctx: band context from restir.make_ctx.

    Returns (ldr_flat [n,3] gamma-encoded, new_accum_flat [n,3] linear HDR).
    """
    from .gbuffer import GB_ALBEDO, GB_OCT, GB_POS

    band_h, width, height = ctx["band_h"], ctx["width"], ctx["height"]
    frame = jnp.asarray(frame_count, jnp.float32)

    # per-channel planes: hdr rgb + gb (albedo rgb, oct xy, pos xyz)
    gb_ch = (list(range(GB_ALBEDO.start, GB_ALBEDO.stop))
             + list(range(GB_OCT.start, GB_OCT.stop))
             + list(range(GB_POS.start, GB_POS.stop)))
    s_hdr = _PlaneStencil(hdr_view, ctx, [0, 1, 2])
    s_gb = _PlaneStencil(gb_view, ctx, gb_ch)

    def gb_split(planes):
        a = V3(planes[0], planes[1], planes[2])
        n = vec3.oct_decode(planes[3], planes[4])
        p = V3(planes[5], planes[6], planes[7])
        return a, n, p

    hdr0, _ = s_hdr.tap(0, 0)
    hdr = V3(*hdr0)
    gb0, _ = s_gb.tap(0, 0)
    albedo, normal, pos = gb_split(gb0)

    # ---- 5x5 joint bilateral (post.wgsl:85-141) ----
    sum_color = vec3.splat(0.0, hdr.x)
    sum_weight = jnp.zeros_like(hdr.x)
    for dy in range(-KERNEL_RADIUS, KERNEL_RADIUS + 1):
        for dx in range(-KERNEL_RADIUS, KERNEL_RADIUS + 1):
            ct, ok = s_hdr.tap(dy, dx)
            c = V3(*ct)
            gbt, _ = s_gb.tap(dy, dx)
            a, nrm, p = gb_split(gbt)

            w_spatial = math.exp(-(dx * dx + dy * dy)
                                 / (2.0 * SIGMA_SPATIAL ** 2))
            dc = a - albedo
            w_color = _gauss(vec3.dot(dc, dc), SIGMA_COLOR)
            dn = jnp.clip(vec3.dot(nrm, normal), 0.0, 1.0)
            w_normal = dn ** 20
            dp = p - pos
            w_pos = _gauss(vec3.dot(dp, dp), SIGMA_POS)

            w = w_spatial * w_color * w_normal * w_pos * ok
            sum_color = sum_color + c * w
            sum_weight = sum_weight + w
    filtered = vec3.where(sum_weight > 1e-3,
                          sum_color / jnp.maximum(sum_weight, 1e-3), hdr)

    # ---- 3x3 YCoCg variance bounds (post.wgsl:143-177) ----
    m1 = vec3.splat(0.0, hdr.x)
    m2 = vec3.splat(0.0, hdr.x)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ct, ok = s_hdr.tap(dy, dx)
            c = vec3.where(ok, V3(*ct), filtered)
            s = _ycocg_v3(_tonemap_v3(c))
            m1 = m1 + s
            m2 = m2 + s * s
    m1 = m1 * (1.0 / 9.0)
    m2 = m2 * (1.0 / 9.0)
    sigma = V3(jnp.sqrt(jnp.maximum(m2.x - m1.x * m1.x, 0.0)),
               jnp.sqrt(jnp.maximum(m2.y - m1.y * m1.y, 0.0)),
               jnp.sqrt(jnp.maximum(m2.z - m1.z * m1.z, 0.0)))
    c_min = m1 - sigma * VARIANCE_GAMMA
    c_max = m1 + sigma * VARIANCE_GAMMA

    tm_filtered = _tonemap_v3(filtered)

    # ---- history reprojection (post.wgsl:180-228) ----
    motion = gb["motion"].reshape(band_h, width, 2)
    motion_x = motion[..., 0]
    motion_y = motion[..., 1]
    gy = ctx["y0"] + jnp.arange(band_h, dtype=jnp.int32)
    ys, xs = jnp.meshgrid(gy.astype(jnp.float32),
                          jnp.arange(width, dtype=jnp.float32), indexing="ij")
    uv_x = (xs + 0.5) / width + motion_x
    uv_y = (ys + 0.5) / height + motion_y
    hist_valid = (uv_x >= 0.0) & (uv_x <= 1.0) & (uv_y >= 0.0) & (uv_y <= 1.0)

    px = uv_x * width - 0.5
    py = uv_y * height - 0.5
    x0 = jnp.floor(px).astype(jnp.int32)
    y0i = jnp.floor(py).astype(jnp.int32)
    fx = px - x0.astype(jnp.float32)
    fy = py - y0i.astype(jnp.float32)

    def _shape_tap(c, ok):
        t = vec3.where(ok, _tonemap_v3(V3(*c)), 0.0)
        return V3(t.x.reshape(band_h, width),
                  t.y.reshape(band_h, width),
                  t.z.reshape(band_h, width))

    if os.environ.get("TPU_RT_HIST_QUAD", "0") == "1":
        # whole 2x2 footprint in ONE gather via overlapping-quad packed
        # rows (4x row width built by dense rolls; BandView.read_cols_quad)
        q = history_view.read_cols_quad(y0i.reshape(-1), x0.reshape(-1))
        c00, c10, c01, c11 = (_shape_tap(c, ok)
                              for c, ok in zip(q[:4], q[4:]))
    else:
        def hist_tap2(yy, xx):
            # both x-neighbors of the bilinear footprint in ONE gather
            # (adjacent flat rows; TPU gathers cost per visited ROW -
            # BandView.read_cols_x2, PERF.md)
            c0, c1, ok0, ok1 = history_view.read_cols_x2(
                yy.reshape(-1), xx.reshape(-1))
            return _shape_tap(c0, ok0), _shape_tap(c1, ok1)

        c00, c10 = hist_tap2(y0i, x0)
        c01, c11 = hist_tap2(y0i + 1, x0)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    hist_tm = top * (1 - fy) + bot * fy

    hist_valid = hist_valid & (frame > 0.0)
    hist_tm = vec3.where(hist_valid, hist_tm, tm_filtered)

    # variance-clipped history for the TAA branch (post.wgsl:235-239)
    h_y = _ycocg_v3(hist_tm)
    clipped = _rgb_v3(V3(jnp.clip(h_y.x, c_min.x, c_max.x),
                         jnp.clip(h_y.y, c_min.y, c_max.y),
                         jnp.clip(h_y.z, c_min.z, c_max.z)))

    motion_px_x = motion_x * width
    motion_px_y = motion_y * height
    speed = jnp.sqrt(motion_px_x * motion_px_x + motion_px_y * motion_px_y)

    # static: pure progressive average with raw history (post.wgsl:246-259)
    accum_blend = jnp.clip(1.0 - 1.0 / (frame + 1.0), 0.0, 1.0)
    static_tm = tm_filtered * (1.0 - accum_blend) + hist_tm * accum_blend
    # moving: clamped history with dynamic feedback (post.wgsl:261-266)
    t = jnp.clip(speed / 2.0, 0.0, 1.0)
    feedback = 0.98 + (0.85 - 0.98) * (t * t * (3.0 - 2.0 * t))
    moving_tm = tm_filtered * (1.0 - feedback) + clipped * feedback

    final_tm = vec3.where(speed < 0.5, static_tm, moving_tm)
    final_tm = vec3.where(hist_valid, final_tm, tm_filtered)

    inv = _inv_tonemap_v3(final_tm)
    final = V3(jnp.maximum(inv.x, 0.0), jnp.maximum(inv.y, 0.0),
               jnp.maximum(inv.z, 0.0))
    ldr = V3(jnp.power(jnp.clip(final.x, 0.0, 1.0), 1.0 / 2.2),
             jnp.power(jnp.clip(final.y, 0.0, 1.0), 1.0 / 2.2),
             jnp.power(jnp.clip(final.z, 0.0, 1.0), 1.0 / 2.2))
    ldr_flat = jnp.stack([ldr.x.reshape(-1), ldr.y.reshape(-1),
                          ldr.z.reshape(-1)], axis=-1)
    accum_flat = jnp.stack([final.x.reshape(-1), final.y.reshape(-1),
                            final.z.reshape(-1)], axis=-1)
    return ldr_flat, accum_flat
