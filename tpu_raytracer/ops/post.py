"""Post pass: joint bilateral filter, variance-clipped TAA / progressive
accumulation, reversible tonemap, gamma encode.

Vectorized port of post.wgsl:61-282 operating on [H, W, C] arrays:
  - 5x5 joint bilateral over the HDR input, weighted by spatial Gaussian
    (sigma 1.5), albedo similarity (sigma 0.2), normal^20, position
    (sigma 0.1) (post.wgsl:85-141); stencils are pad+shift sums - no
    gathers on TPU.
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

The reference's TAA camera jitter is disabled upstream exactly like the
reference (camera.rs:202-203 multiplies the Halton jitter by zero), so the
unjitter resampling path (post.wgsl:73-77) reduces to identity and is
omitted here.
"""

from __future__ import annotations

import jax.numpy as jnp

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


def _shift2d(img, dy, dx):
    """Shift with zero fill; also returns the validity mask of the shift."""
    h, w = img.shape[0], img.shape[1]
    out = jnp.roll(img, (-dy, -dx), axis=(0, 1))
    ys = jnp.arange(h)[:, None] + dy
    xs = jnp.arange(w)[None, :] + dx
    valid = (ys >= 0) & (ys < h) & (xs >= 0) & (xs < w)
    return out, valid


def bilateral_filter(hdr, albedo, normal, pos):
    """5x5 joint bilateral (post.wgsl:85-141). All inputs [H, W, 3]."""
    sum_color = jnp.zeros_like(hdr)
    sum_weight = jnp.zeros(hdr.shape[:2], hdr.dtype)
    for dy in range(-KERNEL_RADIUS, KERNEL_RADIUS + 1):
        for dx in range(-KERNEL_RADIUS, KERNEL_RADIUS + 1):
            s_col, ok = _shift2d(hdr, dy, dx)
            s_alb, _ = _shift2d(albedo, dy, dx)
            s_nrm, _ = _shift2d(normal, dy, dx)
            s_pos, _ = _shift2d(pos, dy, dx)

            import math
            w_spatial = math.exp(-(dx * dx + dy * dy)
                                 / (2.0 * SIGMA_SPATIAL ** 2))
            dc = s_alb - albedo
            w_color = _gauss(jnp.sum(dc * dc, -1), SIGMA_COLOR)
            dn = jnp.clip(jnp.sum(s_nrm * normal, -1), 0.0, 1.0)
            w_normal = dn ** 20
            dp = s_pos - pos
            w_pos = _gauss(jnp.sum(dp * dp, -1), SIGMA_POS)

            w = w_spatial * w_color * w_normal * w_pos * ok
            sum_color = sum_color + s_col * w[..., None]
            sum_weight = sum_weight + w
    filtered = jnp.where((sum_weight > 1e-3)[..., None],
                         sum_color / jnp.maximum(sum_weight, 1e-3)[..., None],
                         hdr)
    return filtered


def variance_bounds(hdr, filtered):
    """3x3 YCoCg moments of tonemapped color (post.wgsl:143-177)."""
    m1 = jnp.zeros_like(hdr)
    m2 = jnp.zeros_like(hdr)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s_col, ok = _shift2d(hdr, dy, dx)
            s_col = jnp.where(ok[..., None], s_col, filtered)
            s = rgb_to_ycocg(resolve_tonemap(s_col))
            m1 = m1 + s
            m2 = m2 + s * s
    m1 = m1 / 9.0
    m2 = m2 / 9.0
    sigma = jnp.sqrt(jnp.maximum(m2 - m1 * m1, 0.0))
    return m1 - VARIANCE_GAMMA * sigma, m1 + VARIANCE_GAMMA * sigma


def reproject_history(history, motion, width: int, height: int):
    """Manual bilinear tap of the accumulation buffer at uv+motion
    (post.wgsl:187-228). history [H*W, 3] flat; motion [H, W, 2].

    Returns (history_color_tm [H, W, 3] tonemapped, valid [H, W]).
    """
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32), indexing="ij")
    uv_x = (xs + 0.5) / width + motion[..., 0]
    uv_y = (ys + 0.5) / height + motion[..., 1]
    valid = (uv_x >= 0.0) & (uv_x <= 1.0) & (uv_y >= 0.0) & (uv_y <= 1.0)

    px = uv_x * width - 0.5
    py = uv_y * height - 0.5
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx = (px - x0.astype(jnp.float32))[..., None]
    fy = (py - y0.astype(jnp.float32))[..., None]

    def tap(yy, xx):
        ok = (xx >= 0) & (xx < width) & (yy >= 0) & (yy < height)
        idx = jnp.clip(yy, 0, height - 1) * width + jnp.clip(xx, 0, width - 1)
        c = history[idx.reshape(-1)].reshape(height, width, 3)
        return jnp.where(ok[..., None], resolve_tonemap(c), 0.0)

    c00 = tap(y0, x0)
    c10 = tap(y0, x0 + 1)
    c01 = tap(y0 + 1, x0)
    c11 = tap(y0 + 1, x0 + 1)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy, valid


def post_process(hdr_flat, history_flat, gb, frame_count, width: int,
                 height: int):
    """Full post pass. Returns (ldr_flat [n,3] gamma-encoded,
    new_accumulation_flat [n,3] linear HDR)."""
    from ..utils import math3d

    hdr = hdr_flat.reshape(height, width, 3)
    albedo = gb["albedo"].reshape(height, width, 3)
    normal = math3d.oct_decode(gb["oct_normal"]).reshape(height, width, 3)
    pos = gb["pos"].reshape(height, width, 3)
    motion = gb["motion"].reshape(height, width, 2)
    frame = jnp.asarray(frame_count, jnp.float32)

    filtered = bilateral_filter(hdr, albedo, normal, pos)
    c_min, c_max = variance_bounds(hdr, filtered)
    tm_filtered = resolve_tonemap(filtered)

    hist_tm, hist_valid = reproject_history(history_flat, motion, width, height)
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
