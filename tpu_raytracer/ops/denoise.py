"""Edge-aware a-trous wavelet denoiser: the OIDN screenshot path.

The reference pipes screenshots through Intel OIDN (CPU neural denoiser,
src/screenshot.rs:69-118, optional `ai-denoise` feature). The TPU-native
replacement is an SVGF-style edge-aware a-trous wavelet filter guided by
the G-buffer (albedo/normal/depth), run fully on-device as part of the
screenshot pass (BASELINE.md config 5):

  - N iterations of the 5x5 B3-spline a-trous kernel with power-of-two
    dilation (Dammertz et al. 2010),
  - edge-stopping weights on world position, normal and albedo so the
    filter smooths illumination noise without crossing geometry,
  - operates on demodulated irradiance (color / albedo) and remodulates,
    preserving texture detail exactly like OIDN's albedo-guided mode.

Pure jnp roll+mask stencils; runs identically on any backend and shards
over row bands like the post pass (dilated taps stay within the halo for
the sizes used at screenshot time; full-frame screenshots run unsharded).

Layout (r3): every stencil runs on per-channel [H, W] PLANES (V3-of-
planes for colors) - a rank-3 [H, W, 3] intermediate tiles its minor dim
3 to 128 lanes on TPU (42x HBM traffic), which dominated the 4K
screenshot time. Inputs de-interleave through ONE tiled transpose each;
only the final output restacks.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import vec3
from ..utils.vec3 import V3

_B3 = [1 / 16, 1 / 4, 3 / 8, 1 / 4, 1 / 16]

SIGMA_ALBEDO = 0.15
SIGMA_NORMAL = 12.0
SIGMA_POS = 0.8


def _to_planes(img):
    """[H, W, C] -> list of C dense [H, W] planes (one tiled transpose)."""
    h, w, c = img.shape
    t = img.reshape(h * w, c).T
    return [t[k].reshape(h, w) for k in range(c)]


def _shift(p, dy, dx):
    """Roll one [H, W] plane; mask handled once by the caller."""
    return jnp.roll(p, (-dy, -dx), axis=(0, 1))


def _shift3(v, dy, dx):
    return V3(_shift(v.x, dy, dx), _shift(v.y, dy, dx), _shift(v.z, dy, dx))


def atrous_denoise(hdr, albedo, oct_normal, pos, iterations: int = 4):
    """Denoise an HDR frame guided by its G-buffer.

    Args:
      hdr: [H, W, 3] linear radiance.
      albedo: [H, W, 3]; oct_normal: [H, W, 2]; pos: [H, W, 3].
      iterations: a-trous levels (dilation 1, 2, 4, ...).

    Returns [H, W, 3] denoised radiance.
    """
    h, w = hdr.shape[0], hdr.shape[1]
    hp = V3(*_to_planes(hdr))
    ap = V3(*_to_planes(albedo))
    ox, oy = _to_planes(oct_normal)
    normal = vec3.oct_decode(ox, oy)
    pp = V3(*_to_planes(pos))

    # demodulate albedo so texture detail is untouched (OIDN-style)
    alb_safe = V3(jnp.maximum(ap.x, 1e-3), jnp.maximum(ap.y, 1e-3),
                  jnp.maximum(ap.z, 1e-3))
    irr = hp / alb_safe

    ys = jnp.arange(h, dtype=jnp.int32)[:, None]
    xs = jnp.arange(w, dtype=jnp.int32)[None, :]

    for level in range(iterations):
        step = 1 << level
        sum_c = vec3.splat(0.0, irr.x)
        sum_w = jnp.zeros_like(irr.x)
        for ky in range(5):
            for kx in range(5):
                dy = (ky - 2) * step
                dx = (kx - 2) * step
                c = _shift3(irr, dy, dx)
                a = _shift3(ap, dy, dx)
                n = _shift3(normal, dy, dx)
                p = _shift3(pp, dy, dx)
                ok = ((ys + dy >= 0) & (ys + dy < h)
                      & (xs + dx >= 0) & (xs + dx < w))

                w_k = _B3[ky] * _B3[kx]
                da = a - ap
                w_a = jnp.exp(-vec3.dot(da, da) / (2 * SIGMA_ALBEDO ** 2))
                w_n = jnp.maximum(vec3.dot(n, normal), 0.0) ** SIGMA_NORMAL
                dp = p - pp
                w_p = jnp.exp(-vec3.dot(dp, dp) / (2 * SIGMA_POS ** 2))

                wgt = w_k * w_a * w_n * w_p * ok
                sum_c = sum_c + c * wgt
                sum_w = sum_w + wgt
        irr = vec3.where(sum_w > 1e-6,
                         sum_c / jnp.maximum(sum_w, 1e-6), irr)

    out = irr * alb_safe
    return jnp.stack([out.x, out.y, out.z], axis=0
                     ).reshape(3, h * w).T.reshape(h, w, 3)
