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
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..utils import math3d

_B3 = [1 / 16, 1 / 4, 3 / 8, 1 / 4, 1 / 16]

SIGMA_ALBEDO = 0.15
SIGMA_NORMAL = 12.0
SIGMA_POS = 0.8


def _shift(img, dy, dx):
    h, w = img.shape[0], img.shape[1]
    out = jnp.roll(img, (-dy, -dx), axis=(0, 1))
    ys = jnp.arange(h)[:, None] + dy
    xs = jnp.arange(w)[None, :] + dx
    valid = (ys >= 0) & (ys < h) & (xs >= 0) & (xs < w)
    return out, valid


def atrous_denoise(hdr, albedo, oct_normal, pos, iterations: int = 4):
    """Denoise an HDR frame guided by its G-buffer.

    Args:
      hdr: [H, W, 3] linear radiance.
      albedo: [H, W, 3]; oct_normal: [H, W, 2]; pos: [H, W, 3].
      iterations: a-trous levels (dilation 1, 2, 4, ...).

    Returns [H, W, 3] denoised radiance.
    """
    normal = math3d.oct_decode(oct_normal)
    # demodulate albedo so texture detail is untouched (OIDN-style)
    alb_safe = jnp.maximum(albedo, 1e-3)
    irr = hdr / alb_safe

    for level in range(iterations):
        step = 1 << level
        sum_c = jnp.zeros_like(irr)
        sum_w = jnp.zeros(irr.shape[:2], irr.dtype)
        for ky in range(5):
            for kx in range(5):
                dy = (ky - 2) * step
                dx = (kx - 2) * step
                c, ok = _shift(irr, dy, dx)
                a, _ = _shift(albedo, dy, dx)
                n, _ = _shift(normal, dy, dx)
                p, _ = _shift(pos, dy, dx)

                w_k = _B3[ky] * _B3[kx]
                da = a - albedo
                w_a = jnp.exp(-jnp.sum(da * da, -1) / (2 * SIGMA_ALBEDO ** 2))
                w_n = jnp.maximum(jnp.sum(n * normal, -1), 0.0) ** SIGMA_NORMAL
                dp = p - pos
                w_p = jnp.exp(-jnp.sum(dp * dp, -1) / (2 * SIGMA_POS ** 2))

                w = w_k * w_a * w_n * w_p * ok
                sum_c = sum_c + c * w[..., None]
                sum_w = sum_w + w
        irr = jnp.where((sum_w > 1e-6)[..., None],
                        sum_c / jnp.maximum(sum_w, 1e-6)[..., None], irr)

    return irr * alb_safe
