"""Texture-array sampling.

Replaces the reference's hardware sampler over 1024x1024 texture arrays
(builder.rs:477-575; sampled with `textureSampleLevel(..., 0.0)` and repeat
addressing). Color textures are pre-decoded sRGB->linear at build time, so
bilinear filtering here happens in linear space exactly like hardware
Rgba8UnormSrgb (decode-then-filter).

Sampling is 4 flat gathers + lerp, fully vectorized over rays.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..scene.material import NO_TEXTURE


def sample_bilinear(tex, layer, uv):
    """Sample [L, H, W, 3] array with repeat addressing + bilinear filter.

    Args:
      tex: [L, H, W, 3] (any float dtype; bf16 storage upcasts here).
      layer: [R] int32 texture ids. ``NO_TEXTURE`` lanes return 1.0 (callers
        typically multiply; matches the reference's `if tex_id != 65535`
        guards, e.g. gbuffer.wgsl:182-193).
      uv: [R, 2] float32.

    Returns [R, 3] float32.
    """
    l, h, w = tex.shape[0], tex.shape[1], tex.shape[2]
    valid = layer != NO_TEXTURE
    layer_safe = jnp.where(valid, jnp.minimum(layer, l - 1), 0)

    x = uv[:, 0] * w - 0.5
    y = uv[:, 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    xi0 = jnp.mod(x0, w)
    xi1 = jnp.mod(x0 + 1, w)
    yi0 = jnp.mod(y0, h)
    yi1 = jnp.mod(y0 + 1, h)

    flat = tex.reshape(-1, 3)
    base = layer_safe * (h * w)

    def fetch(yi, xi):
        return flat[base + yi * w + xi].astype(jnp.float32)

    c00 = fetch(yi0, xi0)
    c10 = fetch(yi0, xi1)
    c01 = fetch(yi1, xi0)
    c11 = fetch(yi1, xi1)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    out = top * (1 - fy) + bot * fy
    return jnp.where(valid[:, None], out, 1.0)
