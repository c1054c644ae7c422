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


def pack_pairs(tex):
    """[L, H, W, 3] -> [L, H, W, 6]: each row stores texel x AND texel
    (x+1 mod W), so one row gather yields both bilinear x-taps. Costs 2x
    texture memory to halve the dominant per-sample cost (TPU gathers are
    ~15 ns/row regardless of width)."""
    import jax

    rolled = jnp.roll(tex, -1, axis=2)
    return jnp.concatenate([tex, rolled], axis=-1)


def sample_bilinear(tex_pairs, layer, uv):
    """Sample a pair-packed [L, H, W, 6] array with repeat addressing +
    bilinear filter (2 row gathers instead of 4 texel gathers).

    Args:
      tex_pairs: [L, H, W, 6] from `pack_pairs` (any float dtype).
      layer: [R] int32 texture ids. ``NO_TEXTURE`` lanes return 1.0 (callers
        typically multiply; matches the reference's `if tex_id != 65535`
        guards, e.g. gbuffer.wgsl:182-193).
      uv: [R, 2] float32.

    Returns [R, 3] float32.
    """
    l, h, w = tex_pairs.shape[0], tex_pairs.shape[1], tex_pairs.shape[2]
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
    yi0 = jnp.mod(y0, h)
    yi1 = jnp.mod(y0 + 1, h)

    flat = tex_pairs.reshape(-1, 6)
    base = layer_safe * (h * w)

    top_pair = flat[base + yi0 * w + xi0].astype(jnp.float32)   # [R, 6]
    bot_pair = flat[base + yi1 * w + xi0].astype(jnp.float32)

    top = top_pair[:, 0:3] * (1 - fx) + top_pair[:, 3:6] * fx
    bot = bot_pair[:, 0:3] * (1 - fx) + bot_pair[:, 3:6] * fx
    out = top * (1 - fy) + bot * fy
    return jnp.where(valid[:, None], out, 1.0)
