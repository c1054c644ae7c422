"""Ray-primitive intersection kernels (vectorized jnp).

Replaces the reference's hardware `ray_query` (gbuffer.wgsl:108-112,
restir.wgsl:601-607) with explicit math:
  - Moller-Trumbore ray/triangle (watertight enough for the scenes at hand)
  - AABB slab test (for BVH traversal)

All functions are batched: rays [..., 3], triangles broadcastable against
rays. Misses are reported as ``t = inf``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

INF = np.float32(3.0e38)
_MT_EPS = 1e-9


def moller_trumbore(ray_o, ray_d, v0, e1, e2, t_min, t_max):
    """Ray/triangle test. e1 = v1 - v0, e2 = v2 - v0 (precomputed).

    Returns (hit, t, u, v, front_face). ``front_face`` is true when the ray
    hits the CCW front side (geometric normal e1 x e2 faces the ray origin),
    matching wgpu's `front_face` committed-intersection flag with the default
    CCW winding.
    """
    pvec = jnp.cross(ray_d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > _MT_EPS, 1.0 / det, 0.0)
    tvec = ray_o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(ray_d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (
        (jnp.abs(det) > _MT_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    front_face = det > 0.0
    return hit, jnp.where(hit, t, INF), u, v, front_face


def aabb_slab(ray_o, inv_d, box_min, box_max, t_min, t_max):
    """Slab test; returns True where the ray segment overlaps the box."""
    t0 = (box_min - ray_o) * inv_d
    t1 = (box_max - ray_o) * inv_d
    t_near = jnp.minimum(t0, t1)
    t_far = jnp.maximum(t0, t1)
    t_entry = jnp.maximum(jnp.max(t_near, axis=-1), t_min)
    t_exit = jnp.minimum(jnp.min(t_far, axis=-1), t_max)
    return t_entry <= t_exit


def safe_inv_dir(ray_d):
    """1/d with +-inf avoided (huge finite instead), sign-preserving."""
    d = jnp.where(jnp.abs(ray_d) < 1e-12, jnp.where(ray_d < 0, -1e-12, 1e-12), ray_d)
    return 1.0 / d
