"""Stackless lock-step BVH traversal (replaces hardware `ray_query`).

See `bvh.py` for the unified-stream layout. Every ray lane holds one stream
pointer; each `while_loop` iteration performs a single 12-float gather and
evaluates BOTH the AABB slab test and the Moller-Trumbore test on the fetched
record, selecting per-lane by record kind. Control flow is identical across
lanes (`ptr < S`), so the VPU runs fully converged; divergence shows up only
as masked lanes, which stream compaction upstream (wavefront architecture)
keeps low.

Reference behavior being replaced:
  - closest-hit query: restir.wgsl:601-607, gbuffer.wgsl:108-112
  - any-hit shadow query (terminate on first hit, flag 0x4):
    restir.wgsl:375-381
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .intersect import INF, moller_trumbore, safe_inv_dir


@partial(jax.jit, static_argnames=("any_hit",))
def trace(bvh_rec, bvh_skip, bvh_tri_id, ray_o, ray_d, t_min, t_max,
          any_hit: bool = False, active=None):
    """Trace rays against a unified-stream BVH.

    Args:
      bvh_rec: [S, 12] f32, bvh_skip/bvh_tri_id: [S] i32 (see bvh.py).
      ray_o, ray_d: [R, 3]; t_min/t_max scalars or [R].
      any_hit: terminate lanes on first confirmed hit (shadow rays).
      active: optional [R] bool; inactive lanes skip traversal entirely
        (their stream pointer starts at the done sentinel) - the wavefront
        architecture's cheap lane kill for terminated paths.

    Returns dict with t [R] (INF on miss), tri [R] i32 (original tri id, -1
    on miss), u, v [R] f32 barycentrics, front [R] bool.
    """
    n_rays = ray_o.shape[0]
    s = bvh_rec.shape[0]
    inv_d = safe_inv_dir(ray_d)
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n_rays,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_rays,))

    ptr0 = jnp.zeros((n_rays,), jnp.int32)
    if active is not None:
        ptr0 = jnp.where(active, ptr0, s)
    init = (
        ptr0,                                      # ptr
        t_max,                                     # best t (also prunes boxes)
        jnp.full((n_rays,), -1, jnp.int32),        # best tri
        jnp.zeros((n_rays,), jnp.float32),         # u
        jnp.zeros((n_rays,), jnp.float32),         # v
        jnp.zeros((n_rays,), jnp.bool_),           # front face
    )

    def cond(state):
        return jnp.any(state[0] < s)

    def body(state):
        ptr, t_best, tri_best, u_best, v_best, ff_best = state
        active = ptr < s
        idx = jnp.minimum(ptr, s - 1)
        recs = bvh_rec[idx]                     # [R, 12] gather
        sk = bvh_skip[idx]
        tid = bvh_tri_id[idx]
        is_tri = sk < 0

        # Box: slab test against current best t (ordered pruning).
        a = (recs[:, 0:3] - ray_o) * inv_d
        b = (recs[:, 3:6] - ray_o) * inv_d
        t_near = jnp.minimum(a, b)
        t_far = jnp.maximum(a, b)
        t_entry = jnp.maximum(jnp.max(t_near, axis=-1), t_min)
        t_exit = jnp.minimum(jnp.min(t_far, axis=-1), t_best)
        box_hit = t_entry <= t_exit

        # Triangle: MT on the same record (v0 | e1 | e2 slots).
        hit, t, u, v, ff = moller_trumbore(
            ray_o, ray_d, recs[:, 0:3], recs[:, 3:6], recs[:, 6:9], t_min, t_best
        )
        tri_hit = is_tri & hit & active

        t_best = jnp.where(tri_hit, t, t_best)
        tri_best = jnp.where(tri_hit, tid, tri_best)
        u_best = jnp.where(tri_hit, u, u_best)
        v_best = jnp.where(tri_hit, v, v_best)
        ff_best = jnp.where(tri_hit, ff, ff_best)

        advance = is_tri | box_hit
        ptr_next = jnp.where(advance, ptr + 1, sk)
        if any_hit:
            ptr_next = jnp.where(tri_hit, s, ptr_next)
        ptr = jnp.where(active, ptr_next, ptr)
        return ptr, t_best, tri_best, u_best, v_best, ff_best

    _, t_best, tri_best, u_best, v_best, ff_best = jax.lax.while_loop(
        cond, body, init
    )
    missed = tri_best < 0
    return {
        "t": jnp.where(missed, INF, t_best),
        "tri": tri_best,
        "u": u_best,
        "v": v_best,
        "front": ff_best,
    }


def occluded(bvh_rec, bvh_skip, bvh_tri_id, ray_o, ray_d, t_min, t_max,
             active=None):
    """Shadow-ray query: True where ANY hit exists in (t_min, t_max).

    Matches trace_shadow_ray semantics (restir.wgsl:375-381) except the
    reference returns `true` on MISS (visibility); this returns occlusion -
    callers invert.
    """
    res = trace(bvh_rec, bvh_skip, bvh_tri_id, ray_o, ray_d, t_min, t_max,
                any_hit=True, active=active)
    return res["tri"] >= 0


def trace_brute(v0, e1, e2, ray_o, ray_d, t_min, t_max):
    """Reference brute-force closest hit over ALL triangles (for tests).

    v0/e1/e2: [T, 3]; rays [R, 3]. Returns same dict as `trace`.
    """
    hit, t, u, v, ff = jax.vmap(
        lambda o, d, tmn, tmx: moller_trumbore(
            o[None, :], d[None, :], v0, e1, e2, tmn, tmx
        ),
        in_axes=(0, 0, 0, 0),
    )(ray_o, ray_d,
      jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (ray_o.shape[0],)),
      jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (ray_o.shape[0],)))
    best = jnp.argmin(t, axis=1)
    r = jnp.arange(ray_o.shape[0])
    missed = ~hit[r, best]
    return {
        "t": jnp.where(missed, INF, t[r, best]),
        "tri": jnp.where(missed, -1, best.astype(jnp.int32)),
        "u": u[r, best],
        "v": v[r, best],
        "front": ff[r, best],
    }
