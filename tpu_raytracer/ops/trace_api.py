"""Unified ray-trace entry point: picks the right intersector per scene.

  - small/medium scenes (the interactive targets): Pallas blocked
    brute-force MT with triangles VMEM-resident (ops/pallas_trace.py)
  - large scenes: unified-stream BVH pointer traversal (ops/traversal.py)

The choice is static per compiled scene (triangle count is shape metadata),
so each jitted pipeline contains exactly one intersector.
"""

from __future__ import annotations

from . import pallas_trace, traversal

# Above this many triangles the BVH pointer walk wins over brute force.
BRUTE_FORCE_MAX_TRIS = 65536


def scene_trace(scene, ray_o, ray_d, t_min, t_max, any_hit=False, active=None):
    """Closest-hit (any_hit=False) or occlusion-style first-hit query."""
    if scene.tri_planes.shape[2] <= BRUTE_FORCE_MAX_TRIS:
        return pallas_trace.trace_brute_pallas(
            scene.tri_planes, ray_o, ray_d, t_min, t_max,
            any_hit=any_hit, active=active)
    return traversal.trace(
        scene.bvh_rec, scene.bvh_skip, scene.bvh_tri,
        ray_o, ray_d, t_min, t_max, any_hit=any_hit, active=active)


def scene_occluded(scene, ray_o, ray_d, t_min, t_max, active=None):
    res = scene_trace(scene, ray_o, ray_d, t_min, t_max, any_hit=True,
                      active=active)
    return res["tri"] >= 0
