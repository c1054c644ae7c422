"""Hit-point reconstruction from triangle ids + barycentrics.

TPU equivalent of `reconstruct_geometry_hit` (restir.wgsl:383-441) and the
G-buffer hit processing (gbuffer.wgsl:124-174): given an original world-
triangle id from traversal, gather instance + mesh attribute data and
interpolate shading attributes.

All gathers are flat [R]-indexed; the attribute layout is the reference's
global concatenated buffer scheme (builder.rs:123-141).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import math3d


def reconstruct_hit(scene, tri_id, u, v, front, ray_o, ray_d, t):
    """Gather + interpolate hit attributes.

    Args:
      scene: CompiledScene.
      tri_id: [R] i32 world-triangle ids (>= 0; callers mask invalid lanes).
      u, v: [R] barycentrics (for vertices 1 and 2; w = 1-u-v at vertex 0).
      front: [R] bool front-face flags.
      ray_o, ray_d: [R, 3]; t: [R].

    Returns dict: pos[R,3], normal[R,3] (shading, world), ffnormal[R,3],
    uv[R,2], tangent[R,4], mat_id[R], inst[R], front[R], t[R].
    """
    safe_tri = jnp.maximum(tri_id, 0)
    inst = scene.tri_inst[safe_tri]
    prim = scene.tri_prim[safe_tri]
    mesh_id = scene.inst_mesh_id[inst]
    mat_id = scene.inst_mat_id[inst]

    idx_offset = scene.mesh_index_offset[mesh_id] + prim * 3
    v_offset = scene.mesh_vertex_offset[mesh_id]
    i0 = scene.indices[idx_offset] + v_offset
    i1 = scene.indices[idx_offset + 1] + v_offset
    i2 = scene.indices[idx_offset + 2] + v_offset

    n0 = math3d.oct_decode(scene.attr_oct_normal[i0])
    n1 = math3d.oct_decode(scene.attr_oct_normal[i1])
    n2 = math3d.oct_decode(scene.attr_oct_normal[i2])
    t0 = scene.attr_tangent[i0]
    t1 = scene.attr_tangent[i1]
    t2 = scene.attr_tangent[i2]

    w = (1.0 - u - v)[:, None]
    uu = u[:, None]
    vv = v[:, None]
    local_normal = math3d.normalize(n0 * w + n1 * uu + n2 * vv)
    local_tangent = math3d.normalize(
        t0[:, :3] * w + t1[:, :3] * uu + t2[:, :3] * vv
    )
    uv_interp = (
        scene.attr_uv[i0] * w + scene.attr_uv[i1] * uu + scene.attr_uv[i2] * vv
    )

    # world_to_object normal transform (restir.wgsl:427-431): the compiled
    # scene stores (A^-1)^T per instance directly.
    nm = scene.inst_normal_mat[inst]  # [R, 3, 3]
    normal = math3d.normalize(jnp.einsum("rij,rj->ri", nm, local_normal))
    tangent_w = math3d.normalize(jnp.einsum("rij,rj->ri", nm, local_tangent))
    tangent = jnp.concatenate([tangent_w, t0[:, 3:4]], axis=-1)

    ffnormal = jnp.where(front[:, None], normal, -normal)
    pos = ray_o + ray_d * t[:, None]

    return {
        "pos": pos,
        "normal": normal,
        "ffnormal": ffnormal,
        "uv": uv_interp,
        "tangent": tangent,
        "mat_id": mat_id,
        "inst": inst,
        "front": front,
        "t": t,
    }


def gather_material(scene, mat_id):
    """Gather SoA material lanes for [R] material ids."""
    m = scene.materials
    safe = jnp.maximum(mat_id, 0)
    return {k: v[safe] for k, v in m.items()}


def apply_normal_map(ffnormal, tangent, normal_map_rgb, has_map):
    """Perturb ffnormal by a tangent-space normal map (restir.wgsl:655-671).

    Re-orthogonalizes T against the (possibly flipped) ffnormal and applies
    the tangent handedness sign from w.
    """
    normal_local = math3d.normalize(normal_map_rgb * 2.0 - 1.0)
    sign = tangent[:, 3:4]
    t_raw = tangent[:, :3]
    t_ff = math3d.normalize(
        t_raw - ffnormal * math3d.dot(ffnormal, t_raw, keepdims=True)
    )
    b_ff = math3d.normalize(jnp.cross(ffnormal, t_ff)) * sign
    perturbed = math3d.normalize(
        t_ff * normal_local[:, 0:1]
        + b_ff * normal_local[:, 1:2]
        + ffnormal * normal_local[:, 2:3]
    )
    return jnp.where(has_map[:, None], perturbed, ffnormal)
