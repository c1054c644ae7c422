"""Hit-point reconstruction from triangle ids + barycentrics.

TPU equivalent of `reconstruct_geometry_hit` (restir.wgsl:383-441) and the
G-buffer hit processing (gbuffer.wgsl:124-174). Instead of chasing the
reference's index -> attribute -> instance indirection with many narrow
gathers (each costs ~4 ms at 262k rays on TPU), the scene compile bakes ONE
wide per-triangle shading row (scene.tri_table, world-space, unnormalized
per-vertex normals/tangents so normalize-after-interpolate matches the
reference's transform order exactly) and this pass does a single row gather
plus pure VPU interpolation.

Materials gather through `select_gather` (exact one-hot matmul) for small
material sets, falling back to a native row gather for large ones.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import math3d
from .gather import select_gather

SELECT_GATHER_MAX = 32


def _matvec9(m, v):
    """Per-lane 3x3 matvec: m [R, 9] row-major, v [R, 3] -> [R, 3]."""
    return jnp.stack([
        m[:, 0] * v[:, 0] + m[:, 1] * v[:, 1] + m[:, 2] * v[:, 2],
        m[:, 3] * v[:, 0] + m[:, 4] * v[:, 1] + m[:, 5] * v[:, 2],
        m[:, 6] * v[:, 0] + m[:, 7] * v[:, 1] + m[:, 8] * v[:, 2],
    ], axis=-1)


def _reconstruct_hit_instanced(scene, tri_id, inst_id, ray_o, ray_d, t):
    """Instanced-scene hit reconstruction: tri_table rows are OBJECT-space
    (shared across instances); the winner's (A^-1 | b | normal-matrix |
    det-sign | mat_id) row comes from scene.inst_table. Barycentrics are
    recomputed exactly in object space (t is identical in both spaces -
    directions stay unnormalized through the transform); normals/tangents
    interpolate in object space then transform by the normal matrix
    (linear maps commute with interpolation, so this matches the
    reference's transform-then-interpolate order up to reassociation)."""
    safe_tri = jnp.maximum(tri_id, 0)
    rows = scene.tri_table[safe_tri]                   # [R, 35] one gather
    n_inst = scene.inst_table.shape[0]
    safe_inst = jnp.clip(inst_id, 0, n_inst - 1)
    if n_inst <= SELECT_GATHER_MAX:
        irow = select_gather(scene.inst_table, safe_inst)
    else:
        irow = scene.inst_table[safe_inst]             # [R, 23]
    a = irow[:, 0:9]
    binv = irow[:, 9:12]
    nm = irow[:, 12:21]
    detsign = irow[:, 21]
    mat_id = irow[:, 22].astype(jnp.int32)

    o_obj = _matvec9(a, ray_o) + binv
    d_obj = _matvec9(a, ray_d)

    v0 = rows[:, 26:29]
    e1 = rows[:, 29:32]
    e2 = rows[:, 32:35]
    pvec = jnp.cross(d_obj, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    det_ok = jnp.abs(det) > 1e-9
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    tvec = o_obj - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d_obj * qvec, axis=-1) * inv_det
    front = det * detsign > 0.0
    t = jnp.where(det_ok, jnp.sum(e2 * qvec, axis=-1) * inv_det, t)

    w = (1.0 - u - v)[:, None]
    uu = u[:, None]
    vv = v[:, None]
    n_obj = rows[:, 0:3] * w + rows[:, 3:6] * uu + rows[:, 6:9] * vv
    normal = math3d.normalize(_matvec9(nm, n_obj))
    uv_interp = rows[:, 9:11] * w + rows[:, 11:13] * uu + rows[:, 13:15] * vv
    tg_obj = rows[:, 15:18] * w + rows[:, 18:21] * uu + rows[:, 21:24] * vv
    tangent = jnp.concatenate(
        [math3d.normalize(_matvec9(nm, tg_obj)), rows[:, 24:25]], axis=-1)

    ffnormal = jnp.where(front[:, None], normal, -normal)
    pos = ray_o + ray_d * t[:, None]
    return {
        "pos": pos,
        "normal": normal,
        "ffnormal": ffnormal,
        "uv": uv_interp,
        "tangent": tangent,
        "mat_id": mat_id,
        "front": front,
        "t": t,
    }


def reconstruct_hit(scene, tri_id, ray_o, ray_d, t, inst_id=None):
    """Gather + interpolate hit attributes via the consolidated tri table.

    The intersector returns only (t, tri); barycentrics and facing are
    recomputed here EXACTLY (same f32 Moller-Trumbore terms) from the
    world v0/e1/e2 columns of the same wide row - one [R]-sized recompute
    instead of winner-attribute selection inside the [BR x CT] sweep.

    inst_id: winning instance per lane - REQUIRED for instanced scenes
    (tri_id is then an object triangle id).

    Returns dict: pos[R,3], normal[R,3] (shading, world), ffnormal[R,3],
    uv[R,2], tangent[R,4], mat_id[R] i32, front[R], t[R].
    """
    if scene.instanced:
        return _reconstruct_hit_instanced(scene, tri_id, inst_id,
                                          ray_o, ray_d, t)
    safe_tri = jnp.maximum(tri_id, 0)
    rows = scene.tri_table[safe_tri]                   # [R, 35] one gather

    v0 = rows[:, 26:29]
    e1 = rows[:, 29:32]
    e2 = rows[:, 32:35]
    pvec = jnp.cross(ray_d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    det_ok = jnp.abs(det) > 1e-9
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    tvec = ray_o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(ray_d * qvec, axis=-1) * inv_det
    front = det > 0.0
    # exact t: the MXU intersector's ordering t carries ~2^-16 relative
    # error; positions/MIS distances use the exact f32 value instead.
    t = jnp.where(det_ok, jnp.sum(e2 * qvec, axis=-1) * inv_det, t)

    w = (1.0 - u - v)[:, None]
    uu = u[:, None]
    vv = v[:, None]

    n = rows[:, 0:3] * w + rows[:, 3:6] * uu + rows[:, 6:9] * vv
    normal = math3d.normalize(n)
    uv_interp = rows[:, 9:11] * w + rows[:, 11:13] * uu + rows[:, 13:15] * vv
    tg = rows[:, 15:18] * w + rows[:, 18:21] * uu + rows[:, 21:24] * vv
    tangent = jnp.concatenate([math3d.normalize(tg), rows[:, 24:25]], axis=-1)
    mat_id = rows[:, 25].astype(jnp.int32)

    ffnormal = jnp.where(front[:, None], normal, -normal)
    pos = ray_o + ray_d * t[:, None]

    return {
        "pos": pos,
        "normal": normal,
        "ffnormal": ffnormal,
        "uv": uv_interp,
        "tangent": tangent,
        "mat_id": mat_id,
        "front": front,
        "t": t,
    }


def gather_material(scene, mat_id):
    """One-shot material row fetch -> dict of lanes (see mat_table layout)."""
    m = scene.mat_table.shape[0]
    idx = jnp.clip(mat_id, 0, m - 1)
    if m <= SELECT_GATHER_MAX:
        rows = select_gather(scene.mat_table, idx)
    else:
        rows = scene.mat_table[idx]
    return {
        "base_color": rows[:, 0:4],
        "emissive_factor": rows[:, 4:7],
        "roughness": rows[:, 7],
        "metallic": rows[:, 8],
        "transmission": rows[:, 9],
        "ior": rows[:, 10],
        "light_index": rows[:, 11].astype(jnp.int32),
        "tex_id": rows[:, 12].astype(jnp.int32),
        "normal_tex_id": rows[:, 13].astype(jnp.int32),
        "occlusion_tex_id": rows[:, 14].astype(jnp.int32),
        "emissive_tex_id": rows[:, 15].astype(jnp.int32),
        "metallic_roughness_tex_id": rows[:, 16].astype(jnp.int32),
    }


def gather_light(scene, light_idx):
    """Light row fetch -> dict (position, type, u, area, v, emission)."""
    l = scene.light_table.shape[0]
    idx = jnp.clip(light_idx, 0, l - 1)
    if l <= SELECT_GATHER_MAX:
        rows = select_gather(scene.light_table, idx)
    else:
        rows = scene.light_table[idx]
    return {
        "position": rows[:, 0:3],
        "type": rows[:, 3].astype(jnp.int32),
        "u": rows[:, 4:7],
        "area": rows[:, 7],
        "v": rows[:, 8:11],
        "emission": rows[:, 11:15],
    }


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
