"""ReSTIR: seed-replay reservoir resampling (temporal + spatial).

Vectorized port of restir.wgsl:788-918 (temporal) and
restir_spatial.wgsl:857-1016 (spatial). Reservoirs are SoA arrays; each
stores only the winning path SEED `y` plus cached p_hat and the first-bounce
vertex `s_path` for the reconnection-shift Jacobian - paths are re-traced
from the seed at shade time exactly like the reference (restir.wgsl:28-35).

The reference's ping-pong reservoir buffers (restir.rs:362-378 fixed
read/write flow) become pure dataflow: temporal consumes last frame's
spatial output and returns a fresh reservoir set.

RNG streams: candidate seeds come from `pcg_hash(pixel + frame * 927163)`
(restir.wgsl:797); reuse logic draws from the separate raw-LCG stream
(restir.wgsl:781-786, rand_lcg) - both reproduced bit-exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import math3d, rng
from . import path_trace

MAX_M_TEMPORAL = 16   # restir.wgsl:851
MAX_M_SPATIAL = 20    # restir_spatial.wgsl:893,989
MAX_W = 20.0          # restir_spatial.wgsl:1005


def empty_reservoirs(n: int) -> dict:
    return {
        "y": jnp.zeros((n,), jnp.uint32),
        "w_sum": jnp.zeros((n,), jnp.float32),
        "M": jnp.zeros((n,), jnp.int32),
        "W": jnp.zeros((n,), jnp.float32),
        "p_hat": jnp.zeros((n,), jnp.float32),
        "s_path": jnp.zeros((n, 3), jnp.float32),
    }


def _update_reservoir(res, mask, y_new, w, rnd, cnt, p_hat_new, s_path_new):
    """Vectorized update_reservoir (restir.wgsl:746-756) on masked lanes."""
    w_sum = res["w_sum"] + jnp.where(mask, w, 0.0)
    m = res["M"] + jnp.where(mask, cnt, 0)
    take = mask & (rnd * w_sum < w)
    return {
        "y": jnp.where(take, y_new, res["y"]),
        "w_sum": w_sum,
        "M": m,
        "W": res["W"],
        "p_hat": jnp.where(take, p_hat_new, res["p_hat"]),
        "s_path": jnp.where(take[:, None], s_path_new, res["s_path"]),
    }


def _is_valid_neighbor_temporal(curr_pos, curr_normal, curr_mat,
                                prev_pos, prev_normal, prev_mat, camera_pos):
    """restir.wgsl:758-778."""
    ok = curr_mat == prev_mat
    ok &= math3d.dot(curr_normal, prev_normal) >= 0.99
    dd = curr_pos - prev_pos
    dist_diff_sq = math3d.dot(dd, dd)
    dc = curr_pos - camera_pos[None, :]
    threshold = jnp.maximum(1e-5, math3d.dot(dc, dc) * 1e-3)
    ok &= dist_diff_sq <= threshold
    return ok


def _is_valid_neighbor_spatial(scene, curr_pos, curr_normal, curr_mat,
                               n_pos, n_normal, n_mat, camera_pos):
    """restir_spatial.wgsl:783-814 (specular-aware thresholds)."""
    mat_rough = scene.materials["roughness"][jnp.maximum(curr_mat, 0)]
    mat_metal = scene.materials["metallic"][jnp.maximum(curr_mat, 0)]
    mat_trans = scene.materials["transmission"][jnp.maximum(curr_mat, 0)]
    is_specular = (mat_rough < 0.2) | (mat_metal > 0.8) | (mat_trans > 0.01)

    ok = curr_mat == n_mat
    ndot = math3d.dot(curr_normal, n_normal)
    dd = curr_pos - n_pos
    dist_diff_sq = math3d.dot(dd, dd)
    dc = curr_pos - camera_pos[None, :]
    threshold = jnp.maximum(1e-5, math3d.dot(dc, dc) * 1e-3)

    spec_ok = (ndot >= 0.998) & (jnp.sqrt(dist_diff_sq) <= 0.01)
    diff_ok = (ndot >= 0.995) & (dist_diff_sq <= threshold)
    return ok & jnp.where(is_specular, spec_ok, diff_ok)


def restir_temporal(scene, gb, prev_gb, prev_reservoirs, camera, frame_count,
                    width: int, height: int):
    """Candidate generation + temporal reuse. Returns new reservoirs."""
    n = width * height
    pixel_idx = jnp.arange(n, dtype=jnp.uint32)
    frame = jnp.asarray(frame_count, jnp.uint32)
    seed_base = pixel_idx + frame * jnp.uint32(927163)
    seed_candidate = rng.pcg_hash(seed_base)
    local_seed = seed_base

    valid = gb["valid"]
    res = empty_reservoirs(n)

    # Phase 1: candidate path (restir.wgsl:826-841)
    pr = path_trace.trace_path(scene, gb, camera["view_pos"][:3], seed_candidate)
    p_hat = math3d.luminance(pr["radiance"])
    res = _update_reservoir(res, valid, seed_candidate, p_hat,
                            jnp.float32(0.5), 1, p_hat, pr["v1_pos"])
    res["W"] = jnp.where(valid & (p_hat > 0.0), 1.0, 0.0)

    # Phase 2: temporal reuse (restir.wgsl:846-899)
    xs = pixel_idx % jnp.uint32(width)
    ys = pixel_idx // jnp.uint32(width)
    uv = jnp.stack([(xs.astype(jnp.float32) + 0.5) / width,
                    (ys.astype(jnp.float32) + 0.5) / height], axis=-1)
    prev_uv = uv + gb["motion"]
    in_screen = ((prev_uv[:, 0] >= 0.0) & (prev_uv[:, 0] <= 1.0)
                 & (prev_uv[:, 1] >= 0.0) & (prev_uv[:, 1] <= 1.0))
    prev_x = (prev_uv[:, 0] * width).astype(jnp.int32)
    prev_y = (prev_uv[:, 1] * height).astype(jnp.int32)
    prev_x = jnp.clip(prev_x, 0, width - 1)
    prev_y = jnp.clip(prev_y, 0, height - 1)
    prev_idx = prev_y * width + prev_x

    p_pos = prev_gb["pos"][prev_idx]
    p_norm = math3d.oct_decode(prev_gb["oct_normal"][prev_idx])
    p_mat = prev_gb["mat_id"][prev_idx]
    p_valid = prev_gb["valid"][prev_idx]
    c_norm = math3d.oct_decode(gb["oct_normal"])

    mid = jnp.maximum(gb["mat_id"], 0)
    is_specular = ((scene.materials["roughness"][mid] < 0.2)
                   | (scene.materials["metallic"][mid] > 0.8)
                   | (scene.materials["transmission"][mid] > 0.01))

    geo_ok = _is_valid_neighbor_temporal(
        gb["pos"], c_norm, gb["mat_id"], p_pos, p_norm, p_mat,
        camera["view_pos"][:3])
    reuse = valid & in_screen & p_valid & geo_ok & ~is_specular

    # albedo-luminance correction (restir.wgsl:879-898)
    l_curr = math3d.luminance(gb["albedo"]) + 1e-3
    l_prev = math3d.luminance(prev_gb["albedo"][prev_idx]) + 1e-3
    albedo_ratio = l_curr / l_prev
    reuse &= (albedo_ratio < 3.0) & (albedo_ratio > 0.33)

    prev_y_seed = prev_reservoirs["y"][prev_idx]
    prev_w = prev_reservoirs["W"][prev_idx]
    prev_m = prev_reservoirs["M"][prev_idx]
    prev_phat = prev_reservoirs["p_hat"][prev_idx]
    prev_spath = prev_reservoirs["s_path"][prev_idx]

    p_hat_new = prev_phat * albedo_ratio
    reuse &= p_hat_new > 0.0
    clamped_m = jnp.minimum(prev_m, MAX_M_TEMPORAL)
    w_prev = p_hat_new * prev_w * clamped_m.astype(jnp.float32)

    local_seed, rnd = rng.rand_lcg_if(local_seed, reuse)
    res = _update_reservoir(res, reuse, prev_y_seed, w_prev, rnd, clamped_m,
                            p_hat_new, prev_spath)

    # Phase 3: finalize W (restir.wgsl:904-916)
    p_final = res["p_hat"]
    m_f = jnp.maximum(res["M"].astype(jnp.float32), 1.0)
    w_ok = valid & (p_final > 0.0)
    res["W"] = jnp.where(w_ok, (1.0 / jnp.maximum(p_final, 1e-20))
                         * (res["w_sum"] / m_f), 0.0)
    res["p_hat"] = jnp.where(w_ok, res["p_hat"], 0.0)
    # background lanes cleared (restir.wgsl:805-811)
    for k in ("y",):
        res[k] = jnp.where(valid, res[k], 0)
    for k in ("w_sum", "W", "p_hat"):
        res[k] = jnp.where(valid, res[k], 0.0)
    res["M"] = jnp.where(valid, res["M"], 0)
    return res


def _calculate_jacobian(curr_pos, curr_normal, curr_albedo,
                        neighbor_v1, n_pos, n_normal, n_albedo):
    """Reconnection-shift Jacobian (restir_spatial.wgsl:822-854)."""
    dir_curr = neighbor_v1 - curr_pos
    cos_curr = jnp.maximum(math3d.dot(curr_normal, math3d.normalize(dir_curr)), 0.0)
    dir_neigh = neighbor_v1 - n_pos
    cos_neigh = jnp.maximum(math3d.dot(n_normal, math3d.normalize(dir_neigh)), 0.0)

    jac = cos_curr / jnp.maximum(cos_neigh, 1e-12)
    lum_curr = math3d.luminance(curr_albedo) + 1e-3
    lum_neigh = math3d.luminance(n_albedo) + 1e-3
    jac = jac * (lum_curr / lum_neigh)
    jac = jnp.clip(jac, 0.1, 10.0)
    return jnp.where(cos_neigh <= 1e-3, 0.0, jac)


def restir_spatial(scene, gb, in_reservoirs, camera, frame_count,
                   width: int, height: int):
    """Spatial reuse + final seed replay + shade.

    Returns (out_reservoirs, hdr_radiance [n,3]).
    """
    from .trace_api import scene_occluded

    n = width * height
    pixel_idx = jnp.arange(n, dtype=jnp.uint32)
    frame = jnp.asarray(frame_count, jnp.uint32)
    seed_init = pixel_idx + frame * jnp.uint32(0x12345678)
    local_seed = seed_init

    valid = gb["valid"]
    pos = gb["pos"]
    normal = math3d.oct_decode(gb["oct_normal"])
    mat_id = gb["mat_id"]
    albedo = gb["albedo"]
    camera_pos = camera["view_pos"][:3]

    mid = jnp.maximum(mat_id, 0)
    is_specular = ((scene.materials["roughness"][mid] < 0.1)
                   | (scene.materials["metallic"][mid] > 0.9)
                   | (scene.materials["transmission"][mid] > 0.1))
    num_neighbors = jnp.where(is_specular, 3, 5)   # restir_spatial.wgsl:901-910
    radius = jnp.where(is_specular, 4.0, 10.0)

    # own reservoir, M-clamped with w_sum rescale (restir_spatial.wgsl:892-896)
    res = {k: v for k, v in in_reservoirs.items()}
    over = res["M"] > MAX_M_SPATIAL
    res["w_sum"] = jnp.where(
        over, res["w_sum"] * MAX_M_SPATIAL / jnp.maximum(res["M"], 1), res["w_sum"])
    res["M"] = jnp.minimum(res["M"], MAX_M_SPATIAL)

    xs = (pixel_idx % jnp.uint32(width)).astype(jnp.int32)
    ys = (pixel_idx // jnp.uint32(width)).astype(jnp.int32)

    for i in range(5):
        it_active = valid & (i < num_neighbors)
        local_seed, r1 = rng.rand_lcg_if(local_seed, it_active)
        local_seed, r2 = rng.rand_lcg_if(local_seed, it_active)
        angle = 2.0 * jnp.pi * r1
        rad = jnp.sqrt(r2) * radius
        ox = (jnp.cos(angle) * rad).astype(jnp.int32)
        oy = (jnp.sin(angle) * rad).astype(jnp.int32)
        nx = xs + ox
        ny = ys + oy
        in_bounds = (nx >= 0) & (nx < width) & (ny >= 0) & (ny < height)
        n_idx = jnp.clip(ny, 0, height - 1) * width + jnp.clip(nx, 0, width - 1)

        n_valid = gb["valid"][n_idx]
        n_pos = gb["pos"][n_idx]
        n_norm = math3d.oct_decode(gb["oct_normal"][n_idx])
        n_mat = gb["mat_id"][n_idx]
        n_alb = gb["albedo"][n_idx]

        ok = it_active & in_bounds & n_valid
        ok &= _is_valid_neighbor_spatial(
            scene, pos, normal, mat_id, n_pos, n_norm, n_mat, camera_pos)

        nb_y = in_reservoirs["y"][n_idx]
        nb_w = in_reservoirs["W"][n_idx]
        nb_m = in_reservoirs["M"][n_idx]
        nb_phat = in_reservoirs["p_hat"][n_idx]
        nb_spath = in_reservoirs["s_path"][n_idx]
        ok &= nb_phat > 0.0

        jac = _calculate_jacobian(pos, normal, albedo, nb_spath, n_pos,
                                  n_norm, n_alb)
        ok &= ~(is_specular & ((jac < 0.5) | (jac > 2.0)))

        # visibility re-check to the neighbor's v1 (restir_spatial.wgsl:965-984)
        dir_to_v1 = nb_spath - pos
        dist_to_v1 = math3d.length(dir_to_v1)
        facing = math3d.dot(normal, dir_to_v1) > 0.0
        far_enough = dist_to_v1 > 1e-3
        shadow_active = ok & facing & far_enough
        blocked = scene_occluded(
            scene, pos, dir_to_v1 / jnp.maximum(dist_to_v1, 1e-12)[:, None],
            1e-3, jnp.maximum(dist_to_v1 * 0.999, 0.0), active=shadow_active)
        ok = shadow_active & ~blocked

        p_hat_corr = nb_phat * jac
        m_new = jnp.minimum(nb_m, MAX_M_SPATIAL)
        weight = p_hat_corr * nb_w * m_new.astype(jnp.float32)
        local_seed, rnd = rng.rand_lcg_if(local_seed, ok)
        res = _update_reservoir(res, ok, nb_y, weight, rnd, m_new,
                                p_hat_corr, nb_spath)

    # Finalize: replay winning seed + shade (restir_spatial.wgsl:996-1015)
    final = path_trace.trace_path(scene, gb, camera_pos, res["y"])
    p_hat_final = math3d.luminance(final["radiance"])
    res["s_path"] = final["v1_pos"]
    m_f = jnp.maximum(res["M"].astype(jnp.float32), 1.0)
    has_energy = valid & (p_hat_final > 0.0)
    w_unclamped = (1.0 / jnp.maximum(p_hat_final, 1e-20)) * (res["w_sum"] / m_f)
    res["W"] = jnp.where(has_energy, jnp.clip(w_unclamped, 0.0, MAX_W), 0.0)
    res["p_hat"] = jnp.where(has_energy, p_hat_final, 0.0)
    hdr = jnp.where(has_energy[:, None], final["radiance"] * res["W"][:, None], 0.0)

    for k in ("w_sum", "W", "p_hat"):
        res[k] = jnp.where(valid, res[k], 0.0)
    res["M"] = jnp.where(valid, res["M"], 0)
    res["y"] = jnp.where(valid, res["y"], 0)
    res["s_path"] = jnp.where(valid[:, None], res["s_path"], 0.0)
    return res, hdr
