"""Pallas TPU intersector: chunk-culled blocked Moller-Trumbore.

Why not per-lane BVH walks: on TPU those need random gathers, and XLA
gathers cost ~4 ms per fetch at G-buffer sizes while Mosaic's
`dynamic_gather` spans one 128-lane vreg. Instead, triangles sit
VMEM-resident in BVH-DFS order (spatially tight 128-tri chunks,
scene/builder.py) and intersection is a blocked sweep:

  1. A cheap XLA pre-pass slab-tests every live ray against every chunk
     AABB and OR-reduces per 256-ray block into a compacted per-block
     chunk WORKLIST (block-frustum culling; dead blocks get an empty
     list - free lane compaction for terminated wavefronts).
  2. The kernel walks only its block's worklist; each step is a fully
     unrolled [BR x CT] MT test in registers with an on-the-fly
     arg-min-t - zero divergence, zero in-kernel gathers.

Replaces hardware `ray_query` (gbuffer.wgsl:108, restir.wgsl:601) for the
default scene sizes; the unified-stream BVH (ops/traversal.py) remains the
large-scene path and the refit structure for TLAS-style updates.

Layout: triangles packed as 4 planes of shape [3, Tp]: v0, e1, e2 plus a
validity row (padding kills phantom hits); chunk AABBs [Tp/CT, 8]; rays
[8, R] (o.xyz, d.xyz, t_min, t_max).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 3.0e38

BR = 256      # rays per block (sublane-major)
CT = 128      # triangles per inner chunk (lane-major) = cull granularity
_MT_EPS = 1e-9


def pack_triangles(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray):
    """Host-side packing to the kernel layout.

    Returns (tri_planes [4, 3, Tp], chunk_aabb [Tp/CT, 8], Tp).
    Plane 3 row 0 is the validity mask (1.0 real, 0.0 padding).
    """
    t = v0.shape[0]
    tp = max(((t + CT - 1) // CT) * CT, CT)
    planes = np.zeros((4, 3, tp), np.float32)
    planes[0, :, :t] = v0.T
    planes[1, :, :t] = e1.T
    planes[2, :, :t] = e2.T
    planes[3, 0, :t] = 1.0

    # per-chunk world AABBs (BVH-DFS triangle order makes chunks spatially
    # tight) driving the per-block worklist cull.
    nc = tp // CT
    aabb = np.zeros((nc, 8), np.float32)
    v1 = v0 + e1
    v2 = v0 + e2
    mn = np.minimum(np.minimum(v0, v1), v2)
    mx = np.maximum(np.maximum(v0, v1), v2)
    for c in range(nc):
        lo = c * CT
        hi = min((c + 1) * CT, t)
        if lo < hi:
            aabb[c, 0:3] = mn[lo:hi].min(axis=0)
            aabb[c, 3:6] = mx[lo:hi].max(axis=0)
        else:
            aabb[c, 0:3] = INF
            aabb[c, 3:6] = -INF
    return planes, aabb, tp


def _mt_kernel(count_ref, list_ref, rays_ref, tri_ref, t_ref, idx_ref,
               uvf_ref, *, num_chunks, any_hit, use_worklist=True):
    rays = rays_ref[:]                      # [8, BR]
    ox, oy, oz = rays[0], rays[1], rays[2]  # [BR]
    dx, dy, dz = rays[3], rays[4], rays[5]
    t_min = rays[6]
    t_max = rays[7]

    # Per-block chunk worklist (host-of-kernel XLA pass): only chunks whose
    # AABB intersects some live ray of this block are visited - the
    # block-frustum culling that replaces per-ray BVH traversal. Dead
    # blocks have count 0 and skip the sweep entirely.
    b = pl.program_id(0)
    n_live = count_ref[b] if use_worklist else num_chunks

    def chunk(i, carry):
        t_best, idx_best, u_best, v_best, f_best = carry
        c = list_ref[i, b] if use_worklist else i
        tri = tri_ref[:, :, pl.ds(c * CT, CT)]    # [4, 3, CT]
        v0x, v0y, v0z = tri[0, 0], tri[0, 1], tri[0, 2]   # [CT]
        e1x, e1y, e1z = tri[1, 0], tri[1, 1], tri[1, 2]
        e2x, e2y, e2z = tri[2, 0], tri[2, 1], tri[2, 2]
        valid_t = tri[3, 0] > 0.5

        # broadcast rays down sublanes, tris along lanes: [BR, CT]
        rdx, rdy, rdz = dx[:, None], dy[:, None], dz[:, None]
        # pvec = d x e2
        px = rdy * e2z[None] - rdz * e2y[None]
        py = rdz * e2x[None] - rdx * e2z[None]
        pz = rdx * e2y[None] - rdy * e2x[None]
        det = e1x[None] * px + e1y[None] * py + e1z[None] * pz
        det_ok = jnp.abs(det) > _MT_EPS
        inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
        # tvec = o - v0
        tx = ox[:, None] - v0x[None]
        ty = oy[:, None] - v0y[None]
        tz = oz[:, None] - v0z[None]
        u = (tx * px + ty * py + tz * pz) * inv_det
        # qvec = tvec x e1
        qx = ty * e1z[None] - tz * e1y[None]
        qy = tz * e1x[None] - tx * e1z[None]
        qz = tx * e1y[None] - ty * e1x[None]
        v = (rdx * qx + rdy * qy + rdz * qz) * inv_det
        t = (e2x[None] * qx + e2y[None] * qy + e2z[None] * qz) * inv_det

        hit = (
            det_ok & valid_t[None]
            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > t_min[:, None]) & (t < t_max[:, None])
            & (t < t_best[:, None])
        )
        t_cand = jnp.where(hit, t, INF)
        best_lane = jnp.argmin(t_cand, axis=1)            # [BR]
        t_new = jnp.min(t_cand, axis=1)
        improved = t_new < t_best

        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (BR, CT), 1)
        sel = lane_ids == best_lane[:, None]
        u_new = jnp.sum(jnp.where(sel, u, 0.0), axis=1)
        v_new = jnp.sum(jnp.where(sel, v, 0.0), axis=1)
        f_new = jnp.sum(jnp.where(sel, jnp.where(det > 0, 1.0, 0.0), 0.0), axis=1)

        t_best = jnp.where(improved, t_new, t_best)
        idx_best = jnp.where(improved, c * CT + best_lane, idx_best)
        u_best = jnp.where(improved, u_new, u_best)
        v_best = jnp.where(improved, v_new, v_best)
        f_best = jnp.where(improved, f_new, f_best)
        return t_best, idx_best, u_best, v_best, f_best

    init = (
        jnp.full((BR,), INF, jnp.float32),
        jnp.full((BR,), -1, jnp.int32),
        jnp.zeros((BR,), jnp.float32),
        jnp.zeros((BR,), jnp.float32),
        jnp.zeros((BR,), jnp.float32),
    )
    t_best, idx_best, u_best, v_best, f_best = jax.lax.fori_loop(
        0, n_live, chunk, init
    )
    t_ref[0, :] = t_best
    idx_ref[0, :] = idx_best
    uvf_ref[0, :] = u_best
    uvf_ref[1, :] = v_best
    uvf_ref[2, :] = f_best


@functools.partial(jax.jit, static_argnames=("any_hit", "reorder"))
def trace_brute_pallas(tri_planes, chunk_aabb, ray_o, ray_d, t_min, t_max,
                       any_hit: bool = False, active=None,
                       reorder: str = "none"):
    """Closest-hit (or any-hit) over ALL triangles.

    Args:
      tri_planes: [4, 3, Tp] from `pack_triangles` (device array).
      ray_o, ray_d: [R, 3]; t_min/t_max scalar or [R].
      active: [R] bool; inactive lanes get t_max=0 (test nothing real).
      reorder: ray-stream permutation before blocking (ops/compaction.py):
        "none" keeps caller order; "live" packs active lanes first so
        trailing blocks die wholesale; "bins" additionally groups live
        lanes by direction octant so each block's chunk worklist stays
        short. Results are bit-identical across modes.

    Returns dict(t, tri, u, v, front) like traversal.trace.
    """
    r = ray_o.shape[0]
    tp = tri_planes.shape[2]
    num_chunks = tp // CT
    rp = max(((r + BR - 1) // BR) * BR, BR)

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    if active is not None:
        t_max = jnp.where(active, t_max, 0.0)

    rows = jnp.zeros((rp, 8), jnp.float32)
    rows = rows.at[:r, 0:3].set(ray_o)
    rows = rows.at[:r, 3:6].set(ray_d)
    rows = rows.at[:r, 6].set(t_min)
    rows = rows.at[:r, 7].set(t_max)

    dest = None
    if reorder != "none":
        from . import compaction

        live = rows[:, 7] > 0.0
        if reorder == "bins":
            key, nb_bins = compaction.direction_bins(rows[:, 3:6], live)
            src, dest = compaction.partition_bins(key, nb_bins)
        else:
            src, dest, _ = compaction.partition_live(live)
        rows = rows[src]
    rays = rows.T

    # --- block-level chunk culling (cheap XLA pre-pass) ---
    # per-ray slab tests against every chunk AABB, OR-reduced per block,
    # compacted to a per-block chunk worklist (hits sorted first)
    nb = rp // BR
    o_b = rays[0:3].T.reshape(nb, BR, 1, 3)
    d_pad = rays[3:6].T
    eps = 1e-12
    inv_d = 1.0 / jnp.where(jnp.abs(d_pad) < eps,
                            jnp.where(d_pad < 0, -eps, eps), d_pad)
    inv_b = inv_d.reshape(nb, BR, 1, 3)
    tmin_b = rays[6].reshape(nb, BR, 1)
    tmax_b = rays[7].reshape(nb, BR, 1)
    a = (chunk_aabb[None, None, :, 0:3] - o_b) * inv_b
    bb = (chunk_aabb[None, None, :, 3:6] - o_b) * inv_b
    t_entry = jnp.maximum(jnp.max(jnp.minimum(a, bb), axis=-1), tmin_b)
    t_exit = jnp.minimum(jnp.min(jnp.maximum(a, bb), axis=-1), tmax_b)
    ray_hit = (t_entry <= t_exit) & (tmax_b > 0.0)        # [nb, BR, NC]
    block_hit = ray_hit.any(axis=1)                        # [nb, NC]
    counts = block_hit.sum(axis=1).astype(jnp.int32)       # [nb]
    # stable argsort puts hit chunk ids (ascending) first; stored [NC, nb]
    chunk_list = jnp.argsort(~block_hit, axis=1, stable=True
                             ).astype(jnp.int32).T

    return _run_kernel(rays, tri_planes, counts, chunk_list, r, rp, nb,
                       num_chunks, tp, any_hit, dest=dest)


def _run_kernel(rays, tri_planes, counts, chunk_list, r, rp, nb, num_chunks,
                tp, any_hit, dest=None):
    # SMEM pads the minor dim to 128; when worklists would blow the ~1MB
    # SMEM budget (huge frame x huge scene) the kernel sweeps all chunks
    # and ignores the (dummy) list.
    nb_pad = ((nb + 127) // 128) * 128
    use_worklist = num_chunks * nb_pad * 4 <= 512 * 1024
    if not use_worklist:
        chunk_list = jnp.zeros((1, nb), jnp.int32)
    kernel = functools.partial(_mt_kernel, num_chunks=num_chunks,
                               any_hit=any_hit, use_worklist=use_worklist)
    # CPU backend (tests / multi-chip dry runs on virtual devices) runs the
    # kernel in the Pallas interpreter; TPU compiles via Mosaic.
    interpret = jax.default_backend() != "tpu"
    t, idx, uvf = pl.pallas_call(
        kernel,
        grid=(nb,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((nb,), lambda b: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((num_chunks if use_worklist else 1, nb),
                         lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, BR), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 3, tp), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BR), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BR), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BR), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, rp), jnp.float32),
            jax.ShapeDtypeStruct((1, rp), jnp.int32),
            jax.ShapeDtypeStruct((3, rp), jnp.float32),
        ],
    )(counts, chunk_list, rays, tri_planes)

    if dest is not None:
        # undo the ray permutation with ONE wide-row gather: pack the five
        # outputs as [rp, 5] rows (tri id rides bitcast through f32).
        out_rows = jnp.concatenate([
            t.T, jax.lax.bitcast_convert_type(idx, jnp.float32).T, uvf.T,
        ], axis=-1)[dest]
        t = out_rows[:, 0:1].T
        idx = jax.lax.bitcast_convert_type(out_rows[:, 1:2], jnp.int32)[:, 0][None]
        uvf = out_rows[:, 2:5].T

    missed = idx[0, :r] < 0
    return {
        "t": jnp.where(missed, jnp.float32(INF), t[0, :r]),
        "tri": idx[0, :r],
        "u": uvf[0, :r],
        "v": uvf[1, :r],
        "front": uvf[2, :r] > 0.5,
    }
