"""Probe: Moller-Trumbore as an in-kernel MXU feature matmul.

det/u_num/v_num/t_num are each linear in the 16-dim ray feature vector
phi = [o_i*d_j (9), d (3), o (3), 1], with per-triangle coefficients:
    det:   d . (e2 x e1)
    u_num: det3(o,d,e2) + d . (v0 x e2)        (= u * det)
    v_num: -det3(o,d,e1)... see derivation     (= v * det)
    t_num: o . n - v0 . n,  n = e1 x e2        (= t * det)
so a [BR,16] @ [16, 4*CT] dot computes all four for a whole chunk on the
MXU, leaving only sign-aware window tests + argmin on the VPU.

This script (1) numerically validates the coefficients vs direct MT,
(2) checks Mosaic accepts the kernel, (3) times it vs the VPU kernel.
"""

import sys
import time

sys.path.insert(0, ".")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BR = 256
CT = 128
INF = 3.0e38


def mt_coef(v0, e1, e2):
    """[T,3]x3 -> [T, 16, 4] coefficient blocks (det, u, v, t)."""
    t = v0.shape[0]
    n = np.cross(e1, e2)
    coef = np.zeros((t, 16, 4), np.float32)

    def skew(e):
        # S[i,j] = sum_k eps_ijk e_k ; o_i d_j S_ij = det3(o, d, e)
        z = np.zeros(t, e.dtype)
        return np.stack([
            z, e[:, 2], -e[:, 1],
            -e[:, 2], z, e[:, 0],
            e[:, 1], -e[:, 0], z,
        ], axis=1)  # [T, 9] row-major (i,j)

    # det = d . (e2 x e1)
    coef[:, 9:12, 0] = np.cross(e2, e1)
    # u_num = det3(o,d,e2) + d . (v0 x e2)
    coef[:, 0:9, 1] = skew(e2)
    coef[:, 9:12, 1] = np.cross(v0, e2)
    # v_num = det3(d,o,e1) - d . (v0 x e1) = -det3(o,d,e1) - d . (v0 x e1)
    coef[:, 0:9, 2] = -skew(e1)
    coef[:, 9:12, 2] = -np.cross(v0, e1)
    # t_num = o . n - v0 . n
    coef[:, 12:15, 3] = n
    coef[:, 15, 3] = -(v0 * n).sum(axis=1)
    return coef


def validate():
    rng = np.random.default_rng(0)
    t = 64
    v0 = rng.standard_normal((t, 3)).astype(np.float32)
    e1 = rng.standard_normal((t, 3)).astype(np.float32)
    e2 = rng.standard_normal((t, 3)).astype(np.float32)
    coef = mt_coef(v0, e1, e2).astype(np.float64)
    o = rng.standard_normal(3)
    d = rng.standard_normal(3)
    phi = np.concatenate([np.outer(o, d).reshape(-1), d, o, [1.0]])
    out = phi @ coef.reshape(t * 16, 4).reshape(-1)[:0] if False else \
        np.einsum("f,tfq->tq", phi, coef)
    # direct MT
    pvec = np.cross(d, e2)
    det = (e1 * pvec).sum(1)
    tvec = o - v0
    u_n = (tvec * pvec).sum(1)
    qvec = np.cross(tvec, e1)
    v_n = (d[None] * qvec).sum(1)
    t_n = (e2 * qvec).sum(1)
    for k, ref in ((0, det), (1, u_n), (2, v_n), (3, t_n)):
        err = np.abs(out[:, k] - ref).max() / max(np.abs(ref).max(), 1e-9)
        assert err < 1e-5, (k, err)
    print("coefficient check OK")


def feat_of(ox, oy, oz, dx, dy, dz):
    one = jnp.ones_like(ox)
    return jnp.stack([
        ox * dx, ox * dy, ox * dz,
        oy * dx, oy * dy, oy * dz,
        oz * dx, oz * dy, oz * dz,
        dx, dy, dz, ox, oy, oz, one,
    ], axis=1)  # [BR, 16]


def _mxu_kernel(rays_ref, coef_ref, t_ref, idx_ref, *, num_chunks, precision):
    rays = rays_ref[:]
    ox, oy, oz = rays[0], rays[1], rays[2]
    dx, dy, dz = rays[3], rays[4], rays[5]
    t_min = rays[6][:, None]
    t_max = rays[7][:, None]
    feat = feat_of(ox, oy, oz, dx, dy, dz)

    def chunk(c, carry):
        t_best, idx_best = carry
        coef = coef_ref[:, pl.ds(c * 4 * CT, 4 * CT)]     # [16, 4CT]
        prod = jax.lax.dot_general(
            feat, coef, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        det = prod[:, 0:CT]
        u_n = prod[:, CT:2 * CT]
        v_n = prod[:, 2 * CT:3 * CT]
        t_n = prod[:, 3 * CT:4 * CT]
        sgn = jnp.where(det >= 0.0, 1.0, -1.0)
        d_abs = det * sgn
        ok = d_abs > 1e-9
        u2 = u_n * sgn
        v2 = v_n * sgn
        t_val = (t_n * sgn) / jnp.where(ok, d_abs, 1.0)
        hit = (ok & (u2 >= 0.0) & (v2 >= 0.0) & (u2 + v2 <= d_abs)
               & (t_val > t_min) & (t_val < t_max) & (t_val < t_best[:, None]))
        t_cand = jnp.where(hit, t_val, INF)
        best = jnp.argmin(t_cand, axis=1)
        t_new = jnp.min(t_cand, axis=1)
        imp = t_new < t_best
        return (jnp.where(imp, t_new, t_best),
                jnp.where(imp, c * CT + best, idx_best))

    init = (jnp.full((BR,), INF, jnp.float32), jnp.full((BR,), -1, jnp.int32))
    t_best, idx_best = jax.lax.fori_loop(0, num_chunks, chunk, init)
    t_ref[0, :] = t_best
    idx_ref[0, :] = idx_best


@functools.partial(jax.jit, static_argnames=("num_chunks", "precision"))
def run_mxu(rays, coef_flat, num_chunks, precision):
    rp = rays.shape[1]
    nb = rp // BR
    kern = functools.partial(_mxu_kernel, num_chunks=num_chunks,
                             precision=precision)
    return pl.pallas_call(
        kern,
        grid=(nb,),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((8, BR), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec(coef_flat.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BR), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BR), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, rp), jnp.float32),
            jax.ShapeDtypeStruct((1, rp), jnp.int32),
        ],
    )(rays, coef_flat)


def main():
    validate()
    from tpu_raytracer.models import scenes
    from tpu_raytracer.ops import pallas_trace

    scene = scenes.create_cornell_box()
    tp = scene.tri_planes.shape[2]
    nc = tp // CT
    planes = np.asarray(scene.tri_planes)
    v0 = planes[0].T
    e1 = planes[1].T
    e2 = planes[2].T
    valid = planes[3, 0] > 0.5
    coef = mt_coef(v0, e1, e2)
    coef[~valid] = 0.0
    # [T,16,4] -> [16, NC, 4, CT] -> [16, NC*4*CT]
    cf = coef.reshape(nc, CT, 16, 4).transpose(2, 0, 3, 1).reshape(16, -1)
    cf = jnp.asarray(cf)

    r = 262144
    rng = np.random.default_rng(0)
    ro = rng.uniform(-0.9, 0.9, (r, 3)).astype(np.float32)
    rd = rng.standard_normal((r, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rays = np.zeros((8, r), np.float32)
    rays[0:3] = ro.T
    rays[3:6] = rd.T
    rays[6] = 1e-3
    rays[7] = 100.0
    rays = jnp.asarray(rays)

    # reference result from the production kernel
    ref = pallas_trace.trace_brute_pallas(
        scene.tri_planes, scene.chunk_aabb, jnp.asarray(ro), jnp.asarray(rd),
        1e-3, 100.0)
    ref_t = np.asarray(ref["t"])
    ref_tri = np.asarray(ref["tri"])

    for prec in ("highest", "float32", "default"):
        pmap = {"highest": jax.lax.Precision.HIGHEST,
                "float32": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT}[prec]
        try:
            t, idx = run_mxu(rays, cf, nc, pmap)
            jax.block_until_ready(t)
        except Exception as e:
            print(f"prec={prec}: FAILED {type(e).__name__}: {e}")
            continue
        tt = np.asarray(t[0])
        ii = np.asarray(idx[0])
        hit_match = ((ii >= 0) == (ref_tri >= 0)).mean()
        both = (ii >= 0) & (ref_tri >= 0)
        tri_match = (ii[both] == ref_tri[both]).mean()
        t_err = np.abs(np.where(both, tt - ref_t, 0)).max()
        # timing (chained)
        iters = 12
        t0 = time.time()
        carry = rays
        for _ in range(iters):
            t, idx = run_mxu(carry, cf, nc, pmap)
            carry = carry.at[6].add(t[0] * 1e-9)
        jax.block_until_ready(carry)
        dt = (time.time() - t0) / iters * 1e3
        print(f"prec={prec:8s} {dt:7.2f} ms  hit_match={hit_match:.5f} "
              f"tri_match={tri_match:.5f} t_err={t_err:.2e}")

    # VPU production kernel timing for comparison
    fn = jax.jit(lambda o, d: pallas_trace.trace_brute_pallas(
        scene.tri_planes, scene.chunk_aabb, o, d, 1e-3, 100.0)["t"])
    out = fn(jnp.asarray(ro), jnp.asarray(rd))
    jax.block_until_ready(out)
    iters = 12
    o = jnp.asarray(ro)
    t0 = time.time()
    for _ in range(iters):
        out = fn(o, jnp.asarray(rd))
        o = o + out[:1] * 1e-9
    jax.block_until_ready(out)
    print(f"vpu kernel        {(time.time()-t0)/iters*1e3:7.2f} ms "
          f"(with chunk-cull pre-pass)")


if __name__ == "__main__":
    main()
