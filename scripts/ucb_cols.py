"""Microbench: de-interleaving a gathered [R, 35] row table into dense
[R] component arrays (the hit.py pattern).

Variants:
  slice   rows[:, k] per column (current _cols_of; XLA slice_reduce
          fusions measured ~2 ms/iter in the frame profile)
  transp  rows.T once, then major-dim slices rt[k] (XLA tiled transpose)
  rowmaj  keep [R, 3] row-major math (pre-V3 style) for the same
          downstream MT recompute, as a reference point

Each variant runs the SAME downstream work (the Moller-Trumbore
recompute off v0/e1/e2 + a normal interpolation), reduced to one scalar
so XLA cannot elide anything. Chained varied inputs (the axon tunnel
dedupes identical dispatches).
"""

import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_raytracer.utils import vec3
from tpu_raytracer.utils.vec3 import V3


def _mt_v3(c, ro, rd):
    v0 = V3(c[26], c[27], c[28])
    e1 = V3(c[29], c[30], c[31])
    e2 = V3(c[32], c[33], c[34])
    pvec = vec3.cross(rd, e2)
    det = vec3.dot(e1, pvec)
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-9, det, 1.0)
    tvec = ro - v0
    u = vec3.dot(tvec, pvec) * inv_det
    qvec = vec3.cross(tvec, e1)
    v = vec3.dot(rd, qvec) * inv_det
    t = vec3.dot(e2, qvec) * inv_det
    w = 1.0 - u - v
    n = V3(c[0], c[1], c[2]) * w + V3(c[3], c[4], c[5]) * u \
        + V3(c[6], c[7], c[8]) * v
    n = vec3.normalize(n)
    return t + u + v + n.x + n.y + n.z


def main():
    r = 262144
    tcount = 1320
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((tcount, 35)).astype(np.float32))
    nvar = 4
    tris = [jnp.asarray(rng.integers(0, tcount, r).astype(np.int32))
            for _ in range(nvar)]
    ros = [jnp.asarray(rng.uniform(-1, 1, (r, 3)).astype(np.float32))
           for _ in range(nvar)]
    rds = [jnp.asarray(rng.standard_normal((r, 3)).astype(np.float32))
           for _ in range(nvar)]

    def run(name, fn):
        jf = jax.jit(fn)
        out = jf(tris[0], ros[0], rds[0], jnp.float32(0))
        jax.block_until_ready(out)
        iters = 16
        t0 = time.time()
        carry = jnp.float32(0)
        for i in range(iters):
            carry = jf(tris[i % nvar], ros[i % nvar], rds[i % nvar], carry)
        jax.block_until_ready(carry)
        dt = (time.time() - t0) / iters * 1e3
        print(f"{name:8s} {dt:8.2f} ms/iter")

    def f_slice(tri, ro, rd, carry):
        rows = table[tri]
        c = [rows[:, k] for k in range(35)]
        s = _mt_v3(c, vec3.of(ro), vec3.of(rd))
        return carry + jnp.sum(s) * 1e-6

    def f_transp(tri, ro, rd, carry):
        rows = table[tri]
        rt = rows.T
        c = [rt[k] for k in range(35)]
        s = _mt_v3(c, vec3.of(ro), vec3.of(rd))
        return carry + jnp.sum(s) * 1e-6

    def f_rowmaj(tri, ro, rd, carry):
        rows = table[tri]
        v0 = rows[:, 26:29]
        e1 = rows[:, 29:32]
        e2 = rows[:, 32:35]
        pvec = jnp.cross(rd, e2)
        det = jnp.sum(e1 * pvec, -1)
        inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-9, det, 1.0)
        tvec = ro - v0
        u = jnp.sum(tvec * pvec, -1) * inv_det
        qvec = jnp.cross(tvec, e1)
        v = jnp.sum(rd * qvec, -1) * inv_det
        t = jnp.sum(e2 * qvec, -1) * inv_det
        w = 1.0 - u - v
        n = (rows[:, 0:3] * w[:, None] + rows[:, 3:6] * u[:, None]
             + rows[:, 6:9] * v[:, None])
        n = n / jnp.maximum(
            jnp.sqrt(jnp.maximum(jnp.sum(n * n, -1, keepdims=True), 0.0)),
            1e-6)
        s = t + u + v + n[:, 0] + n[:, 1] + n[:, 2]
        return carry + jnp.sum(s) * 1e-6

    for name, fn in (("slice", f_slice), ("transp", f_transp),
                     ("rowmaj", f_rowmaj)):
        run(name, fn)


if __name__ == "__main__":
    main()


def extra():
    r = 262144
    tcount = 1320
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((tcount, 35)).astype(np.float32))
    tableT = table.T  # [35, T]
    nvar = 4
    tris = [jnp.asarray(rng.integers(0, tcount, r).astype(np.int32))
            for _ in range(nvar)]
    ros = [jnp.asarray(rng.uniform(-1, 1, (r, 3)).astype(np.float32))
           for _ in range(nvar)]
    rds = [jnp.asarray(rng.standard_normal((r, 3)).astype(np.float32))
           for _ in range(nvar)]

    def run(name, fn):
        jf = jax.jit(fn)
        out = jf(tris[0], ros[0], rds[0], jnp.float32(0))
        jax.block_until_ready(out)
        iters = 16
        t0 = time.time()
        carry = jnp.float32(0)
        for i in range(iters):
            carry = jf(tris[i % nvar], ros[i % nvar], rds[i % nvar], carry)
        jax.block_until_ready(carry)
        dt = (time.time() - t0) / iters * 1e3
        print(f"{name:8s} {dt:8.2f} ms/iter")

    def f_colgather(tri, ro, rd, carry):
        rt = jnp.take(tableT, tri, axis=1)   # [35, R]
        c = [rt[k] for k in range(35)]
        s = _mt_v3(c, vec3.of(ro), vec3.of(rd))
        return carry + jnp.sum(s) * 1e-6

    def f_onehot(tri, ro, rd, carry):
        # exact f32 one-hot matmul: [35, T] @ [T, R] -> [35, R], R minor
        oh = (tri[None, :] == jnp.arange(tcount, dtype=jnp.int32)[:, None]
              ).astype(jnp.float32)
        rt = jax.lax.dot_general(
            tableT, oh, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        c = [rt[k] for k in range(35)]
        s = _mt_v3(c, vec3.of(ro), vec3.of(rd))
        return carry + jnp.sum(s) * 1e-6

    for name, fn in (("colgath", f_colgather), ("onehot", f_onehot)):
        run(name, fn)


if __name__ == "__main__" and "--extra" in sys.argv:
    extra()
