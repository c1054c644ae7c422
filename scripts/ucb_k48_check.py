"""Isolate the mxuf t error: compare K=48 fused dot vs 3 K=16 dots
(a) in pure XLA on TPU, (b) in a minimal Pallas kernel with in-kernel
concat (current mxuf), (c) in a minimal Pallas kernel with feat48 built
OUTSIDE and passed in. Uses the failing ray + the Cornell coef matrix."""

import sys

sys.path.insert(0, ".")

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    from tpu_raytracer.models import scenes
    from tpu_raytracer.ops import pallas_trace as pt

    scene = scenes.create_cornell_box()
    o = np.array([-0.999, 0.96825397, 0.5474653], np.float32)
    d = np.array([0.85109353, 0.02118361, -0.5245866], np.float32)

    BR = pt.BR
    rays = np.zeros((8, BR), np.float32)
    rays[0:3] = o[:, None]
    rays[3:6] = d[:, None]
    rays[6] = 1e-3
    rays[7] = 100.0
    rays_j = jnp.asarray(rays)

    coef = pt.mt_coef_device(scene.tri_planes)        # [16, NC*4CT] f32
    # tri 19 lives in chunk 0, lane 19
    tri = 19
    CT = pt.CT

    # ---- host exact t for reference
    def feat16(rs):
        ox, oy, oz = rs[0], rs[1], rs[2]
        dx, dy, dz = rs[3], rs[4], rs[5]
        one = jnp.ones_like(ox)
        return jnp.stack([ox*dx, ox*dy, ox*dz, oy*dx, oy*dy, oy*dz,
                          oz*dx, oz*dy, oz*dz, dx, dy, dz, ox, oy, oz,
                          one], axis=1)

    f32feat = feat16(rays_j)                          # [BR, 16]

    @jax.jit
    def xla_paths(f, c):
        fh, fl = pt._split_bf16(f)
        ch, cl = pt._split_bf16(c)
        def dot(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        three = dot(fh, ch) + dot(fh, cl) + dot(fl, ch)
        f48 = jnp.concatenate([fh, fh, fl], axis=1)
        c48 = jnp.concatenate([ch, cl, ch], axis=0)
        one48 = dot(f48.astype(jnp.bfloat16), c48.astype(jnp.bfloat16))
        exact = jax.lax.dot_general(
            f, c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        return three, one48, exact

    cslice = coef[:, 0:4*CT]
    three, one48, exact = xla_paths(f32feat, cslice)
    for name, p in (("three", three), ("one48", one48), ("exact", exact)):
        det = float(p[0, tri]); tn = float(p[0, 3*CT+tri])
        print(f"XLA {name:6s}: det={det:.6f} t_num={tn:.6f} "
              f"t={tn/det:.6f}")

    # ---- minimal pallas kernels
    c48 = pt.mt_coef48(scene.tri_planes)              # [48, ...]
    c48s = c48[:, 0:4*CT]

    def kern_inconcat(rays_ref, coef_ref, out_ref):
        f = pt._feat48(rays_ref[:])
        out_ref[:, :] = pt._dot48(f, coef_ref[:, :])

    def kern_prefeat(feat_ref, coef_ref, out_ref):
        out_ref[:, :] = pt._dot48(feat_ref[:], coef_ref[:, :])

    pc1 = pl.pallas_call(
        kern_inconcat,
        in_specs=[pl.BlockSpec(rays.shape, lambda: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((48, 4*CT), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BR, 4*CT), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BR, 4*CT), jnp.float32),
    )
    p1 = pc1(rays_j, c48s)
    det = float(p1[0, tri]); tn = float(p1[0, 3*CT+tri])
    print(f"PL inconcat : det={det:.6f} t_num={tn:.6f} t={tn/det:.6f}")

    fh, fl = pt._split_bf16(f32feat)
    f48 = jnp.concatenate([fh, fh, fl], axis=1)       # [BR, 48] bf16
    pc2 = pl.pallas_call(
        kern_prefeat,
        in_specs=[pl.BlockSpec((BR, 48), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((48, 4*CT), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BR, 4*CT), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BR, 4*CT), jnp.float32),
    )
    p2 = pc2(f48, c48s)
    det = float(p2[0, tri]); tn = float(p2[0, 3*CT+tri])
    print(f"PL prefeat  : det={det:.6f} t_num={tn:.6f} t={tn/det:.6f}")


if __name__ == "__main__":
    main()
