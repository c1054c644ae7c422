"""K=48 bisect round 2: the REAL _mt_kernel_mxuf via a hand-rolled
pallas_call, worklist on/off, plus a stripped variant (no argmin)."""

import functools
import sys

sys.path.insert(0, ".")

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
    BR, CT = pt.BR, pt.CT

    rays = np.zeros((8, BR), np.float32)
    rays[0:3] = o[:, None]
    rays[3:6] = d[:, None]
    rays[6] = 1e-3
    rays[7] = 100.0
    rays_j = jnp.asarray(rays)

    c48 = pt.mt_coef48(scene.tri_planes)
    nc = c48.shape[1] // (4 * CT)
    counts = jnp.full((1,), nc, jnp.int32)
    # identity worklist [NC, 1]
    wl = jnp.arange(nc, dtype=jnp.int32)[:, None]

    def call(kern, n_out=2):
        outs = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((1,), lambda b: (0,), memory_space=pltpu.SMEM),
                pl.BlockSpec((nc, 1), lambda b: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((8, BR), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(c48.shape, lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((1, BR), lambda b: (0, b))] * n_out,
            out_shape=[jax.ShapeDtypeStruct((1, BR), jnp.float32),
                       jax.ShapeDtypeStruct((1, BR), jnp.int32)][:n_out],
        )(counts, wl, rays_j, c48)
        return outs

    real = functools.partial(pt._mt_kernel_mxuf, num_groups=nc,
                             any_hit=False, use_worklist=True, grp=1)
    t, idx = call(real)
    print(f"real+worklist : tri={int(idx[0,0])} t={float(t[0,0]):.6f}")

    real_nw = functools.partial(pt._mt_kernel_mxuf, num_groups=nc,
                                any_hit=False, use_worklist=False, grp=1)
    t, idx = call(real_nw)
    print(f"real-noworklist: tri={int(idx[0,0])} t={float(t[0,0]):.6f}")

    def stripped(count_ref, list_ref, rays_ref, coef_ref, t_ref, idx_ref,
                 *, tri=19):
        rays_k = rays_ref[:]
        t_min = rays_k[6][:, None]
        t_max = rays_k[7][:, None]
        feat = pt._feat48(rays_k)
        prod = pt._dot48(feat, coef_ref[:, 0:4 * CT])
        det = prod[:, 0:CT]
        t_n = prod[:, 3 * CT:4 * CT]
        sgn = jnp.where(det >= 0.0, 1.0, -1.0)
        d_abs = det * sgn
        ok = d_abs > 1e-9
        t_val = (t_n * sgn) / jnp.where(ok, d_abs, 1.0)
        t_ref[0, :] = t_val[:, tri]
        idx_ref[0, :] = jnp.full((BR,), tri, jnp.int32)

    t, idx = call(stripped)
    print(f"stripped tri19: t={float(t[0,0]):.6f}")


if __name__ == "__main__":
    main()
