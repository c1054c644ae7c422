"""K=48 Mosaic bisect: which ingredient corrupts the dot in the real
kernel? Variants over (big array vs small, static vs dynamic slice,
bf16 vs f32 storage)."""

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
    tri = 19

    rays = np.zeros((8, BR), np.float32)
    rays[0:3] = o[:, None]
    rays[3:6] = d[:, None]
    rays[6] = 1e-3
    rays[7] = 100.0
    rays_j = jnp.asarray(rays)

    c48 = pt.mt_coef48(scene.tri_planes)              # [48, NC*512] bf16
    coef_f32 = pt.mt_coef_device(scene.tri_planes)    # [16, NC*512] f32
    ch, cl = pt._split_bf16(coef_f32)
    c48_f32 = jnp.concatenate([ch, cl, ch], axis=0).astype(jnp.float32)
    n = c48.shape[1]
    g0 = jnp.zeros((8,), jnp.int32)

    def report(name, prod):
        det = float(prod[0, tri])
        tn = float(prod[0, 3 * CT + tri])
        print(f"{name:28s}: det={det:.6f} t_num={tn:.6f} t={tn/det:.6f}")

    def run(kern, coef, extra_smem=True):
        in_specs = []
        args = []
        if extra_smem:
            in_specs.append(pl.BlockSpec((8,), lambda: (0,),
                                         memory_space=pltpu.SMEM))
            args.append(g0)
        in_specs.append(pl.BlockSpec(rays.shape, lambda: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(rays_j)
        in_specs.append(pl.BlockSpec(coef.shape, lambda: (0,) * coef.ndim,
                                     memory_space=pltpu.VMEM))
        args.append(coef)
        pc = pl.pallas_call(
            kern,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((BR, 4 * CT), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BR, 4 * CT), jnp.float32),
        )
        return pc(*args)

    # 1. big array, STATIC slice
    def k_static(rays_ref, coef_ref, out_ref):
        f = pt._feat48(rays_ref[:])
        out_ref[:, :] = pt._dot48(f, coef_ref[:, 0:4 * CT])
    report("big/static/bf16", run(k_static, c48, extra_smem=False))

    # 2. big array, DYNAMIC slice (g from SMEM)
    def k_dyn(g_ref, rays_ref, coef_ref, out_ref):
        f = pt._feat48(rays_ref[:])
        g = g_ref[0]
        out_ref[:, :] = pt._dot48(f, coef_ref[:, pl.ds(g * 4 * CT, 4 * CT)])
    report("big/dynamic/bf16", run(k_dyn, c48))

    # 3. big array, dynamic slice, f32 storage, cast in kernel
    def k_dyn_f32(g_ref, rays_ref, coef_ref, out_ref):
        f = pt._feat48(rays_ref[:])
        g = g_ref[0]
        cs = coef_ref[:, pl.ds(g * 4 * CT, 4 * CT)].astype(jnp.bfloat16)
        out_ref[:, :] = pt._dot48(f, cs)
    report("big/dynamic/f32->bf16", run(k_dyn_f32, c48_f32))

    # 4. big array, dynamic slice inside fori_loop (1 iteration)
    def k_dyn_loop(g_ref, rays_ref, coef_ref, out_ref):
        f = pt._feat48(rays_ref[:])

        def body(i, acc):
            g = g_ref[i]
            return acc + pt._dot48(f, coef_ref[:, pl.ds(g * 4 * CT, 4 * CT)])

        out_ref[:, :] = jax.lax.fori_loop(
            0, 1, body, jnp.zeros((BR, 4 * CT), jnp.float32))
    report("big/dynamic/loop/bf16", run(k_dyn_loop, c48))


if __name__ == "__main__":
    main()
