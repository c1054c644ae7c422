"""Pinpoint the mxuf false-occlusion phantom: which triangle, which t,
and does it depend on batch size / t_max window / kernel."""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tpu_raytracer.models import scenes
    from tpu_raytracer.ops import pallas_trace

    scene = scenes.create_cornell_box()
    # failing lane 64 of ucb_anyhit_shadow
    o = np.array([-0.999, 0.96825397, 0.5474653], np.float32)
    d = np.array([0.85109353, 0.02118361, -0.5245866], np.float32)
    tmax = np.float32(1.0255239)

    planes = np.asarray(scene.tri_planes)
    v0, e1, e2 = planes[0].T, planes[1].T, planes[2].T
    pvec = np.cross(d[None], e2)
    det = (e1 * pvec).sum(1)
    tvec = o[None] - v0
    u = (tvec * pvec).sum(1) / np.where(np.abs(det) > 1e-12, det, 1.0)
    qvec = np.cross(tvec, e1)
    v = (d[None] * qvec).sum(1) / np.where(np.abs(det) > 1e-12, det, 1.0)
    t = (e2 * qvec).sum(1) / np.where(np.abs(det) > 1e-12, det, 1.0)
    near = np.abs(t) < 0.1
    print("host exact: tris with |t|<0.1:", np.where(near)[0][:10])
    for i in np.where(near)[0][:10]:
        print(f"  tri {i}: t={t[i]:.6f} u={u[i]:.6f} v={v[i]:.6f} "
              f"det={det[i]:.6f}")

    for r in (256, 4096, 262144):
        ro = np.tile(o, (r, 1)).astype(np.float32)
        rd = np.tile(d, (r, 1)).astype(np.float32)
        tm = np.full((r,), tmax, np.float32)
        for mode in ("mxuf2", "mxu3"):
            for window in (True, False):
                out = pallas_trace.trace_brute_pallas(
                    scene.tri_planes, scene.chunk_aabb,
                    jnp.asarray(ro), jnp.asarray(rd), 1e-3,
                    jnp.asarray(tm) if window else 100.0,
                    kernel=mode)
                tri = np.asarray(out["tri"])
                tt = np.asarray(out["t"])
                n_hit = (tri >= 0).sum()
                ex = tri[0], tt[0]
                print(f"r={r:6d} {mode} window={window}: "
                      f"hits={n_hit}/{r} lane0 tri={ex[0]} t={ex[1]:.6f}")


if __name__ == "__main__":
    main()
