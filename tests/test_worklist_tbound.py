"""t-bounded front-to-back worklists (PERF.md roadmap 1, VERDICT r3 item 4).

The XLA worklist prepass (`pallas_trace._block_entry`) slab-tests every
chunk AABB against each ray's LIVE (t_min, t_max) window, so rays that
enter with a finite bound - NEE shadow rays carry t_max = light distance
(ops/path_trace.py), segmented sweeps chain each lane's running best t -
cull beyond-the-bound chunks out of the worklist before the kernel ever
sees them. This is the TPU analogue of the reference's per-ray t-bounded
HW traversal (src/shaders/restir.wgsl:601-607): the bound shortens work
in the batched prepass instead of in a per-ray walk.

Pins (a) bounded rays produce strictly shorter worklists than unbounded
ones on a depth-layered scene, keeping every unit the bound can reach,
and (b) the swept winner is unaffected for every ray whose unbounded
winner lies inside the bound (and the bound only ever removes hits
BEYOND it, never changes one).
"""

import jax.numpy as jnp
import numpy as np

from tpu_raytracer.ops import pallas_trace


def _layered_scene(rng, z_layers=(1.0, 3.0, 5.0, 7.0), t_per=160):
    """Several z-slabs of triangles so a t bound actually separates units."""
    slabs = []
    for z in z_layers:
        v0 = rng.standard_normal((t_per, 3)).astype(np.float32)
        v0[:, 2] = z + 0.1 * v0[:, 2]
        e1 = rng.standard_normal((t_per, 3)).astype(np.float32) * 0.7
        e2 = rng.standard_normal((t_per, 3)).astype(np.float32) * 0.7
        slabs.append((v0, e1, e2))
    v0 = np.concatenate([s[0] for s in slabs])
    e1 = np.concatenate([s[1] for s in slabs])
    e2 = np.concatenate([s[2] for s in slabs])
    planes, aabb, _ = pallas_trace.pack_triangles(v0, e1, e2)
    return jnp.asarray(planes), jnp.asarray(aabb)


def _forward_rays(rng, r):
    """Coherent +z rays from z=-1 (primary/shadow-style packets)."""
    ro = np.zeros((r, 3), np.float32)
    ro[:, 0:2] = rng.uniform(-1.0, 1.0, (r, 2))
    ro[:, 2] = -1.0
    rd = np.zeros((r, 3), np.float32)
    rd[:, 2] = 1.0
    rd[:, 0:2] = rng.uniform(-0.15, 0.15, (r, 2))
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, rd


def _entry_units(planes, aabb, ro, rd, t_max, grp=2):
    """Run the prepass exactly as trace_brute_pallas does and return the
    per-block live-unit mask (entry < INF)."""
    r = ro.shape[0]
    BR = pallas_trace.BR
    rp = max(((r + BR - 1) // BR) * BR, BR)
    tmin = np.full(r, 1e-3, np.float32)
    tmax = np.broadcast_to(np.asarray(t_max, np.float32), (r,))
    rays = np.zeros((8, rp), np.float32)
    rays[0:3, :r] = ro.T
    rays[3:6, :r] = rd.T
    rays[6, :r] = tmin
    rays[7, :r] = tmax
    num_chunks = planes.shape[2] // pallas_trace.CT
    e_blk = pallas_trace._block_entry(
        jnp.asarray(rays), aabb, num_chunks, rp // BR, grp)
    return np.asarray(e_blk) < pallas_trace.INF


def test_bounded_rays_shorten_worklists():
    rng = np.random.default_rng(53)
    planes, aabb = _layered_scene(rng)
    ro, rd = _forward_rays(rng, 1024)

    live_far = _entry_units(planes, aabb, ro, rd, 50.0)
    live_near = _entry_units(planes, aabb, ro, rd, 3.0)  # layers 1,3 only

    n_far = live_far.sum()
    n_near = live_near.sum()
    # the bound must CULL units (the far layers sit beyond t=3)...
    assert n_near < n_far, (n_near, n_far)
    assert n_near <= 0.7 * n_far, (n_near, n_far)
    # ...and only cull: a unit live under the bound is live without it
    assert not (live_near & ~live_far).any()

    # dead lanes (t_max=0, the active-mask encoding) cull EVERYTHING
    live_dead = _entry_units(planes, aabb, ro, rd, 0.0)
    assert live_dead.sum() == 0


def test_bounded_winner_equality():
    """NEE-shadow economics: bounding t_max at a 'light distance' must
    not change any winner the bound can reach, and must only ever REMOVE
    hits beyond the bound (kernel + worklist agree with the window)."""
    rng = np.random.default_rng(59)
    planes, aabb = _layered_scene(rng)
    ro, rd = _forward_rays(rng, 768)
    ro_j, rd_j = jnp.asarray(ro), jnp.asarray(rd)

    bound = 4.0                           # between layers 3 and 5
    free = pallas_trace.trace_brute_pallas(
        planes, aabb, ro_j, rd_j, 1e-3, 50.0, kernel="mxuf2")
    capped = pallas_trace.trace_brute_pallas(
        planes, aabb, ro_j, rd_j, 1e-3, bound, kernel="mxuf2")

    ft = np.asarray(free["tri"])
    ct = np.asarray(capped["tri"])
    f_t = np.asarray(free["t"])
    c_t = np.asarray(capped["t"])

    inside = (ft >= 0) & (f_t < bound * 0.999)
    assert inside.any()
    # every reachable winner is preserved bit-for-bit
    assert (ct[inside] == ft[inside]).all()
    np.testing.assert_array_equal(c_t[inside], f_t[inside])
    # beyond-the-bound winners are culled to misses, never replaced
    beyond = (ft >= 0) & (f_t > bound * 1.001)
    assert beyond.any()
    assert (ct[beyond] == -1).all()

    # same guarantee on the any-hit (occlusion) kernel: blocked iff the
    # closest hit lies inside the window
    occ = pallas_trace.trace_brute_pallas(
        planes, aabb, ro_j, rd_j, 1e-3, bound, any_hit=True,
        kernel="mxuf2")
    ot = np.asarray(occ["tri"])
    assert ((ot >= 0) == (ct >= 0)).mean() > 0.999
