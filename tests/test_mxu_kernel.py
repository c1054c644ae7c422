"""MXU feature-matmul intersector vs the exact-f32 VPU sweep.

The mxu3 kernel carries ~2^-16 relative error in its window tests (3-pass
bf16 split); winners may flip only for knife-edge rays. Downstream, the
winner's t/u/v/front are recomputed EXACTLY in ops/hit.py, so agreement
here only needs to be near-total, not bitwise. Runs in the Pallas
interpreter on CPU (same arithmetic graph as the TPU lowering).
"""

import jax.numpy as jnp
import numpy as np

from tpu_raytracer.ops import pallas_trace


def _scene(rng, t=300):
    v0 = rng.standard_normal((t, 3)).astype(np.float32) * 2
    e1 = rng.standard_normal((t, 3)).astype(np.float32)
    e2 = rng.standard_normal((t, 3)).astype(np.float32)
    planes, aabb, _ = pallas_trace.pack_triangles(v0, e1, e2)
    return jnp.asarray(planes), jnp.asarray(aabb)


def test_mxu_matches_vpu():
    rng = np.random.default_rng(3)
    planes, aabb = _scene(rng)
    r = 1500
    ro = jnp.asarray(rng.standard_normal((r, 3)).astype(np.float32) * 3)
    rd = rng.standard_normal((r, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))

    ref = pallas_trace.trace_brute_pallas(planes, aabb, ro, rd, 1e-3, 50.0,
                                          kernel="vpu")
    ref_tri = np.asarray(ref["tri"])
    for mode in ("mxu3", "mxuw", "mxuf1", "mxuf2", "mxuf4", "mxuv2",
                 "mxuv4"):
        out = pallas_trace.trace_brute_pallas(planes, aabb, ro, rd, 1e-3,
                                              50.0, kernel=mode)
        out_tri = np.asarray(out["tri"])
        hit_agree = ((ref_tri >= 0) == (out_tri >= 0)).mean()
        assert hit_agree > 0.999, (mode, hit_agree)
        both = (ref_tri >= 0) & (out_tri >= 0)
        tri_agree = (ref_tri[both] == out_tri[both]).mean()
        assert tri_agree > 0.999, (mode, tri_agree)
        # kernel t is ORDERING-only (ops/hit.py recomputes the exact
        # value); glancing hits (tiny det) amplify its relative error, so
        # bound the distribution, not the worst glancing lane.
        same = both & (ref_tri == out_tri)
        t_err = np.abs(np.asarray(out["t"]) - np.asarray(ref["t"]))[same]
        rel = t_err / np.maximum(np.asarray(ref["t"])[same], 1e-6)
        assert np.median(rel) < 1e-4, (mode, np.median(rel))
        assert rel.max() < 3e-2, (mode, rel.max())


def test_anyhit_matches_closest_occlusion():
    """The early-out occlusion kernel must agree with closest-hit
    hit/miss on windowed rays (restir.wgsl:375-381 semantics), including
    inactive lanes and per-ray t_max bounds."""
    rng = np.random.default_rng(5)
    planes, aabb = _scene(rng)
    r = 1200
    ro = jnp.asarray(rng.standard_normal((r, 3)).astype(np.float32) * 3)
    rd = rng.standard_normal((r, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    t_max = jnp.asarray(
        rng.uniform(0.5, 8.0, (r,)).astype(np.float32))
    active = jnp.asarray(rng.uniform(size=r) > 0.3)

    ref = pallas_trace.trace_brute_pallas(planes, aabb, ro, rd, 1e-3,
                                          t_max, kernel="vpu",
                                          active=active)
    ref_hit = np.asarray(ref["tri"]) >= 0
    for mode in ("any2", "any4"):
        out = pallas_trace.trace_brute_pallas(planes, aabb, ro, rd, 1e-3,
                                              t_max, any_hit=True,
                                              kernel=mode, active=active)
        got_hit = np.asarray(out["tri"]) >= 0
        agree = (ref_hit == got_hit).mean()
        assert agree > 0.999, (mode, agree)
        assert not got_hit[~np.asarray(active)].any()


def test_early_out_coherent_rays(trace_env):
    """Front-to-back ordered worklists + early termination must be
    RESULT-INVARIANT: coherent primary-style rays (where whole blocks
    terminate after the nearest chunks) agree with the exact vpu sweep.
    Forces the early-out kernel path (normally dense-scene-only)."""
    trace_env.setenv("TPU_RT_EARLY_MIN", "1")
    rng = np.random.default_rng(11)
    # layered scene: several z-slabs of triangles so front-to-back order
    # actually skips the far layers
    t_per = 160
    slabs = []
    for z in (1.0, 3.0, 5.0, 7.0):
        v0 = rng.standard_normal((t_per, 3)).astype(np.float32)
        v0[:, 2] = z + 0.1 * v0[:, 2]
        e1 = rng.standard_normal((t_per, 3)).astype(np.float32) * 0.7
        e2 = rng.standard_normal((t_per, 3)).astype(np.float32) * 0.7
        slabs.append((v0, e1, e2))
    v0 = np.concatenate([s[0] for s in slabs])
    e1 = np.concatenate([s[1] for s in slabs])
    e2 = np.concatenate([s[2] for s in slabs])
    planes, aabb, _ = pallas_trace.pack_triangles(v0, e1, e2)
    planes, aabb = jnp.asarray(planes), jnp.asarray(aabb)

    r = 1024
    ro = np.zeros((r, 3), np.float32)
    ro[:, 0:2] = rng.uniform(-1.5, 1.5, (r, 2))
    ro[:, 2] = -1.0
    rd = np.zeros((r, 3), np.float32)
    rd[:, 2] = 1.0
    rd[:, 0:2] = rng.uniform(-0.2, 0.2, (r, 2))
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ro, rd = jnp.asarray(ro), jnp.asarray(rd)
    active = jnp.asarray(rng.uniform(size=r) > 0.2)

    ref = pallas_trace.trace_brute_pallas(planes, aabb, ro, rd, 1e-3, 50.0,
                                          kernel="vpu", active=active)
    for mode in ("mxuf2", "mxuv2"):
        out = pallas_trace.trace_brute_pallas(planes, aabb, ro, rd, 1e-3,
                                              50.0, kernel=mode,
                                              active=active)
        ref_tri = np.asarray(ref["tri"])
        out_tri = np.asarray(out["tri"])
        assert ((ref_tri >= 0) == (out_tri >= 0)).mean() > 0.999, mode
        both = (ref_tri >= 0) & (out_tri >= 0)
        assert (ref_tri[both] == out_tri[both]).mean() > 0.999, mode
        assert not (out_tri[~np.asarray(active)] >= 0).any()


def test_streamed_kernel_beyond_vmem():
    """Scenes past the VMEM-resident coef cap route to the HBM-streamed
    double-buffered kernel (mxus) and must agree with the exact sweep."""
    rng = np.random.default_rng(21)
    t = pallas_trace.MXUF_MAX_TP + pallas_trace.CT  # just past the cap
    v0 = rng.standard_normal((t, 3)).astype(np.float32) * 3
    e1 = rng.standard_normal((t, 3)).astype(np.float32) * 0.3
    e2 = rng.standard_normal((t, 3)).astype(np.float32) * 0.3
    planes, aabb, _ = pallas_trace.pack_triangles(v0, e1, e2)
    planes, aabb = jnp.asarray(planes), jnp.asarray(aabb)

    r = 768
    ro = jnp.asarray(rng.standard_normal((r, 3)).astype(np.float32) * 4)
    rd = rng.standard_normal((r, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))

    ref = pallas_trace.trace_brute_pallas(planes, aabb, ro, rd, 1e-3, 50.0,
                                          kernel="vpu")
    out = pallas_trace.trace_brute_pallas(planes, aabb, ro, rd, 1e-3, 50.0,
                                          kernel="mxuf2")   # -> mxus8
    rt = np.asarray(ref["tri"])
    ot = np.asarray(out["tri"])
    assert ((rt >= 0) == (ot >= 0)).mean() > 0.999
    both = (rt >= 0) & (ot >= 0)
    # a 32k-tri random soup has many near-coincident surfaces; allow a
    # few bf16 3-pass winner flips between equal-t triangles
    assert (rt[both] == ot[both]).mean() > 0.99

    # streamed ANY-HIT variant (occlusion beyond VMEM residency): the
    # hit/miss flag must match closest-hit occlusion exactly
    any_out = pallas_trace.trace_brute_pallas(
        planes, aabb, ro, rd, 1e-3, 50.0, any_hit=True, kernel="mxuf2")
    assert ((np.asarray(any_out["tri"]) >= 0) == (ot >= 0)).mean() > 0.999


def test_streamed_matrix_best(trace_env):
    """TPU_RT_MXUS_V=1 swaps the streamed closest-hit's argmin/division
    selection for the mxuv running [BR, CT] best; results must agree
    with the exact sweep in both loop variants."""
    trace_env.setenv("TPU_RT_MXUS_V", "1")
    rng = np.random.default_rng(21)
    t = pallas_trace.MXUF_MAX_TP + pallas_trace.CT
    v0 = rng.standard_normal((t, 3)).astype(np.float32) * 3
    e1 = rng.standard_normal((t, 3)).astype(np.float32) * 0.3
    e2 = rng.standard_normal((t, 3)).astype(np.float32) * 0.3
    planes, aabb, _ = pallas_trace.pack_triangles(v0, e1, e2)
    planes, aabb = jnp.asarray(planes), jnp.asarray(aabb)

    r = 640
    ro = jnp.asarray(rng.standard_normal((r, 3)).astype(np.float32) * 4)
    rd = rng.standard_normal((r, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))

    ref = pallas_trace.trace_brute_pallas(planes, aabb, ro, rd, 1e-3, 50.0,
                                          kernel="vpu")
    rt = np.asarray(ref["tri"])
    for early_min in ("1", "100000"):        # early path / carry path
        trace_env.setenv("TPU_RT_EARLY_MIN", early_min)
        out = pallas_trace.trace_brute_pallas(
            planes, aabb, ro, rd, 1e-3, 50.0, kernel="mxuf2")  # -> mxus
        ot = np.asarray(out["tri"])
        assert ((rt >= 0) == (ot >= 0)).mean() > 0.999, early_min
        both = (rt >= 0) & (ot >= 0)
        assert (rt[both] == ot[both]).mean() > 0.99, early_min


def test_streamed_early_out(trace_env):
    """mxus front-to-back termination (+ DMA drain) is result-invariant:
    coherent rays against a layered beyond-VMEM scene agree with the
    exact sweep, for closest-hit AND any-hit."""
    trace_env.setenv("TPU_RT_EARLY_MIN", "1")
    rng = np.random.default_rng(23)
    t_total = pallas_trace.MXUF_MAX_TP + pallas_trace.CT
    per = t_total // 4
    slabs = []
    for z in (1.0, 3.0, 5.0, 7.0):
        v0 = rng.standard_normal((per, 3)).astype(np.float32)
        v0[:, 2] = z + 0.1 * v0[:, 2]
        e1 = rng.standard_normal((per, 3)).astype(np.float32) * 0.7
        e2 = rng.standard_normal((per, 3)).astype(np.float32) * 0.7
        slabs.append((v0, e1, e2))
    v0 = np.concatenate([s[0] for s in slabs])
    e1 = np.concatenate([s[1] for s in slabs])
    e2 = np.concatenate([s[2] for s in slabs])
    planes, aabb, _ = pallas_trace.pack_triangles(v0, e1, e2)
    planes, aabb = jnp.asarray(planes), jnp.asarray(aabb)

    r = 512
    ro = np.zeros((r, 3), np.float32)
    ro[:, 0:2] = rng.uniform(-1.5, 1.5, (r, 2))
    ro[:, 2] = -1.0
    rd = np.zeros((r, 3), np.float32)
    rd[:, 2] = 1.0
    rd[:, 0:2] = rng.uniform(-0.2, 0.2, (r, 2))
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ro, rd = jnp.asarray(ro), jnp.asarray(rd)
    active = jnp.asarray(rng.uniform(size=r) > 0.2)

    ref = pallas_trace.trace_brute_pallas(planes, aabb, ro, rd, 1e-3, 50.0,
                                          kernel="vpu", active=active)
    out = pallas_trace.trace_brute_pallas(planes, aabb, ro, rd, 1e-3, 50.0,
                                          kernel="mxuf2", active=active)
    rt, ot = np.asarray(ref["tri"]), np.asarray(out["tri"])
    assert ((rt >= 0) == (ot >= 0)).mean() > 0.999
    both = (rt >= 0) & (ot >= 0)
    assert (rt[both] == ot[both]).mean() > 0.99
    assert not (ot[~np.asarray(active)] >= 0).any()

    any_out = pallas_trace.trace_brute_pallas(
        planes, aabb, ro, rd, 1e-3, 50.0, any_hit=True, kernel="mxuf2",
        active=active)
    at = np.asarray(any_out["tri"])
    assert ((at >= 0) == (rt >= 0)).mean() > 0.999
    assert not (at[~np.asarray(active)] >= 0).any()


def test_segmented_worklists(trace_env):
    """Past the SMEM worklist budget the sweep splits into t_max-chained
    unit-range segments (TPU_RT_SEG_CAP forces a tiny cap here); results
    must agree with the exact single sweep for closest-hit AND any-hit,
    including windowed/dead lanes."""
    trace_env.setenv("TPU_RT_SEG_CAP", "7")
    trace_env.setenv("TPU_RT_EARLY_MIN", "4")
    rng = np.random.default_rng(31)
    planes, aabb = _scene(rng, t=4000)      # 32 chunks -> 16 grp2 units
    r = 900
    ro = jnp.asarray(rng.standard_normal((r, 3)).astype(np.float32) * 3)
    rd = rng.standard_normal((r, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    t_max = jnp.asarray(rng.uniform(0.5, 20.0, (r,)).astype(np.float32))
    active = jnp.asarray(rng.uniform(size=r) > 0.25)

    ref = pallas_trace.trace_brute_pallas(planes, aabb, ro, rd, 1e-3, t_max,
                                          kernel="vpu", active=active)
    rt = np.asarray(ref["tri"])
    for mode in ("mxuf2", "mxuv2"):
        out = pallas_trace.trace_brute_pallas(planes, aabb, ro, rd, 1e-3,
                                              t_max, kernel=mode,
                                              active=active)
        ot = np.asarray(out["tri"])
        assert ((rt >= 0) == (ot >= 0)).mean() > 0.999, mode
        both = (rt >= 0) & (ot >= 0)
        assert (rt[both] == ot[both]).mean() > 0.999, mode
        assert not (ot[~np.asarray(active)] >= 0).any()

    any_out = pallas_trace.trace_brute_pallas(
        planes, aabb, ro, rd, 1e-3, t_max, any_hit=True, kernel="mxuf2",
        active=active)
    at = np.asarray(any_out["tri"])
    assert ((at >= 0) == (rt >= 0)).mean() > 0.999
    assert not (at[~np.asarray(active)] >= 0).any()


def test_mxuv_lowest_id_tie_break():
    """mxuv resolves EXACT-t ties between DIFFERENT columns of the
    running best to the lowest global triangle id (pinned with duplicate
    triangles in different chunks AND different slots-mod-CT). Same-column
    ties - ids congruent mod CT - keep the first-swept candidate, i.e.
    resolve by worklist order like mxuf (see the kernel docstring)."""
    rng = np.random.default_rng(41)
    t = 3 * pallas_trace.CT
    v0 = rng.standard_normal((t, 3)).astype(np.float32) * 4
    v0[:, 2] += 10.0                       # keep away from the dup quad
    e1 = rng.standard_normal((t, 3)).astype(np.float32)
    e2 = rng.standard_normal((t, 3)).astype(np.float32)
    # identical triangle at ids 7 and 2*CT+9 (different chunks), square
    # in the z=1 plane covering the origin rays
    for dup in (7, 2 * pallas_trace.CT + 9):
        v0[dup] = [-5.0, -5.0, 1.0]
        e1[dup] = [10.0, 0.0, 0.0]
        e2[dup] = [0.0, 10.0, 0.0]
    planes, aabb, _ = pallas_trace.pack_triangles(v0, e1, e2)
    planes, aabb = jnp.asarray(planes), jnp.asarray(aabb)

    r = 256
    ro = np.zeros((r, 3), np.float32)
    ro[:, 0:2] = rng.uniform(-2, 2, (r, 2))
    rd = np.zeros((r, 3), np.float32)
    rd[:, 2] = 1.0
    out = pallas_trace.trace_brute_pallas(
        jnp.asarray(planes), aabb, jnp.asarray(ro), jnp.asarray(rd),
        1e-3, 50.0, kernel="mxuv2")
    tri = np.asarray(out["tri"])
    hit_dup = np.isin(tri, [7, 2 * pallas_trace.CT + 9])
    assert hit_dup.any()
    assert (tri[hit_dup] == 7).all()       # lowest id wins the tie


def test_mxu_coef_identity():
    """phi(ray) @ coef == direct MT terms (f64 check of the derivation)."""
    rng = np.random.default_rng(4)
    t = pallas_trace.CT  # one chunk
    v0 = rng.standard_normal((t, 3)).astype(np.float32)
    e1 = rng.standard_normal((t, 3)).astype(np.float32)
    e2 = rng.standard_normal((t, 3)).astype(np.float32)
    planes, _, _ = pallas_trace.pack_triangles(v0, e1, e2)
    coef = np.asarray(pallas_trace.mt_coef_device(jnp.asarray(planes)))
    coef = coef.reshape(16, 1, 4, pallas_trace.CT)[:, 0]   # [16, 4, CT]

    o = rng.standard_normal(3).astype(np.float64)
    d = rng.standard_normal(3).astype(np.float64)
    phi = np.concatenate([np.outer(o, d).reshape(-1), d, o, [1.0]])
    got = np.einsum("f,fqt->qt", phi, coef.astype(np.float64))

    pvec = np.cross(d, e2.astype(np.float64))
    det = (e1 * pvec).sum(1)
    tvec = o - v0
    u_n = (tvec * pvec).sum(1)
    qvec = np.cross(tvec, e1.astype(np.float64))
    v_n = (d[None] * qvec).sum(1)
    t_n = (e2 * qvec).sum(1)
    for q, ref in ((0, det), (1, u_n), (2, v_n), (3, t_n)):
        np.testing.assert_allclose(got[q], ref, rtol=2e-4, atol=2e-4)


def test_no_worklist_matches_default(trace_env):
    """TPU_RT_NO_WORKLIST=1 skips the slab/sort prepass and sweeps every
    unit in layout order; results must agree with the culled default up
    to exact-t cross-chunk ties, for closest-hit AND any-hit, including
    masked lanes and per-lane t_max windows."""
    rng = np.random.default_rng(47)
    planes, aabb = _scene(rng, t=1200)
    r = 900
    ro = jnp.asarray(rng.standard_normal((r, 3)).astype(np.float32) * 3)
    rd = rng.standard_normal((r, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    t_max = jnp.asarray(rng.uniform(0.5, 20.0, (r,)).astype(np.float32))
    active = jnp.asarray(rng.uniform(size=r) > 0.25)

    ref = pallas_trace.trace_brute_pallas(
        planes, aabb, ro, rd, 1e-3, t_max, kernel="mxuf2", active=active)
    ref_any = pallas_trace.trace_brute_pallas(
        planes, aabb, ro, rd, 1e-3, t_max, kernel="mxuf2", active=active,
        any_hit=True)

    trace_env.setenv("TPU_RT_NO_WORKLIST", "1")
    out = pallas_trace.trace_brute_pallas(
        planes, aabb, ro, rd, 1e-3, t_max, kernel="mxuf2", active=active)
    out_any = pallas_trace.trace_brute_pallas(
        planes, aabb, ro, rd, 1e-3, t_max, kernel="mxuf2", active=active,
        any_hit=True)
    out_v = pallas_trace.trace_brute_pallas(
        planes, aabb, ro, rd, 1e-3, t_max, kernel="mxuv2", active=active)
    assert ((np.asarray(out_v["tri"]) >= 0)
            == (np.asarray(out["tri"]) >= 0)).all()

    rt, ot = np.asarray(ref["tri"]), np.asarray(out["tri"])
    assert ((rt >= 0) == (ot >= 0)).all()
    np.testing.assert_allclose(np.asarray(ref["t"]), np.asarray(out["t"]),
                               rtol=1e-6)
    both = (rt >= 0) & (ot >= 0)
    assert (rt[both] == ot[both]).mean() > 0.99        # exact-t ties only
    assert ((np.asarray(ref_any["tri"]) >= 0)
            == (np.asarray(out_any["tri"]) >= 0)).all()
    assert not (ot[~np.asarray(active)] >= 0).any()

    # the any-hit all-occluded early exit stays available WITHOUT a
    # worklist (the SMEM done flag needs no entry distances); force it
    # on at this tiny unit count and re-check agreement
    trace_env.setenv("TPU_RT_EARLY_MIN", "2")
    out_any_e = pallas_trace.trace_brute_pallas(
        planes, aabb, ro, rd, 1e-3, t_max, kernel="mxuf2", active=active,
        any_hit=True)
    assert ((np.asarray(ref_any["tri"]) >= 0)
            == (np.asarray(out_any_e["tri"]) >= 0)).all()


def test_grp_cull_matches_chunk_cull(trace_env):
    """TPU_RT_GRP_CULL=1 slab-tests group-union AABBs instead of per-chunk
    AABBs (pallas_trace.py:1445). A group's union contains every member
    chunk, so group culling is conservative: worklists may be looser,
    never tighter, and the swept winner must agree with the per-chunk
    default (up to exact-t ties, as elsewhere)."""
    rng = np.random.default_rng(31)
    t = pallas_trace.MXUF_MAX_TP + pallas_trace.CT   # beyond VMEM -> mxus
    v0 = rng.standard_normal((t, 3)).astype(np.float32) * 3
    e1 = rng.standard_normal((t, 3)).astype(np.float32) * 0.3
    e2 = rng.standard_normal((t, 3)).astype(np.float32) * 0.3
    planes, aabb, _ = pallas_trace.pack_triangles(v0, e1, e2)
    planes, aabb = jnp.asarray(planes), jnp.asarray(aabb)

    r = 640
    ro = jnp.asarray(rng.standard_normal((r, 3)).astype(np.float32) * 4)
    rd = rng.standard_normal((r, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))

    base = pallas_trace.trace_brute_pallas(planes, aabb, ro, rd, 1e-3,
                                           50.0, kernel="mxuf2")  # grp > 1
    trace_env.setenv("TPU_RT_GRP_CULL", "1")
    cull = pallas_trace.trace_brute_pallas(planes, aabb, ro, rd, 1e-3,
                                           50.0, kernel="mxuf2")
    bt, ct_ = np.asarray(base["tri"]), np.asarray(cull["tri"])
    assert ((bt >= 0) == (ct_ >= 0)).all()
    np.testing.assert_allclose(np.asarray(base["t"]), np.asarray(cull["t"]),
                               rtol=1e-6)
    both = (bt >= 0) & (ct_ >= 0)
    assert (bt[both] == ct_[both]).mean() > 0.99


def test_coarse_cull_matches_default(trace_env):
    """COARSE culling (TPU_RT_CULL_UNITS): past the unit target, the
    prepass slab-tests union AABBs of c kernel units and repeats the
    entry matrix back to kernel granularity (pallas_trace.py
    trace_brute_pallas). A union contains every member unit, so culling
    is conservative and the swept winner must agree with the exact
    per-unit default - closest-hit AND any-hit, windowed + dead lanes,
    single-sweep AND segmented."""
    rng = np.random.default_rng(53)
    planes, aabb = _scene(rng, t=4000)      # 32 chunks -> 16 grp2 units
    r = 900
    ro = jnp.asarray(rng.standard_normal((r, 3)).astype(np.float32) * 3)
    rd = rng.standard_normal((r, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    t_max = jnp.asarray(rng.uniform(0.5, 20.0, (r,)).astype(np.float32))
    active = jnp.asarray(rng.uniform(size=r) > 0.25)

    ref = pallas_trace.trace_brute_pallas(planes, aabb, ro, rd, 1e-3, t_max,
                                          kernel="mxuf2", active=active)
    ref_any = pallas_trace.trace_brute_pallas(
        planes, aabb, ro, rd, 1e-3, t_max, kernel="mxuf2", active=active,
        any_hit=True)
    rt = np.asarray(ref["tri"])

    trace_env.setenv("TPU_RT_CULL_UNITS", "2")      # force c = 8
    for seg_cap in (None, "5"):
        if seg_cap is not None:
            trace_env.setenv("TPU_RT_SEG_CAP", seg_cap)
            trace_env.setenv("TPU_RT_EARLY_MIN", "4")
        out = pallas_trace.trace_brute_pallas(
            planes, aabb, ro, rd, 1e-3, t_max, kernel="mxuf2",
            active=active)
        ot = np.asarray(out["tri"])
        assert ((rt >= 0) == (ot >= 0)).all(), seg_cap
        np.testing.assert_allclose(np.asarray(ref["t"]),
                                   np.asarray(out["t"]), rtol=1e-6)
        both = (rt >= 0) & (ot >= 0)
        assert (rt[both] == ot[both]).mean() > 0.99, seg_cap
        assert not (ot[~np.asarray(active)] >= 0).any()
        out_any = pallas_trace.trace_brute_pallas(
            planes, aabb, ro, rd, 1e-3, t_max, kernel="mxuf2",
            active=active, any_hit=True)
        assert ((np.asarray(ref_any["tri"]) >= 0)
                == (np.asarray(out_any["tri"]) >= 0)).all(), seg_cap


def test_coarse_entry_is_conservative():
    """The coarse entry matrix, repeated to kernel units, never exceeds
    the exact per-unit entry where the exact prepass finds a hit (a
    union AABB contains its members: the ray enters at or before any
    member, and every member hit is a union hit)."""
    rng = np.random.default_rng(59)
    planes, aabb = _scene(rng, t=4000)      # 32 chunks
    r = pallas_trace.BR                     # one block
    ro = rng.standard_normal((r, 3)).astype(np.float32) * 3
    rd = rng.standard_normal((r, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [ro.T, rd.T, np.full((1, r), 1e-3, np.float32),
         np.full((1, r), 50.0, np.float32)], axis=0))   # [8, BR]
    nc = aabb.shape[0]
    grp, c = 2, 8
    e_exact = pallas_trace._block_entry(rays, aabb, nc, 1, grp)
    e_coarse = pallas_trace._block_entry(rays, aabb, nc, 1, grp * c,
                                         force_union=True)
    n_kernel = (nc + grp - 1) // grp
    rep = np.asarray(jnp.repeat(e_coarse, c, axis=1)[:, :n_kernel])
    ex = np.asarray(e_exact)
    hit = ex < pallas_trace.INF
    assert hit.any()
    assert (rep[hit] <= ex[hit] + 1e-5).all()
