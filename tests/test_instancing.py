"""Two-level shared-BLAS instancing (scene/builder._build_instanced +
ops/pallas_trace.trace_instanced_pallas).

The reference keeps ONE BLAS per mesh and moves instances by transform
only (src/scene/builder.rs:143-189, TLAS update :454-468); these tests
pin the TPU realization to the flattened reference path: identical hits,
identical shading attributes, O(1)-per-mesh memory, O(I) refit.
"""

import math

import jax.numpy as jnp
import numpy as np

from tpu_raytracer.ops import pallas_trace
from tpu_raytracer.ops.trace_api import scene_trace
from tpu_raytracer.scene.builder import SceneBuilder
from tpu_raytracer.scene.geometry import (create_cube, create_plane,
                                          create_sphere)
from tpu_raytracer.scene.material import Material
from tpu_raytracer.utils.math3d import (rotation_x, rotation_y, scale,
                                        translation)

PI = math.pi


def _make_builder():
    b = SceneBuilder()
    plane = b.add_mesh(create_plane())
    cube = b.add_mesh(create_cube())
    sph = b.add_mesh(create_sphere(2))
    mw = b.add_material(Material((0.7, 0.7, 0.7, 1.0)))
    mr = b.add_material(Material((0.6, 0.2, 0.2, 1.0)).roughness(0.4))
    b.add_instance(plane, mw, translation([0, -1, 0]) @ scale(2.0))
    b.add_instance(plane, mw,
                   translation([0, 1, 0]) @ rotation_x(PI) @ scale(2.0))
    b.add_instance(cube, mr,
                   translation([-0.3, -0.5, 0]) @ rotation_y(0.4)
                   @ scale(0.4))
    b.add_instance(cube, mw, translation([0.5, -0.6, 0.2]) @ scale(0.3))
    b.add_instance(sph, mr, translation([0, 0, 0.5]) @ scale(0.25))
    b.register_quad_light(
        plane, translation([0, 0.99, 0]) @ rotation_x(PI) @ scale(0.5),
        [1.0, 1.0, 1.0], 10.0)
    return b


def _rays(n=1024, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    o[:, 1] = 0.8
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _scenes():
    global _SCENES
    try:
        return _SCENES
    except NameError:
        pass
    globals()["_SCENES"] = (_make_builder().build(),
                            _make_builder().build(instancing="on"))
    return _SCENES


def test_instanced_matches_flattened_closest_hit():
    sf, si = _scenes()
    assert not sf.instanced and si.instanced
    assert sf.num_triangles == si.num_triangles  # logical world count
    o, d = _rays()
    rf = scene_trace(sf, o, d, 1e-3, 3.0e38)
    ri = scene_trace(si, o, d, 1e-3, 3.0e38)
    hit_f = np.asarray(rf["tri"]) >= 0
    hit_i = np.asarray(ri["tri"]) >= 0
    assert (hit_f == hit_i).all()
    m = hit_f
    tf = np.asarray(rf["t"])[m]
    ti = np.asarray(ri["t"])[m]
    assert np.abs(tf - ti).max() < 1e-4


def test_instanced_matches_flattened_any_hit():
    sf, si = _scenes()
    o, d = _rays(seed=1)
    of = scene_trace(sf, o, d, 1e-3, 1.5, any_hit=True)
    oi = scene_trace(si, o, d, 1e-3, 1.5, any_hit=True)
    assert ((np.asarray(of["tri"]) >= 0)
            == (np.asarray(oi["tri"]) >= 0)).all()


def test_instanced_pallas_kernel_matches_xla():
    """Interpret-mode Pallas instanced kernel == compiled XLA fallback."""
    _, si = _scenes()
    o, d = _rays(n=512, seed=2)
    rp = pallas_trace.trace_instanced_pallas(
        si.tri_planes, si.obj_group_aabb, si.inst_affine_inv,
        si.inst_group_span, si.inst_aabb, o, d, 1e-3, 3.0e38)
    rx = pallas_trace._trace_instanced_xla(
        si.tri_planes, si.unit_inst, si.unit_group, si.inst_affine_inv,
        o, d, 1e-3, 3.0e38)
    assert (np.asarray(rp["tri"]) == np.asarray(rx["tri"])).all()
    assert (np.asarray(rp["inst"]) == np.asarray(rx["inst"])).all()
    ap = pallas_trace.trace_instanced_pallas(
        si.tri_planes, si.obj_group_aabb, si.inst_affine_inv,
        si.inst_group_span, si.inst_aabb, o, d, 1e-3, 1.5, any_hit=True)
    ax = pallas_trace._trace_instanced_xla(
        si.tri_planes, si.unit_inst, si.unit_group, si.inst_affine_inv,
        o, d, 1e-3, 1.5, any_hit=True)
    assert ((np.asarray(ap["tri"]) >= 0)
            == (np.asarray(ax["tri"]) >= 0)).all()


def test_instanced_hit_attributes_match():
    """reconstruct_hit through the instance tables == flattened rows."""
    from tpu_raytracer.ops.hit import reconstruct_hit
    from tpu_raytracer.utils import vec3

    sf, si = _scenes()
    o, d = _rays(seed=3)
    rf = scene_trace(sf, o, d, 1e-3, 3.0e38)
    ri = scene_trace(si, o, d, 1e-3, 3.0e38)
    ov, dv = vec3.of(o), vec3.of(d)
    hf = reconstruct_hit(sf, rf["tri"], ov, dv, rf["t"])
    hi = reconstruct_hit(si, ri["tri"], ov, dv, ri["t"],
                         inst_id=ri["inst"])
    m = np.asarray(rf["tri"]) >= 0

    def flat(h, key):
        val = h[key]
        if isinstance(val, vec3.V3):
            return np.asarray(vec3.arr(val))
        if isinstance(val, tuple):
            return np.stack([np.asarray(c) for c in val], -1)
        return np.asarray(val)

    for key, tol in (("pos", 1e-4), ("normal", 1e-4), ("ffnormal", 1e-4),
                     ("uv", 1e-4), ("t", 1e-4)):
        a = flat(hf, key)[m]
        b = flat(hi, key)[m]
        assert np.abs(a - b).max() < tol, key
    assert (np.asarray(hf["mat_id"])[m] == np.asarray(hi["mat_id"])[m]).all()
    assert (np.asarray(hf["front"])[m] == np.asarray(hi["front"])[m]).all()


def test_instanced_full_frame_close_to_flattened():
    """End-to-end frame (gbuffer -> ReSTIR -> post) through the instanced
    intersector stays close to the flattened render (same RNG stream;
    only float rounding differs between world- and object-space tests)."""
    from tpu_raytracer.render import camera as camera_mod
    from tpu_raytracer.render import pipeline, renderer

    sf, si = _scenes()
    w = h = 32
    cam = camera_mod.CameraController()
    outs = []
    for scene in (sf, si):
        state = pipeline.init_state(w, h)
        uniform = renderer.camera_to_device(
            cam.uniform(1.0, 0, scene.num_lights))
        ldr, hdr, state, aux = pipeline.render_frame(
            scene, uniform, jnp.uint32(0), state, w, h)
        img = np.asarray(ldr)
        assert np.isnan(img).sum() == 0
        outs.append(img)
    diff = np.abs(outs[0].astype(np.float64) - outs[1].astype(np.float64))
    # identical draws except where rounding flips a hit: mean is tiny
    assert diff.mean() < 2.0, diff.mean()
    assert (diff > 8).mean() < 0.02


def test_instanced_memory_is_per_mesh_not_per_instance():
    """100 instances of one cube cost ONE object block (+ padding), not
    100x - the whole point of builder.rs:143-189's shared BLAS."""
    b = SceneBuilder()
    cube = b.add_mesh(create_cube())
    mw = b.add_material(Material((0.7, 0.7, 0.7, 1.0)))
    rng = np.random.default_rng(0)
    for k in range(100):
        p = rng.uniform(-5, 5, 3)
        b.add_instance(cube, mw, translation(p) @ scale(0.3))
    s = b.build(instancing="on")
    unit = s.inst_grp * pallas_trace.CT
    assert s.tri_planes.shape[2] == unit          # one padded mesh block
    assert s.num_triangles == 100 * 12            # logical world count
    assert s.inst_table.shape == (100, 23)


def test_instancing_auto_selects_for_dense_replication():
    """auto mode flips on exactly when flattening exceeds the brute cap
    while unique meshes stay VMEM-resident."""
    from tpu_raytracer.ops.trace_api import BRUTE_FORCE_MAX_TRIS

    b = SceneBuilder()
    sph = b.add_mesh(create_sphere(4))
    nt = b.meshes[0].num_triangles
    mw = b.add_material(Material((0.7, 0.7, 0.7, 1.0)))
    n_inst = BRUTE_FORCE_MAX_TRIS // nt + 2       # flattened > cap
    rng = np.random.default_rng(1)
    for k in range(n_inst):
        b.add_instance(sph, mw,
                       translation(rng.uniform(-20, 20, 3)) @ scale(0.4))
    s = b.build()                                 # default instancing="auto"
    assert s.instanced
    assert s.num_triangles == n_inst * nt


def test_instanced_refit_is_transform_only():
    """update_instances on an instanced scene: O(I) table rewrite whose
    traces match a from-scratch build at the new transforms."""
    from tpu_raytracer.ops.refit import update_instances

    _, si = _scenes()
    b2 = _make_builder()
    new_tf = [np.asarray(tf, np.float32).copy()
              for (_, _, tf) in b2.instances]
    new_tf[2] = (translation([0.2, -0.4, -0.2]) @ rotation_y(1.1)
                 @ scale(0.5)).astype(np.float32)
    new_tf[4] = (translation([-0.4, 0.1, 0.3]) @ scale(0.2)).astype(
        np.float32)
    moved = update_instances(si, np.stack(new_tf))
    # geometry untouched (shared object blocks pass through the update)
    assert (np.asarray(moved.tri_planes) == np.asarray(si.tri_planes)).all()
    assert (np.asarray(moved.tri_table) == np.asarray(si.tri_table)).all()

    b3 = _make_builder()
    b3.instances = [(m, mat, new_tf[k])
                    for k, (m, mat, _) in enumerate(b3.instances)]
    rebuilt = b3.build(instancing="on")
    o, d = _rays(seed=4)
    rm = scene_trace(moved, o, d, 1e-3, 3.0e38)
    rr = scene_trace(rebuilt, o, d, 1e-3, 3.0e38)
    assert (np.asarray(rm["tri"]) == np.asarray(rr["tri"])).all()
    assert (np.asarray(rm["inst"]) == np.asarray(rr["inst"])).all()
    m = np.asarray(rm["tri"]) >= 0
    assert np.abs(np.asarray(rm["t"])[m] - np.asarray(rr["t"])[m]).max() \
        < 1e-4


def test_gallery_scene_memory_model():
    """The instancing gallery (VERDICT r2 item 5 'done' bar): N instances
    of one dense mesh cost ~1x the mesh's object-space triangle memory,
    and the scene traces correctly against its flattened twin."""
    import jax.numpy as jnp

    from tpu_raytracer.models import scenes as catalog

    s16 = catalog.create_instancing_gallery_scene(n=16, subdiv=3)
    s64 = catalog.create_instancing_gallery_scene(n=64, subdiv=3)
    assert s16.instanced and s64.instanced
    # object-space triangle/coefficient blocks do NOT scale with instances
    assert s64.tri_planes.shape == s16.tri_planes.shape
    assert s64.coef48.shape == s16.coef48.shape
    # per-instance additions are only affine rows + AABBs
    assert s64.inst_aabb.shape[0] == 64 + 2      # floor + light
    assert s64.num_triangles > 64 * 1000         # logical world tris

    rng = np.random.default_rng(17)
    o = jnp.asarray(rng.uniform(-2.5, 2.5, (512, 3)).astype(np.float32)
                    + np.float32([0, 3, 0]))
    d = rng.standard_normal((512, 3)).astype(np.float32) * 0.3
    d[:, 1] = -np.abs(d[:, 1]) - 1.0             # steeply down into the grid
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    res = scene_trace(s16, o, d, 1e-3, 3.0e38)
    assert (np.asarray(res["tri"]) >= 0).mean() > 0.9   # grid+floor cover
    assert np.asarray(res["inst"]).max() >= 2           # spheres get hit


def test_instanced_full_frame_pallas_kernel(trace_env):
    """Same end-to-end frame equality, but through the REAL instanced
    Pallas kernel (TPU_RT_FORCE_PALLAS=1 routes the CPU backend through
    it in interpret mode) - the default CPU dispatch exercises only the
    XLA fallback, so config 3's actual on-chip path had no full-pipeline
    coverage."""
    from tpu_raytracer.render import camera as camera_mod
    from tpu_raytracer.render import pipeline, renderer

    trace_env.setenv("TPU_RT_FORCE_PALLAS", "1")
    sf, si = _scenes()
    w = h = 32
    cam = camera_mod.CameraController()
    outs = []
    for scene in (sf, si):
        state = pipeline.init_state(w, h)
        uniform = renderer.camera_to_device(
            cam.uniform(1.0, 0, scene.num_lights))
        ldr, hdr, state, aux = pipeline.render_frame(
            scene, uniform, jnp.uint32(0), state, w, h)
        img = np.asarray(ldr)
        assert np.isnan(img).sum() == 0
        outs.append(img)
    diff = np.abs(outs[0].astype(np.float64) - outs[1].astype(np.float64))
    assert diff.mean() < 2.0, diff.mean()
    assert (diff > 8).mean() < 0.02


def test_instanced_vmem_residency_guard(monkeypatch):
    """The instanced kernel pins the whole per-mesh coef block in VMEM;
    past MXUF_MAX_TP triangle slots it must refuse loudly ON TPU (a
    Mosaic VMEM oversubscription can fault and wedge the axon tunnel)
    instead of dispatching. builder instancing="on" can request this -
    "auto" never does. CPU/interpret dispatch stays permitted."""
    import jax
    import pytest

    tp_big = pallas_trace.MXUF_MAX_TP + pallas_trace.CT
    obj_planes = jnp.zeros((4, 3, tp_big), jnp.float32)
    args = dict(
        obj_gaabb=jnp.zeros((8, 1), jnp.float32),
        inst_affine_inv=jnp.zeros((12, 1), jnp.float32),
        inst_group_span=jnp.zeros((2, 1), jnp.int32),
        inst_aabb=jnp.zeros((1, 8), jnp.float32),
        ray_o=jnp.zeros((8, 3), jnp.float32),
        ray_d=jnp.ones((8, 3), jnp.float32),
        t_min=1e-3, t_max=100.0)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pytest.raises(ValueError, match="VMEM-residency"):
        pallas_trace.trace_instanced_pallas(obj_planes, **args)
