"""Vectorized wavefront vs the independent scalar oracle (tests/oracle.py).

Per-lane radiance must agree up to float-reassociation noise. Path
tracing is chaotic (an ulp in a sampled direction can flip a later hit or
RR decision), so a tiny fraction of knife-edge lanes may diverge
completely - the assertions are quantile-based: vectorization BUGS break
most lanes, ulp chaos breaks a few.
"""

import numpy as np
import jax.numpy as jnp

from tpu_raytracer.models import scenes
from tpu_raytracer.ops import gbuffer as gb_ops
from tpu_raytracer.ops import path_trace
from tpu_raytracer.render import camera as camera_mod
from tpu_raytracer.render import renderer
from tpu_raytracer.scene.builder import SceneBuilder
from tpu_raytracer.scene.geometry import (create_crystal, create_cube,
                                          create_plane, create_sphere)
from tpu_raytracer.scene.material import Material
from tpu_raytracer.utils import math3d
from tpu_raytracer.utils.math3d import rotation_x, rotation_z, scale, translation

from oracle import SceneView, trace_path_scalar

W = H = 48
PI = np.pi


def _untextured_cornell_glass():
    """Cornell-like box with glass + metal, NO textures (oracle scope)."""
    b = SceneBuilder()
    plane_id = b.add_mesh(create_plane())
    cube_id = b.add_mesh(create_cube())
    sphere_id = b.add_mesh(create_sphere(2))
    crystal_id = b.add_mesh(create_crystal())

    m_white = b.add_material(Material((0.73, 0.73, 0.73, 1.0)))
    m_red = b.add_material(Material((0.65, 0.05, 0.05, 1.0)))
    m_metal = b.add_material(Material((0.8, 0.8, 0.8, 1.0)).metallic(0.2))
    m_glass = b.add_material(Material((0.5, 0.8, 1.0, 1.0)).glass(1.5))

    b.add_instance(plane_id, m_white, translation([0, -1, 0]) @ scale(2.0))
    b.add_instance(plane_id, m_white,
                   translation([0, 1, 0]) @ rotation_x(PI) @ scale(2.0))
    b.add_instance(plane_id, m_red,
                   translation([0, 0, -1]) @ rotation_x(PI / 2) @ scale(2.0))
    b.register_quad_light(
        plane_id, translation([0, 0.99, 0]) @ rotation_x(PI) @ scale(0.5),
        [1.0, 1.0, 1.0], 10.0)
    b.add_instance(crystal_id, m_glass,
                   translation([0.4, -0.5, 0.3]) @ scale(0.5))
    b.add_instance(cube_id, m_metal,
                   translation([-0.4, -0.6, -0.2]) @ scale(0.5))
    b.register_sphere_light(
        sphere_id, translation([-0.4, 0.2, 0.5]) @ scale(0.1),
        [0.9, 0.2, 0.1], 8.0)
    return b.build()


def _run_compare(scene, n_lanes=220, seed0=12345):
    # Oracle scope: no texture may modulate shading. Texture 0 is the
    # all-white default that register_*_light attaches (builder.rs:316),
    # an identity for albedo - everything else must be untextured.
    from tpu_raytracer.scene.material import NO_TEXTURE
    mat = np.asarray(scene.mat_table)
    assert np.isin(mat[:, 12], [NO_TEXTURE, 0]).all(), \
        "oracle covers untextured scenes only"
    assert (mat[:, 13:17] == NO_TEXTURE).all(), \
        "oracle covers untextured scenes only"
    cam = camera_mod.CameraController()
    uniform = renderer.camera_to_device(cam.uniform(1.0, 0, scene.num_lights))
    gb = gb_ops.render_gbuffer(scene, uniform, W, H)
    seeds = jnp.asarray(
        np.random.default_rng(seed0).integers(0, 2 ** 32, W * H,
                                              dtype=np.uint32))
    out = path_trace.trace_path(scene, gb, uniform["view_pos"][:3], seeds)
    rad_vec = np.asarray(out["radiance"], np.float32)

    view = SceneView(scene)
    view_pos = np.asarray(uniform["view_pos"][:3], np.float32)
    valid = np.asarray(gb["valid"])
    lanes = np.random.default_rng(7).permutation(np.where(valid)[0])[:n_lanes]

    gb_np = {k: np.asarray(v) for k, v in gb.items()}
    normals = np.asarray(math3d.oct_decode(gb["oct_normal"]), np.float32)
    errs = []
    for lane in lanes:
        lane_gb = {
            "valid": bool(gb_np["valid"][lane]),
            "pos": gb_np["pos"][lane],
            "normal": normals[lane],
            "albedo": gb_np["albedo"][lane],
            "mat_id": int(gb_np["mat_id"][lane]),
        }
        want = trace_path_scalar(view, lane_gb, view_pos,
                                 int(np.asarray(seeds)[lane]))
        got = rad_vec[lane]
        errs.append(np.abs(got - want).max() / (1.0 + np.abs(want).max()))
    errs = np.asarray(errs)
    # most lanes numerically identical; allow a handful of chaotic flips
    assert np.median(errs) < 1e-5, np.median(errs)
    frac_good = (errs < 1e-3).mean()
    assert frac_good > 0.95, (frac_good, np.sort(errs)[-8:])


def test_oracle_diffuse_cornell():
    _run_compare(scenes.create_cornell_box_diffuse())


def test_oracle_glass_metal():
    _run_compare(_untextured_cornell_glass())
