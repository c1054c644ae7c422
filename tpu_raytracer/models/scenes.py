"""Ready-made scene catalog (src/scene/scenes.rs).

Each constructor returns a CompiledScene. Transform composition order is
identical to the reference (T * R * S applied to column vectors).
"""

from __future__ import annotations

import numpy as np

from ..scene.builder import SceneBuilder
from ..scene.geometry import create_crystal, create_cube, create_plane, create_sphere
from ..scene.material import Material
from ..utils.math3d import (hsv_to_rgb, rotation_x, rotation_y, rotation_z,
                            scale, translation)

PI = np.pi


def create_cornell_box():
    """scenes.rs:9-130: checker floor, colored walls, quad ceiling light,
    glass crystal with an internal blue sphere light, rough-metal tall box."""
    b = SceneBuilder()

    plane_id = b.add_mesh(create_plane())
    cube_id = b.add_mesh(create_cube())
    sphere_id = b.add_mesh(create_sphere(3))
    crystal_id = b.add_mesh(create_crystal())

    mat_red = b.add_material(Material((0.65, 0.05, 0.05, 1.0)))
    mat_green = b.add_material(Material((0.12, 0.45, 0.15, 1.0)))
    mat_white = b.add_material(Material((0.73, 0.73, 0.73, 1.0)))
    mat_checker = b.add_material(
        Material((0.73, 0.73, 0.73, 1.0)).roughness(0.99).texture(1))
    mat_rough_metal = b.add_material(Material((0.8, 0.8, 0.8, 1.0)).metallic(0.01))
    mat_crystal = b.add_material(Material((0.5, 0.8, 1.0, 1.0)).glass(1.5))

    # floor / ceiling / back / left / right
    b.add_instance(plane_id, mat_checker, translation([0, -1, 0]) @ scale(2.0))
    b.add_instance(plane_id, mat_white,
                   translation([0, 1, 0]) @ rotation_x(PI) @ scale(2.0))
    b.add_instance(plane_id, mat_white,
                   translation([0, 0, -1]) @ rotation_x(PI / 2) @ scale(2.0))
    b.add_instance(plane_id, mat_red,
                   translation([-1, 0, 0]) @ rotation_z(-PI / 2) @ scale(2.0))
    b.add_instance(plane_id, mat_green,
                   translation([1, 0, 0]) @ rotation_z(PI / 2) @ scale(2.0))

    # ceiling quad light
    b.register_quad_light(
        plane_id, translation([0, 0.99, 0]) @ rotation_x(PI) @ scale(0.5),
        [1.0, 1.0, 1.0], 10.0)

    # glass crystal + internal blue sphere light
    crystal_pos = [0.4, -0.5, 0.3]
    b.add_instance(crystal_id, mat_crystal, translation(crystal_pos) @ scale(0.5))
    b.register_sphere_light(
        sphere_id, translation(crystal_pos) @ scale(0.1), [0.02, 0.02, 0.9], 10.0)

    # tall rough-metal box
    b.add_instance(
        cube_id, mat_rough_metal,
        translation([-0.35, -0.4 + 0.002, -0.3]) @ rotation_y(0.4)
        @ scale([0.6, 1.2, 0.6]))

    return b.build()


def create_cornell_box_diffuse():
    """BASELINE config 1: diffuse-only Cornell (no glass/metal/sphere light)."""
    b = SceneBuilder()
    plane_id = b.add_mesh(create_plane())
    cube_id = b.add_mesh(create_cube())

    mat_red = b.add_material(Material((0.65, 0.05, 0.05, 1.0)))
    mat_green = b.add_material(Material((0.12, 0.45, 0.15, 1.0)))
    mat_white = b.add_material(Material((0.73, 0.73, 0.73, 1.0)))

    b.add_instance(plane_id, mat_white, translation([0, -1, 0]) @ scale(2.0))
    b.add_instance(plane_id, mat_white,
                   translation([0, 1, 0]) @ rotation_x(PI) @ scale(2.0))
    b.add_instance(plane_id, mat_white,
                   translation([0, 0, -1]) @ rotation_x(PI / 2) @ scale(2.0))
    b.add_instance(plane_id, mat_red,
                   translation([-1, 0, 0]) @ rotation_z(-PI / 2) @ scale(2.0))
    b.add_instance(plane_id, mat_green,
                   translation([1, 0, 0]) @ rotation_z(PI / 2) @ scale(2.0))
    b.register_quad_light(
        plane_id, translation([0, 0.99, 0]) @ rotation_x(PI) @ scale(0.5),
        [1.0, 1.0, 1.0], 10.0)
    b.add_instance(cube_id, mat_white,
                   translation([-0.35, -0.4, -0.3]) @ rotation_y(0.4)
                   @ scale([0.6, 1.2, 0.6]))
    b.add_instance(cube_id, mat_white,
                   translation([0.4, -0.7, 0.3]) @ rotation_y(-0.3)
                   @ scale([0.6, 0.6, 0.6]))
    return b.build()


def create_restir_scene():
    """scenes.rs:133-223: 100 colored sphere lights on a 10x10 grid."""
    b = SceneBuilder()
    plane_id = b.add_mesh(create_plane())
    sphere_id = b.add_mesh(create_sphere(2))
    cube_id = b.add_mesh(create_cube())

    mat_floor = b.add_material(Material((0.73, 0.73, 0.73, 1.0)).roughness(0.99))
    mat_wall = b.add_material(Material((0.73, 0.73, 0.73, 1.0)).roughness(0.99))
    mat_metal = b.add_material(Material((1.0, 1.0, 1.0, 1.0)).metallic(0.2))

    b.add_instance(plane_id, mat_floor, translation([0, -1, 0]) @ scale(10.0))
    b.add_instance(plane_id, mat_wall,
                   translation([0, 5, -5]) @ rotation_x(PI / 2) @ scale(10.0))

    rows = cols = 10
    spacing, light_radius, strength = 1.0, 0.05, 20.0
    for r in range(rows):
        for c in range(cols):
            x = (c - cols / 2.0) * spacing
            z = (r - rows / 2.0) * spacing
            y = -0.9
            hue = (r * cols + c) / (rows * cols)
            color = hsv_to_rgb(hue, 0.8, 1.0)
            emission = [color[0], color[1], color[2], strength]
            mat_id = b.add_material(
                Material((color[0], color[1], color[2], 1.0))
                .light_index(r * cols + c)
                .emissive([ch * strength for ch in color]))
            b.add_instance(
                sphere_id, mat_id,
                translation([x, y, z]) @ scale(light_radius), mask=0x2)
            b.add_sphere_light([x, y, z], light_radius, emission)

    b.add_instance(cube_id, mat_metal, translation([0, -0.5, 0]) @ scale(0.5))
    return b.build()


def add_gltf_to_builder(b: SceneBuilder, meshes, materials, images,
                        mat_indices, transform):
    """Register loaded glTF content: texture dedup + remap into the scene's
    color/data arrays (builder.rs:191-280), meshes, and one instance per
    primitive with its material (builder.rs:282-314)."""
    from ..scene.material import NO_TEXTURE

    color_map: dict = {}
    data_map: dict = {}

    def remap(img_idx, srgb):
        cache = color_map if srgb else data_map
        if img_idx not in cache:
            if srgb:
                cache[img_idx] = b.add_color_texture(images[img_idx], srgb=True)
            else:
                cache[img_idx] = b.add_data_texture(images[img_idx])
        return cache[img_idx]

    mat_ids = []
    for mat in materials:
        if mat.tex_id != NO_TEXTURE:
            mat.texture(remap(mat.tex_id, srgb=True))
        if mat.normal_tex_id != NO_TEXTURE:
            mat.normal_texture(remap(mat.normal_tex_id, srgb=False))
        if mat.occlusion_tex_id != NO_TEXTURE:
            mat.occlusion_texture(remap(mat.occlusion_tex_id, srgb=False))
        if mat.emissive_tex_id != NO_TEXTURE:
            mat.emissive_texture(remap(mat.emissive_tex_id, srgb=True))
        if mat.metallic_roughness_tex_id != NO_TEXTURE:
            mat.metallic_roughness_texture(
                remap(mat.metallic_roughness_tex_id, srgb=False))
        mat_ids.append(b.add_material(mat))

    mesh_ids = [b.add_mesh(m) for m in meshes]
    for i, mesh_id in enumerate(mesh_ids):
        mat_slot = mat_indices[i] if i < len(mat_indices) else 0
        mat_id = mat_ids[mat_slot] if mat_slot < len(mat_ids) else 0
        b.add_instance(mesh_id, mat_id, transform)
    return mesh_ids, mat_ids


def create_gltf_scene(path: str, scale_factor: float = 1.0,
                      translation_v=(0.0, -0.5, 0.0)):
    """scenes.rs:249-319: glTF asset on a floor under a quad light.

    Load failure falls back to the floor+light-only scene (the reference's
    empty-scene fallback, scenes.rs:313-316).
    """
    from ..scene.loader import load_gltf

    b = SceneBuilder()
    plane_id = b.add_mesh(create_plane())
    mat_floor = b.add_material(Material((0.73, 0.73, 0.73, 1.0)).roughness(0.9))
    b.add_instance(plane_id, mat_floor, translation([0, -1, 0]) @ scale(6.0))
    b.register_quad_light(
        plane_id, translation([0, 2.0, 0]) @ rotation_x(PI) @ scale(1.5),
        [1.0, 1.0, 1.0], 10.0)

    try:
        meshes, materials, images, mat_indices = load_gltf(path)
        add_gltf_to_builder(
            b, meshes, materials, images, mat_indices,
            translation(list(translation_v)) @ scale(scale_factor))
    except Exception as e:  # noqa: BLE001 - reference logs and falls back
        print(f"glTF load failed ({e}); rendering empty scene")
    return b.build()


def create_bunny_scene(subdiv_fallback: int = 4):
    """BASELINE config 3: triangle-mesh scene in a box with instancing.

    Uses the Stanford-bunny layout: a dense mesh on a pedestal inside the
    Cornell shell. With no bunny asset on disk, a high-subdivision icosphere
    (5k+ tris) exercises the same TLAS/BLAS instancing path.
    """
    b = SceneBuilder()
    plane_id = b.add_mesh(create_plane())
    dense_id = b.add_mesh(create_sphere(subdiv_fallback))

    mat_white = b.add_material(Material((0.73, 0.73, 0.73, 1.0)))
    mat_red = b.add_material(Material((0.65, 0.05, 0.05, 1.0)))
    mat_green = b.add_material(Material((0.12, 0.45, 0.15, 1.0)))
    mat_body = b.add_material(Material((0.8, 0.7, 0.5, 1.0)).roughness(0.4))

    b.add_instance(plane_id, mat_white, translation([0, -1, 0]) @ scale(2.0))
    b.add_instance(plane_id, mat_white,
                   translation([0, 1, 0]) @ rotation_x(PI) @ scale(2.0))
    b.add_instance(plane_id, mat_white,
                   translation([0, 0, -1]) @ rotation_x(PI / 2) @ scale(2.0))
    b.add_instance(plane_id, mat_red,
                   translation([-1, 0, 0]) @ rotation_z(-PI / 2) @ scale(2.0))
    b.add_instance(plane_id, mat_green,
                   translation([1, 0, 0]) @ rotation_z(PI / 2) @ scale(2.0))
    b.register_quad_light(
        plane_id, translation([0, 0.99, 0]) @ rotation_x(PI) @ scale(0.5),
        [1.0, 1.0, 1.0], 10.0)
    # three instances of the dense mesh - exercises instanced BLAS reuse
    b.add_instance(dense_id, mat_body, translation([0.0, -0.6, 0.0]) @ scale(0.8))
    b.add_instance(dense_id, mat_body,
                   translation([-0.55, -0.8, 0.4]) @ scale(0.4))
    b.add_instance(dense_id, mat_body,
                   translation([0.55, -0.8, -0.4]) @ scale(0.4))
    return b.build()
