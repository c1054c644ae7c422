"""Procedural showcase assets (models/procedural_assets.py).

The named scenes of the reference catalog (scenes.rs:321-504: Avocado,
DamagedHelmet, the VRM avatar, the gift-wrapped chocolate) must render a
REAL loaded asset through the product glTF path - never silently fall
back to the empty floor+light scene (VERDICT r3 item 7)."""

import os
import numpy as np
import pytest

from tpu_raytracer.models import procedural_assets as pa
from tpu_raytracer.models import scenes
from tpu_raytracer.scene.loader import load_gltf


def test_lathe_sphere_normals_and_winding():
    """A lathed full sphere: normals == radial directions, triangle
    winding consistent with them (CCW outward)."""
    part = pa.lathe(pa.sphere_profile(2.0, 32), nu=48)
    pos, nrm, idx = part["pos"], part["nrm"], part["idx"].reshape(-1, 3)
    r = np.linalg.norm(pos, axis=1)
    on_surface = np.abs(r - 2.0) < 1e-4
    assert on_surface.all()
    radial = pos / np.maximum(r[:, None], 1e-12)
    assert np.abs(np.sum(radial * nrm, axis=1) - 1.0).max() < 1e-4

    v0, v1, v2 = pos[idx[:, 0]], pos[idx[:, 1]], pos[idx[:, 2]]
    gn = np.cross(v1 - v0, v2 - v0)
    area2 = np.linalg.norm(gn, axis=1)
    real = area2 > 1e-9          # cap rows produce zero-area triangles
    assert real.sum() > 0.9 * real.size - 2 * 48
    centers = (v0 + v1 + v2) / 3.0
    out = np.sum(gn[real] * centers[real], axis=1)
    assert (out > 0).all(), "inward-facing triangles in lathe winding"


def test_lathe_pole_normals():
    part = pa.lathe(pa.sphere_profile(1.0, 16), nu=12)
    pos, nrm = part["pos"], part["nrm"]
    bottom = pos[:, 1] < -1.0 + 1e-6
    top = pos[:, 1] > 1.0 - 1e-6
    assert bottom.any() and top.any()
    np.testing.assert_allclose(
        nrm[bottom], np.tile([0.0, -1.0, 0.0], (int(bottom.sum()), 1)),
        atol=1e-5)
    np.testing.assert_allclose(
        nrm[top], np.tile([0.0, 1.0, 0.0], (int(top.sum()), 1)), atol=1e-5)


@pytest.mark.parametrize("name,writer,kw,want_prims,want_mats,want_imgs", [
    ("avocado", pa.write_avocado_glb, dict(nu=24, nv=16, tex_size=32),
     2, 2, 3),
    ("helmet", pa.write_helmet_glb, dict(nu=32, tex_size=32), 3, 3, 4),
    ("figure", pa.write_figure_glb, dict(nu=12, tex_size=32), 15, 5, 2),
    ("truffle", pa.write_truffle_glb, dict(nu=24, tex_size=32), 8, 2, 1),
])
def test_asset_roundtrip(tmp_path, name, writer, kw, want_prims, want_mats,
                         want_imgs):
    p = writer(str(tmp_path / f"{name}.glb"), **kw)
    meshes, materials, images, midx = load_gltf(p)
    assert len(meshes) == want_prims
    assert len(materials) == want_mats
    assert len(images) == want_imgs
    assert len(midx) == want_prims
    assert max(midx) == want_mats - 1      # every material is used
    for m in meshes:
        assert np.isfinite(m.positions).all()
        assert m.indices.max() < m.positions.shape[0]
        assert np.isfinite(m.tangents).all()


def test_named_scenes_render_real_assets():
    """Default-constructed named scenes must carry real geometry (not the
    2-triangle floor fallback) and the multi-material figure must register
    several materials + a textured one."""
    vrm = scenes.create_multi_material_model_scene()
    assert vrm.num_triangles > 5000
    helm = scenes.create_damaged_helmet_scene()
    assert helm.num_triangles > 20000
    avo = scenes.create_avocado_scene()
    assert avo.num_triangles > 8000
    mats = np.asarray(vrm.mat_table)
    # floor + 5 figure materials
    assert mats.shape[0] >= 6


def test_truffle_default_runs_rewrite_on_real_asset():
    """The truffle scene's luminance rewrite must hit BOTH branches on the
    loaded asset: glossy chocolate (roughness 0.02) and satin ribbon
    (roughness 0.25). scenes.rs:393-411."""
    scene = scenes.create_chocolate_truffle_scene()
    assert scene.num_lights == 3
    assert scene.num_triangles > 5000
    mats = np.asarray(scene.mat_table)
    rough = mats[:, 7]
    assert (np.abs(rough - 0.02) < 1e-6).any(), "no glossy chocolate row"
    assert (np.abs(rough - 0.25) < 1e-6).any(), "no satin ribbon row"


def test_truffle_renders_end_to_end():
    """Full-pipeline render of the default truffle scene: the showcase
    flow of the reference (scenes.rs:367-504) through the REAL glTF
    loader path - multi-primitive textured asset, luminance-rewritten
    materials, 3-sphere-light studio - must produce finite, non-black
    frames (catches texture/NaN/shape breaks no build-only test sees)."""
    import jax.numpy as jnp

    from tpu_raytracer.render import camera as camera_mod
    from tpu_raytracer.render import pipeline, renderer

    scene = scenes.create_chocolate_truffle_scene()
    w = h = 32
    cam = camera_mod.CameraController()
    state = pipeline.init_state(w, h)
    u = renderer.camera_to_device(cam.uniform(1.0, 0, scene.num_lights))
    ldr = None
    for f in range(2):
        ldr, hdr, state, aux = pipeline.render_frame(
            scene, u, jnp.uint32(f), state, w, h, static_ok=f > 0)
    img = np.asarray(ldr)
    assert np.isfinite(img).all()
    assert img.max() > 0.01, "black frame from the truffle showcase"


def test_winding_matches_normals_all_procedural_meshes():
    """Triangle winding must agree with the outward vertex normals for
    EVERY procedural asset mesh: cross(v1-v0, v2-v0) . vertex_normal > 0.

    The front-face flip (reconstruct_hit's ffnormal, the reference's MT
    sign convention) trusts the winding; inverted winding flips every
    shading normal and the model renders black - exactly the r5 dense-
    knot showcase bug (its tube quads were emitted clockwise)."""
    import tempfile

    import jax.numpy as jnp

    from tpu_raytracer.models import procedural_assets as pa
    from tpu_raytracer.models.dense_asset import write_knot_glb
    from tpu_raytracer.scene import loader
    from tpu_raytracer.utils import vec3

    def check(tag, m):
        pos = m.positions
        dec = vec3.oct_decode(jnp.asarray(m.oct_normals[:, 0]),
                              jnp.asarray(m.oct_normals[:, 1]))
        nrm = np.stack([np.asarray(dec.x), np.asarray(dec.y),
                        np.asarray(dec.z)], -1)
        tri = m.indices.reshape(-1, 3).astype(np.int64)
        v0, v1, v2 = pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]]
        g = np.cross(v1 - v0, v2 - v0)
        gl = np.linalg.norm(g, axis=-1, keepdims=True)
        ok = gl[:, 0] > 1e-12
        g = g[ok] / gl[ok]
        vn = (nrm[tri[:, 0]] + nrm[tri[:, 1]] + nrm[tri[:, 2]])[ok] / 3.0
        frac = (np.sum(g * vn, -1) > 0).mean()
        assert frac > 0.99, f"{tag}: {1 - frac:.1%} triangles wound inside-out"

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "knot.glb")
        write_knot_glb(p, major=60, minor=24)
        meshes, _, _, _ = loader.load_gltf(p)
        check("dense_knot", meshes[0])
        for wname in ("write_avocado_glb", "write_helmet_glb",
                      "write_truffle_glb", "write_figure_glb"):
            p = os.path.join(td, wname + ".glb")
            getattr(pa, wname)(p)
            meshes, _, _, _ = loader.load_gltf(p)
            for k, m in enumerate(meshes):
                check(f"{wname}[{k}]", m)
