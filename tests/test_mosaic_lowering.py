"""Off-chip Mosaic lowering regression for every TPU Pallas kernel.

A jax upgrade can change Mosaic's MLIR verifier (jax 0.9 started
rejecting non-integer `tpu.iota`, which broke the mxuv kernels at
lowering time), and such breakage is INVISIBLE to the interpret-mode
CPU tests - it only surfaces when a kernel is lowered for the real
chip, where a failed step burns tunnel time inside a measurement run.
These tests AOT-lower each kernel for platform "tpu" from the CPU host
(`TPU_RT_LOWER_MOSAIC=1` forces `interpret=False`;
`jit(f).trace(...).lower(lowering_platforms=("tpu",))` runs the full
Mosaic lowering + verification) without touching hardware.

Replaces the reference's "shaders compile at init" guarantee
(naga validation at pipeline creation, src/wgpu_ctx.rs) with the
TPU-native equivalent: every kernel verifies before any dispatch.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_raytracer.models import scenes
from tpu_raytracer.ops import gather, pallas_trace
from tpu_raytracer.render import camera as camera_mod
from tpu_raytracer.render import pipeline, renderer
from tpu_raytracer.scene.builder import SceneBuilder
from tpu_raytracer.scene.geometry import create_cube, create_plane
from tpu_raytracer.scene.material import Material
from tpu_raytracer.utils.math3d import rotation_x, scale, translation


def _lower_tpu(fn, *args):
    """AOT-lower fn for the TPU platform; raises on Mosaic rejection."""
    jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


def _scene(t=300, seed=3):
    rng = np.random.default_rng(seed)
    v0 = rng.standard_normal((t, 3)).astype(np.float32) * 2
    e1 = rng.standard_normal((t, 3)).astype(np.float32)
    e2 = rng.standard_normal((t, 3)).astype(np.float32)
    planes, aabb, _ = pallas_trace.pack_triangles(v0, e1, e2)
    return jnp.asarray(planes), jnp.asarray(aabb)


def _rays(r=512, seed=3):
    rng = np.random.default_rng(seed)
    ro = jnp.asarray(rng.standard_normal((r, 3)).astype(np.float32) * 3)
    rd = rng.standard_normal((r, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    return ro, rd


MODES = ["vpu", "mxu3", "mxuw", "mxuf1", "mxuf2", "mxuf4",
         "mxuv2", "mxuv4", "mxus2", "mxus4"]


@pytest.mark.parametrize("mode", MODES)
def test_kernel_mode_lowers(trace_env, mode):
    trace_env.setenv("TPU_RT_LOWER_MOSAIC", "1")
    planes, aabb = _scene()
    ro, rd = _rays()
    _lower_tpu(
        lambda p, a, o, d: pallas_trace.trace_brute_pallas(
            p, a, o, d, 1e-3, 50.0, kernel=mode),
        planes, aabb, ro, rd)


@pytest.mark.parametrize("mode", ["mxuf2", "mxus2"])
def test_anyhit_lowers(trace_env, mode):
    trace_env.setenv("TPU_RT_LOWER_MOSAIC", "1")
    planes, aabb = _scene()
    ro, rd = _rays()
    _lower_tpu(
        lambda p, a, o, d: pallas_trace.trace_brute_pallas(
            p, a, o, d, 1e-3, 50.0, any_hit=True, kernel=mode),
        planes, aabb, ro, rd)


def test_mxus_matrix_best_lowers(trace_env):
    trace_env.setenv("TPU_RT_LOWER_MOSAIC", "1")
    trace_env.setenv("TPU_RT_MXUS_V", "1")
    planes, aabb = _scene()
    ro, rd = _rays()
    _lower_tpu(
        lambda p, a, o, d: pallas_trace.trace_brute_pallas(
            p, a, o, d, 1e-3, 50.0, kernel="mxus2"),
        planes, aabb, ro, rd)


def test_noworklist_kernel_lowers(trace_env):
    """The slab-prepass-free resident kernel (_mt_kernel_mxui)."""
    trace_env.setenv("TPU_RT_LOWER_MOSAIC", "1")
    trace_env.setenv("TPU_RT_NO_WORKLIST", "1")
    planes, aabb = _scene()
    ro, rd = _rays()
    _lower_tpu(
        lambda p, a, o, d: pallas_trace.trace_brute_pallas(
            p, a, o, d, 1e-3, 50.0, kernel="mxuf2"),
        planes, aabb, ro, rd)


def test_instanced_kernel_lowers(trace_env):
    trace_env.setenv("TPU_RT_LOWER_MOSAIC", "1")
    b = SceneBuilder()
    plane = b.add_mesh(create_plane())
    cube = b.add_mesh(create_cube())
    mw = b.add_material(Material((0.7, 0.7, 0.7, 1.0)))
    b.add_instance(plane, mw, translation([0, -1, 0]) @ scale(2.0))
    b.add_instance(cube, mw, translation([0.5, -0.6, 0.2]) @ scale(0.3))
    b.register_quad_light(
        plane, translation([0, 0.99, 0]) @ rotation_x(math.pi)
        @ scale(0.5), [1.0, 1.0, 1.0], 10.0)
    si = b.build(instancing="on")
    ro, rd = _rays()
    _lower_tpu(
        lambda o, d: pallas_trace.trace_instanced_pallas(
            si.tri_planes, si.obj_group_aabb, si.inst_affine_inv,
            si.inst_group_span, si.inst_aabb, o, d, 1e-3, 3.0e38),
        ro, rd)


def test_full_frame_lowers(trace_env):
    """The WHOLE ReSTIR frame (every kernel a real frame dispatches,
    plus all its XLA glue) must lower for TPU. This is the off-chip
    analogue of the reference's init-time shader validation."""
    trace_env.setenv("TPU_RT_FORCE_PALLAS", "1")
    trace_env.setenv("TPU_RT_LOWER_MOSAIC", "1")
    w = h = 64
    scene = scenes.create_cornell_box()
    cam = camera_mod.CameraController()
    state = pipeline.init_state(w, h)
    uniform = renderer.camera_to_device(
        cam.uniform(1.0, 0, scene.num_lights))
    _lower_tpu(
        lambda u, st: pipeline.render_frame(
            scene, u, jnp.uint32(0), st, w, h),
        uniform, state)
