"""Statistical correctness: BSDF energy, sampling consistency, ReSTIR
unbiasedness vs plain path tracing (SURVEY.md §4.3)."""

import numpy as np
import jax.numpy as jnp

from tpu_raytracer.models import scenes
from tpu_raytracer.ops import bsdf as bsdf_ops
from tpu_raytracer.render import camera as camera_mod
from tpu_raytracer.render import pipeline, renderer
from tpu_raytracer.utils import math3d, vec3


def _mat(n, roughness=0.5, metallic=0.0, transmission=0.0, ior=1.0):
    return {
        "roughness": jnp.full((n,), roughness, jnp.float32),
        "metallic": jnp.full((n,), metallic, jnp.float32),
        "transmission": jnp.full((n,), transmission, jnp.float32),
        "ior": jnp.full((n,), ior, jnp.float32),
    }


def test_diffuse_furnace():
    """Pure Lambert (metallic 0, high roughness): E[f cos / pdf] == albedo
    within MC error - the white furnace energy test."""
    n = 200000
    state = jnp.arange(n, dtype=jnp.uint32)
    normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    wo = math3d.normalize(jnp.tile(jnp.asarray([[0.3, 0.1, 0.9]]), (n, 1)))
    base = jnp.full((n, 3), 1.0)
    mat = _mat(n, roughness=0.99)
    _, smp = bsdf_ops.sample_bsdf(state, vec3.of(wo), None, vec3.of(normal),
                                  jnp.ones((n,), bool), mat, vec3.of(base))
    w = np.asarray(vec3.arr(smp["weight"]))
    # mean weight == hemispherical albedo; GGX@0.99 + Fresnel keeps it < 1
    mean = w.mean(axis=0)
    assert 0.85 < mean[0] < 1.05, mean


def test_sampling_matches_uniform_mc():
    """Importance-sampled E[f cos/pdf] == uniform-hemisphere MC of the same
    integral, for a glossy metal."""
    n = 400000
    normal = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    wo = math3d.normalize(jnp.tile(jnp.asarray([[0.4, 0.0, 0.8]]), (n, 1)))
    base = jnp.tile(jnp.asarray([[0.9, 0.7, 0.4]]), (n, 1))
    mat = _mat(n, roughness=0.4, metallic=1.0)

    state = jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(77)
    _, smp = bsdf_ops.sample_bsdf(state, vec3.of(wo), None, vec3.of(normal),
                                  jnp.ones((n,), bool), mat, vec3.of(base))
    est_importance = np.asarray(vec3.arr(smp["weight"])).mean(axis=0)

    rng = np.random.default_rng(3)
    z = rng.random(n).astype(np.float32)
    phi = rng.random(n).astype(np.float32) * 2 * np.pi
    r = np.sqrt(np.maximum(1 - z * z, 0))
    wi = jnp.asarray(np.stack([r * np.cos(phi), r * np.sin(phi), z], -1))
    f = bsdf_ops.eval_bsdf(vec3.of(normal), vec3.of(wi), vec3.of(wo), mat,
                           vec3.of(base))
    cos = jnp.maximum(math3d.dot(normal, wi), 0.0)
    est_uniform = np.asarray(
        (vec3.arr(f) * cos[:, None]).mean(axis=0) * (2 * np.pi))
    assert np.abs(est_importance - est_uniform).max() < 0.05, (
        est_importance, est_uniform)


def test_restir_mean_matches_progressive():
    """End-to-end unbiasedness: the ReSTIR pipeline's average HDR radiance
    must match plain progressive path tracing on the same scene."""
    w = h = 48
    scene = scenes.create_cornell_box_diffuse()

    frames = 24
    cam = camera_mod.CameraController()
    state = pipeline.init_state(w, h)
    restir_sum = np.zeros(3)
    for frame in range(frames):
        uniform = renderer.camera_to_device(
            cam.uniform(1.0, frame, scene.num_lights))
        ldr, hdr, state, aux = pipeline.render_frame(
            scene, uniform, jnp.uint32(frame), state, w, h)
        restir_sum += np.asarray(hdr).mean(axis=0)
    restir_mean = restir_sum / frames

    cam2 = camera_mod.CameraController()
    accum = renderer.make_accum(w, h)
    for frame in range(frames):
        uniform = renderer.camera_to_device(
            cam2.uniform(1.0, frame, scene.num_lights))
        accum, rad = renderer.render_progressive(
            scene, uniform, jnp.uint32(frame), accum, w, h)
    prog_mean = np.asarray(accum).mean(axis=0)

    rel = np.abs(restir_mean - prog_mean) / np.maximum(prog_mean, 1e-6)
    assert rel.max() < 0.15, (restir_mean, prog_mean)
