"""Unit tests for core math: octahedral codec, ONB, camera matrices, refract."""

import numpy as np
import jax.numpy as jnp

from tpu_raytracer.utils import math3d
from tpu_raytracer.scene.geometry import oct_encode_np


def test_octahedral_roundtrip():
    rng = np.random.default_rng(0)
    n = rng.normal(size=(4096, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    enc = math3d.oct_encode(jnp.asarray(n))
    dec = np.asarray(math3d.oct_decode(enc))
    assert np.abs((dec * n).sum(axis=1) - 1.0).max() < 1e-5


def test_octahedral_host_device_agree():
    rng = np.random.default_rng(1)
    n = rng.normal(size=(512, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    host = oct_encode_np(n)
    dev = np.asarray(math3d.oct_encode(jnp.asarray(n)))
    assert np.abs(host - dev).max() < 1e-6


def test_onb_orthonormal():
    rng = np.random.default_rng(2)
    n = rng.normal(size=(256, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    t, b = math3d.orthonormal_basis(jnp.asarray(n))
    t, b = np.asarray(t), np.asarray(b)
    assert np.abs((t * n).sum(axis=1)).max() < 1e-5
    assert np.abs((b * n).sum(axis=1)).max() < 1e-5
    assert np.abs((t * b).sum(axis=1)).max() < 1e-5
    assert np.abs(np.linalg.norm(t, axis=1) - 1).max() < 1e-5


def test_perspective_look_at_shapes():
    # Reference camera: 45 deg vfov, near 0.1, far 100 (camera.rs:219).
    proj = math3d.perspective_rh(np.radians(45.0), 16 / 9, 0.1, 100.0)
    view = math3d.look_at_rh([0, 0, 3], [0, 0, 2], [0, 1, 0])
    # eye maps to origin in view space
    p = view @ np.array([0, 0, 3, 1.0], np.float32)
    assert np.allclose(p[:3], 0, atol=1e-6)
    # a point straight ahead projects to ndc center with w>0
    clip = proj @ view @ np.array([0, 0, -2, 1.0], np.float32)
    ndc = clip[:3] / clip[3]
    assert np.allclose(ndc[:2], 0, atol=1e-6)
    assert 0.0 <= ndc[2] <= 1.0  # wgpu depth range


def test_inverse_ray_reconstruction():
    """proj_inv/view_inv chain reproduces a known forward projection."""
    proj = math3d.perspective_rh(np.radians(45.0), 1.0, 0.1, 100.0)
    view = math3d.look_at_rh([1, 2, 3], [0, 0, 0], [0, 1, 0])
    view_inv = np.linalg.inv(view)
    proj_inv = np.linalg.inv(proj)
    # gbuffer.wgsl:97-105 ray gen for center pixel
    ndc = np.array([0.0, 0.0], np.float32)
    origin = view_inv[:3, 3]
    target = view_inv @ (proj_inv @ np.array([ndc[0], ndc[1], 1.0, 1.0], np.float32))
    d = target[:3] / target[3] - origin
    d /= np.linalg.norm(d)
    fwd = -view[2, :3]  # look dir
    assert np.abs(d - fwd).max() < 1e-4


def test_refract_tir():
    v = jnp.asarray([[0.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    out = np.asarray(math3d.refract(v, n, 1.5))
    assert np.allclose(out, [[0, -1, 0]], atol=1e-6)  # straight through
    # grazing entry into denser-to-thinner: TIR -> zero vector
    v2 = math3d.normalize(jnp.asarray([[0.99, -0.1, 0.0]]))
    out2 = np.asarray(math3d.refract(v2, n, 1.5))
    assert np.allclose(out2, 0.0)
