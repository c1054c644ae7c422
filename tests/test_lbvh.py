"""LBVH invariants: Karras topology is a valid binary tree over the sorted
leaves, node AABBs contain their children, Morton reorder preserves traces."""

import numpy as np
import jax.numpy as jnp

from tpu_raytracer.models import scenes
from tpu_raytracer.ops import lbvh, trace_api


def _tris(n, seed=0):
    r = np.random.default_rng(seed)
    v0 = (r.random((n, 3), np.float32) - 0.5) * 4
    e1 = r.random((n, 3), np.float32) - 0.5
    e2 = r.random((n, 3), np.float32) - 0.5
    v1, v2 = v0 + e1, v0 + e2
    mn = np.minimum(np.minimum(v0, v1), v2)
    mx = np.maximum(np.maximum(v0, v1), v2)
    return mn, mx


def test_karras_topology_and_aabbs():
    t = 300
    mn, mx = _tris(t, seed=5)
    tree = lbvh.build_lbvh(jnp.asarray(mn), jnp.asarray(mx))
    left = np.asarray(tree["left"])
    right = np.asarray(tree["right"])
    n_int = t - 1

    # every node except the root is referenced exactly once
    refs = np.concatenate([left, right])
    counts = np.bincount(refs, minlength=2 * t - 1)
    assert counts[0] == 0                      # root (internal 0) unreferenced
    assert (counts[1:] == 1).all()

    # node AABBs contain children
    nmin = np.asarray(tree["node_min"])
    nmax = np.asarray(tree["node_max"])
    assert (nmin[np.arange(n_int)] <= nmin[left] + 1e-6).all()
    assert (nmin[np.arange(n_int)] <= nmin[right] + 1e-6).all()
    assert (nmax[np.arange(n_int)] >= nmax[left] - 1e-6).all()
    assert (nmax[np.arange(n_int)] >= nmax[right] - 1e-6).all()

    # root AABB == scene bounds
    assert np.allclose(nmin[0], mn.min(axis=0), atol=1e-6)
    assert np.allclose(nmax[0], mx.max(axis=0), atol=1e-6)

    # `order` is a permutation
    order = np.sort(np.asarray(tree["order"]))
    assert (order == np.arange(t)).all()


def test_morton_reorder_preserves_render():
    scene = scenes.create_cornell_box_diffuse()
    reordered = lbvh.morton_reorder(scene)
    r = np.random.default_rng(1)
    o = jnp.asarray((r.random((256, 3), np.float32) - 0.5) * 3)
    d = r.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    a = trace_api.scene_trace(scene, o, d, 1e-3, 100.0)
    b = trace_api.scene_trace(reordered, o, d, 1e-3, 100.0)
    hit_a = np.asarray(a["tri"]) >= 0
    assert (hit_a == (np.asarray(b["tri"]) >= 0)).all()
    assert np.abs(np.where(hit_a, np.asarray(a["t"]) - np.asarray(b["t"]),
                           0)).max() < 1e-4
    # shading rows follow the reorder: mat ids at hit points agree
    ta = np.asarray(scene.tri_table[:, 25]).astype(int)
    tb = np.asarray(reordered.tri_table[:, 25]).astype(int)
    ia = np.asarray(a["tri"])[hit_a]
    ib = np.asarray(b["tri"])[hit_a]
    assert (ta[ia] == tb[ib]).all()
