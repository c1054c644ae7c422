"""PCG hash vectors + stream semantics (restir.wgsl:132-141,781-786)."""

import numpy as np
import jax.numpy as jnp

from tpu_raytracer.utils import rng


def _pcg_ref(x: int) -> int:
    state = (x * 747796405 + 2891336453) & 0xFFFFFFFF
    word = (((state >> ((state >> 28) + 4)) ^ state) * 277803737) & 0xFFFFFFFF
    return ((word >> 22) ^ word) & 0xFFFFFFFF


def test_pcg_hash_matches_scalar_reference():
    xs = np.array([0, 1, 2, 927163, 0xFFFFFFFF, 123456789], dtype=np.uint32)
    got = np.asarray(rng.pcg_hash(jnp.asarray(xs)))
    want = np.array([_pcg_ref(int(x)) for x in xs], dtype=np.uint32)
    assert (got == want).all()


def test_rand_uniform_range_and_mean():
    state = jnp.arange(100000, dtype=jnp.uint32)
    state, u = rng.rand(state)
    u = np.asarray(u)
    assert u.min() >= 0.0 and u.max() <= 1.0
    assert abs(u.mean() - 0.5) < 0.01


def test_rand_if_only_advances_masked_lanes():
    state = jnp.arange(8, dtype=jnp.uint32)
    mask = jnp.asarray([True, False] * 4)
    new_state, _ = rng.rand_if(state, mask)
    new_state = np.asarray(new_state)
    assert (new_state[1::2] == np.arange(8)[1::2]).all()
    assert (new_state[0::2] != np.arange(8)[0::2]).all()


def test_rand_lcg_differs_from_rand_stream():
    state = jnp.asarray([42], dtype=jnp.uint32)
    s1, v1 = rng.rand(state)
    s2, v2 = rng.rand_lcg(state)
    # states diverge: rand stores the hash, rand_lcg stores the raw LCG
    assert int(np.asarray(s1)[0]) != int(np.asarray(s2)[0])
    # but rand's value equals its own new state scaled
    assert abs(float(v1[0]) - int(np.asarray(s1)[0]) / 4294967295.0) < 1e-9


def test_random_unit_vector_is_unit_and_isotropic():
    state = jnp.arange(50000, dtype=jnp.uint32)
    _, v = rng.random_unit_vector(state)
    v = np.asarray(v)
    assert np.abs(np.linalg.norm(v, axis=1) - 1).max() < 1e-5
    assert np.abs(v.mean(axis=0)).max() < 0.02


def test_halton():
    # halton(1,2)=0.5, halton(2,2)=0.25, halton(3,2)=0.75; base3: 1/3, 2/3
    assert rng.halton(1, 2) == 0.5
    assert rng.halton(2, 2) == 0.25
    assert rng.halton(3, 2) == 0.75
    assert abs(rng.halton(1, 3) - 1 / 3) < 1e-9
    assert abs(rng.halton(2, 3) - 2 / 3) < 1e-9
