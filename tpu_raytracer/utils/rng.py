"""Counter-free per-lane RNG matching the reference's PCG hash streams.

The reference keeps one `u32` RNG state per GPU thread and advances it with a
PCG hash (restir.wgsl:132-141).  Here every pixel/ray lane carries its own
uint32 state in a flat array; all helpers are vectorized and jittable.

Two stream flavours exist in the reference and both are reproduced:
  - ``rand``:      state' = pcg_hash(state); value = state' / (2^32-1)
                   (restir.wgsl:138-141)
  - ``rand_lcg``:  state' = state * A + C;  value = pcg_output(state')
                   (restir.wgsl:781-786) - the state is the raw LCG, the
                   output goes through the PCG xsh-rr style mix.

Conditional consumption (`rand_if`) only advances lanes where ``mask`` is
true - required to replicate the reference's data-dependent rand() calls
(e.g. Russian roulette only from depth 3, NEE skipped on specular).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_MUL = np.uint32(747796405)
_INC = np.uint32(2891336453)
_OUT = np.uint32(277803737)
_INV_U32_MAX = 1.0 / 4294967295.0


def pcg_hash(x):
    """restir.wgsl:132-136 — full PCG hash (LCG step + output mix)."""
    x = jnp.asarray(x, dtype=jnp.uint32)
    state = x * _MUL + _INC
    word = ((state >> ((state >> jnp.uint32(28)) + jnp.uint32(4))) ^ state) * _OUT
    return (word >> jnp.uint32(22)) ^ word


def _pcg_output(state):
    word = ((state >> ((state >> jnp.uint32(28)) + jnp.uint32(4))) ^ state) * _OUT
    return (word >> jnp.uint32(22)) ^ word


def rand(state):
    """Advance per-lane state; return (new_state, uniform f32 in [0, 1])."""
    new_state = pcg_hash(state)
    return new_state, new_state.astype(jnp.float32) * _INV_U32_MAX


def rand_if(state, mask):
    """Like :func:`rand` but only lanes where ``mask`` advance their state.

    Lanes with mask=False keep their state and return value 0.0 (unused).
    """
    new_state, value = rand(state)
    return jnp.where(mask, new_state, state), jnp.where(mask, value, 0.0)


def rand_lcg(state):
    """restir.wgsl:781-786 — raw-LCG state with hashed output."""
    new_state = state * _MUL + _INC
    value = _pcg_output(new_state).astype(jnp.float32) * _INV_U32_MAX
    return new_state, value


def rand_lcg_if(state, mask):
    new_state, value = rand_lcg(state)
    return jnp.where(mask, new_state, state), jnp.where(mask, value, 0.0)


def random_unit_vector(state):
    """restir.wgsl:143-150 — uniform direction on the unit sphere.

    Consumes exactly two rand() draws per lane (order: z then angle).
    Returns (new_state, [..., 3] unit vectors).
    """
    state, r1 = rand(state)
    state, r2 = rand(state)
    z = r1 * 2.0 - 1.0
    a = r2 * (2.0 * jnp.pi)
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return state, jnp.stack([r * jnp.cos(a), r * jnp.sin(a), z], axis=-1)


def random_unit_vector_if(state, mask):
    new_state, v = random_unit_vector(state)
    return jnp.where(mask, new_state, state), v


def halton(index: int, base: int) -> float:
    """Host-side Halton sequence (camera.rs:183-192)."""
    f, r, i = 1.0, 0.0, int(index)
    while i > 0:
        f /= base
        r += f * (i % base)
        i //= base
    return r
