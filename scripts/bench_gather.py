"""Microbenchmark: table-gather strategies on TPU for BVH record fetch."""

import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
import tpu_raytracer  # noqa: F401  (sets matmul precision)


def timeit(f, *args, n=20):
    f(*args)[0].block_until_ready() if isinstance(f(*args), tuple) else jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


S = 2048
R = 1 << 20  # 1M lanes
rng = np.random.default_rng(0)
table12 = jnp.asarray(rng.random((S, 12), np.float32))
table128 = jnp.asarray(rng.random((S, 128), np.float32))
idx = jnp.asarray(rng.integers(0, S, R).astype(np.int32))

@jax.jit
def rows12(t, i):
    return t[i]

@jax.jit
def rows128(t, i):
    return t[i]

@jax.jit
def onehot_bf16(t, i):
    oh = jax.nn.one_hot(i, S, dtype=jnp.bfloat16)
    return oh @ t.astype(jnp.bfloat16)

@jax.jit
def flat_scalar(t, i):
    flat = t.reshape(-1)
    base = i * 12
    cols = [flat[base + k] for k in range(12)]
    return jnp.stack(cols, axis=-1)

@jax.jit
def take_ax0(t, i):
    return jnp.take(t, i, axis=0)

for name, f, args in [
    ("rows [S,12] fancy-index", rows12, (table12, idx)),
    ("rows [S,128] fancy-index", rows128, (table128, idx)),
    ("one-hot bf16 matmul", onehot_bf16, (table12, idx)),
    ("12x flat scalar gather", flat_scalar, (table12, idx)),
    ("take axis0 [S,12]", take_ax0, (table12, idx)),
]:
    try:
        dt = timeit(f, *args)
        gbs = R * 12 * 4 / dt / 1e9
        print(f"{name:28s}: {dt*1e3:8.3f} ms  ({R/dt/1e9:.2f} G lookups/s)")
    except Exception as e:
        print(f"{name:28s}: FAILED {type(e).__name__}: {e}")
