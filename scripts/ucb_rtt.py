"""Quantify axon-tunnel per-dispatch overhead (r4).

The honest (value-anchored) headline is 3.28 Mrays/s = 890 ms/frame wall,
but the device profile shows jit_render_frame at 295 ms - the device is
idle ~2/3 of the wall window. This isolates where the ~600 ms/frame goes:

  A  chained jit dispatches, no new host inputs     -> pure dispatch cost
  B  + one tiny device_put per iteration            -> transfer RTT cost
  C  + jnp.uint32(i) per iteration (a second put)   -> per-put scaling
  D  the real frame loop's host-side pattern with a dummy compute

Timing is VALUE-anchored (utils/timing.sync_value) with CHAINED inputs so
the tunnel's dispatch dedup cannot lie. Every mode reports ms/iteration.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tpu_raytracer.utils.timing import sync_value

N = 16
SIZE = 256  # tiny matmul: device time per iter ~= negligible


@jax.jit
def step(x):
    return x @ x * 1e-3 + 1.0


@jax.jit
def step_u(x, u):
    return x @ x * 1e-3 + u


@jax.jit
def step_uf(x, u, f):
    return x @ x * 1e-3 + u + f.astype(jnp.float32)


def run(name, body, x0):
    x = body(x0, 0)          # warm compile
    sync_value(x)
    t0 = time.time()
    for i in range(1, N + 1):
        x = body(x, i)
    sync_value(x)
    dt = (time.time() - t0) / N * 1e3
    print(f"{name:36s} {dt:8.1f} ms/iter")
    return dt


def main():
    x0 = jnp.ones((SIZE, SIZE), jnp.float32)

    run("A chained dispatch only", lambda x, i: step(x), x0)
    run("B + device_put(20 floats)",
        lambda x, i: step_u(x, jax.device_put(
            jnp.zeros((), jnp.float32) * 0 + float(i))), x0)

    import numpy as np
    host_u = np.zeros((20,), np.float32)

    def body_c(x, i):
        host_u[0] = i
        u = jax.device_put(host_u)
        return step_uf(x, u[0], jnp.uint32(i))

    run("C + 20-float put + uint32 put", body_c, x0)

    # D: back-to-back dispatch pairs (render + a tiny aux fetch kept as a
    # device scalar, like the bench's aux["rays"]) - does holding extra
    # result handles serialize anything?
    @jax.jit
    def step_aux(x):
        y = x @ x * 1e-3 + 1.0
        return y, jnp.sum(y)

    keep = []

    def body_d(x, i):
        y, s = step_aux(x)
        keep.append(s)
        return y

    run("D chained + kept aux scalar", body_d, x0)

    # E: how big is one bare RTT (tiny fetch)?
    v = jnp.zeros((), jnp.float32) + 1.0
    sync_value(v)
    t0 = time.time()
    for _ in range(8):
        float(jnp.asarray(v))          # device->host fetch
    print(f"{'E bare fetch RTT':36s} {(time.time() - t0) / 8 * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
