"""Analytic light sampling for NEE (restir.wgsl:219-245).

Quad lights sample the parallelogram spanned by half-extent vectors u/v;
sphere lights sample the full sphere surface uniformly. Area pdf = 1/area
with areas precomputed at registration (builder.rs:392-429).

Vectors are component-major V3s (utils/vec3) - see vec3.py for why the
wavefront never materializes [R, 3] arrays.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils import vec3
from ..utils.vec3 import V3

PI = np.float32(np.pi)


def sample_light(light_rows, r1, r2):
    """Sample prefetched light rows (hit.gather_light) with uniforms r1, r2.

    Returns dict: pos V3, normal V3, pdf [R], emission V3 (rgb),
    emission_w [R], area [R].
    """
    position = light_rows["position"]
    ltype = light_rows["type"]
    u_vec = light_rows["u"]
    v_vec = light_rows["v"]
    area = light_rows["area"]

    # quad (type 0)
    su = r1 * 2.0 - 1.0
    sv = r2 * 2.0 - 1.0
    quad_pos = position + u_vec * su + v_vec * sv
    quad_normal = vec3.normalize(vec3.cross(u_vec, v_vec))

    # sphere (type 1): radius lives in v.x (light.rs rule)
    z = 1.0 - 2.0 * r1
    r_xy = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * r2
    local_dir = V3(r_xy * jnp.cos(phi), r_xy * jnp.sin(phi), z)
    sphere_pos = position + local_dir * v_vec.x

    is_quad = ltype == 0
    return {
        "pos": vec3.where(is_quad, quad_pos, sphere_pos),
        "normal": vec3.where(is_quad, quad_normal, local_dir),
        "pdf": 1.0 / jnp.maximum(area, 1e-12),
        "emission": light_rows["emission"],
        "emission_w": light_rows["emission_w"],
        "area": area,
    }
