"""BSDF library: GGX specular (VNDF-sampled), Lambert diffuse, glass delta.

Vectorized port of the reference's shading model (restir.wgsl:160-371):
  - GGX NDF (:182-187), exact height-uncorrelated Smith G1/G (:189-199)
  - VNDF sampling (:202-216)
  - Schlick Fresnel (:170-172) and dielectric reflectance (:175-180)
  - stochastic lobe selection by Fresnel-vs-diffuse luminance (:327-348)
  - glass as a delta lobe: Schlick-probability reflect/refract (:311-325)
  - combined eval_bsdf (:278-305) / eval_pdf (:249-276)

RNG consumption per lane mirrors the reference exactly (see utils/rng.py):
glass consumes 1 draw, non-glass consumes 3 (lobe + 2 for VNDF/unit-vector).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import math3d, rng

PI = jnp.float32(jnp.pi)


def fresnel_schlick(f0, v_dot_h):
    """f0: [R, 3]; v_dot_h: [R]. Returns [R, 3]."""
    c = jnp.clip(1.0 - v_dot_h, 0.0, 1.0)
    return f0 + (1.0 - f0) * (c ** 5)[:, None]


def reflectance(cosine, ref_idx):
    """Schlick dielectric reflectance (restir.wgsl:175-180)."""
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5


def ndf_ggx(n_dot_h, roughness):
    a = roughness * roughness
    a2 = a * a
    d = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    # a2=0 & d=0 (delta lobe at grazing NDF peak) must yield 0, not 0/0
    return a2 / jnp.maximum(PI * d * d, 1e-20)


def g1_ggx(n_dot_v, roughness):
    a2 = roughness * roughness
    return 2.0 * n_dot_v / jnp.maximum(
        n_dot_v + jnp.sqrt(a2 + (1.0 - a2) * n_dot_v * n_dot_v), 1e-12
    )


def geometry_smith(n_dot_l, n_dot_v, roughness):
    return g1_ggx(n_dot_l, roughness) * g1_ggx(n_dot_v, roughness)


def sample_ggx_vndf(wo_local, roughness, u1, u2):
    """Visible-NDF sampling in local (z-up) space (restir.wgsl:202-216)."""
    alpha = (roughness * roughness)[:, None]
    vh = math3d.normalize(
        jnp.concatenate([alpha * wo_local[:, :2], wo_local[:, 2:3]], axis=-1)
    )
    lensq = vh[:, 0] ** 2 + vh[:, 1] ** 2
    inv_len = jnp.where(lensq > 0.0, 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20)), 0.0)
    t1 = jnp.where(
        (lensq > 0.0)[:, None],
        jnp.stack([-vh[:, 1] * inv_len, vh[:, 0] * inv_len, jnp.zeros_like(inv_len)], axis=-1),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), vh.shape),
    )
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(u1)
    phi = 2.0 * PI * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[:, 2])
    p2_lerp = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    nh = (
        p1[:, None] * t1
        + p2_lerp[:, None] * t2
        + jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2_lerp * p2_lerp))[:, None] * vh
    )
    return math3d.normalize(
        jnp.concatenate([alpha * nh[:, :2], jnp.maximum(nh[:, 2:3], 0.0)], axis=-1)
    )


def _spec_diff_probability(base_color, metallic, ffnormal, wo):
    """Fresnel-luminance lobe probability (restir.wgsl:328-334)."""
    f0 = _mix_f0(base_color, metallic)
    f_view = fresnel_schlick(f0, jnp.maximum(math3d.dot(ffnormal, wo), 0.0))
    lum_spec = math3d.luminance(f_view)
    lum_diff = math3d.luminance(base_color * (1.0 - metallic)[:, None])
    return jnp.clip(lum_spec / (lum_spec + lum_diff + 1e-4), 0.001, 0.999)


def _mix_f0(base_color, metallic):
    return 0.04 + (base_color - 0.04) * metallic[:, None]


def eval_pdf(normal, wi, wo, mat, base_color):
    """restir.wgsl:249-276. Returns 0 for glass (delta) and invalid configs."""
    n_dot_l = math3d.dot(normal, wi)
    n_dot_v = math3d.dot(normal, wo)
    prob_spec = _spec_diff_probability(base_color, mat["metallic"], normal, wo)

    h = math3d.normalize(wi + wo)
    n_dot_h = jnp.maximum(math3d.dot(normal, h), 0.0)
    d = ndf_ggx(n_dot_h, mat["roughness"])
    g1 = g1_ggx(jnp.maximum(n_dot_v, 1e-6), mat["roughness"])
    pdf_spec = (d * g1) / jnp.maximum(4.0 * n_dot_v, 1e-6)
    pdf_diff = jnp.maximum(n_dot_l, 0.0) / PI

    pdf = prob_spec * pdf_spec + (1.0 - prob_spec) * pdf_diff
    invalid = (mat["transmission"] > 0.01) | (n_dot_l <= 0.0) | (n_dot_v <= 0.0)
    return jnp.where(invalid, 0.0, pdf)


def eval_bsdf(normal, wi, wo, mat, base_color):
    """restir.wgsl:278-305. Returns [R, 3]; 0 for glass/invalid configs."""
    n_dot_l = math3d.dot(normal, wi)
    n_dot_v = math3d.dot(normal, wo)
    h = math3d.normalize(wi + wo)
    n_dot_h = jnp.maximum(math3d.dot(normal, h), 0.0)
    h_dot_v = jnp.maximum(math3d.dot(h, wo), 0.0)
    f0 = _mix_f0(base_color, mat["metallic"])

    d = ndf_ggx(n_dot_h, mat["roughness"])
    g = geometry_smith(jnp.maximum(n_dot_l, 1e-6), jnp.maximum(n_dot_v, 1e-6),
                       mat["roughness"])
    f = fresnel_schlick(f0, h_dot_v)
    specular = (d * g)[:, None] * f / jnp.maximum(4.0 * n_dot_l * n_dot_v, 1e-3)[:, None]

    kd = (1.0 - f) * (1.0 - mat["metallic"])[:, None]
    diffuse = kd * base_color / PI

    invalid = (mat["transmission"] > 0.01) | (n_dot_l <= 0.0) | (n_dot_v <= 0.0)
    return jnp.where(invalid[:, None], 0.0, diffuse + specular)


def sample_bsdf(state, wo, hit_pos, ffnormal, front_face, mat, base_color,
                active=None):
    """restir.wgsl:307-371. Returns (state, dict(wi, pdf, weight, is_delta)).

    Per-lane RNG draws match the reference order exactly:
      glass lane:      1 draw  (reflect-vs-refract)
      non-glass lane:  3 draws (lobe select, then u1, u2)
    Lanes with ``active`` False draw nothing (dead paths in the wavefront).
    """
    is_glass = mat["transmission"] > 0.01
    if active is None:
        active = jnp.ones_like(is_glass)

    # --- glass delta lobe ---
    state, r_glass = rng.rand_if(state, is_glass & active)
    refraction_ratio = jnp.where(front_face, 1.0 / mat["ior"], mat["ior"])
    cos_theta = jnp.minimum(math3d.dot(wo, ffnormal), 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    cannot_refract = refraction_ratio * sin_theta > 1.0
    do_reflect = cannot_refract | (reflectance(cos_theta, refraction_ratio) > r_glass)
    wi_reflect = math3d.reflect(-wo, ffnormal)
    wi_refract = math3d.refract(-wo, ffnormal, refraction_ratio)
    wi_glass = jnp.where(do_reflect[:, None], wi_reflect, wi_refract)

    # --- unified PBR stochastic lobe ---
    prob_spec = _spec_diff_probability(base_color, mat["metallic"], ffnormal, wo)
    not_glass = ~is_glass & active
    state, r_lobe = rng.rand_if(state, not_glass)
    state, r1 = rng.rand_if(state, not_glass)
    state, r2 = rng.rand_if(state, not_glass)
    pick_spec = r_lobe < prob_spec

    tangent, bitangent = math3d.orthonormal_basis(ffnormal)
    wo_local = math3d.to_local(tangent, bitangent, ffnormal, wo)
    wm_local = sample_ggx_vndf(wo_local, mat["roughness"], r1, r2)
    wm = math3d.to_world(tangent, bitangent, ffnormal, wm_local)
    wi_spec = math3d.reflect(-wo, wm)

    # diffuse: ffnormal + unit sphere sample (consumes the same r1, r2)
    z = r1 * 2.0 - 1.0
    a = r2 * (2.0 * PI)
    rxy = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    unit = jnp.stack([rxy * jnp.cos(a), rxy * jnp.sin(a), z], axis=-1)
    wi_diff = math3d.normalize(ffnormal + unit)

    wi_pbr = jnp.where(pick_spec[:, None], wi_spec, wi_diff)
    n_dot_l = math3d.dot(ffnormal, wi_pbr)
    n_dot_v = math3d.dot(ffnormal, wo)
    valid = (n_dot_l > 0.0) & (n_dot_v > 0.0)

    bsdf_val = eval_bsdf(ffnormal, wi_pbr, wo, mat, base_color)
    pdf = eval_pdf(ffnormal, wi_pbr, wo, mat, base_color)
    weight_pbr = jnp.where(
        (valid & (pdf > 0.0))[:, None],
        bsdf_val * n_dot_l[:, None] / jnp.maximum(pdf, 1e-20)[:, None],
        0.0,
    )

    wi = jnp.where(is_glass[:, None], wi_glass, wi_pbr)
    weight = jnp.where(is_glass[:, None], base_color, weight_pbr)
    out_pdf = jnp.where(is_glass, 0.0, jnp.where(valid, pdf, 0.0))
    return state, {
        "wi": wi,
        "pdf": out_pdf,
        "weight": weight,
        "is_delta": is_glass,
    }
