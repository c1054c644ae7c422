"""Scalar path-trace oracle: an INDEPENDENT per-pixel implementation.

The production tracer (ops/path_trace.py) vectorizes the reference's
per-thread control flow into masked lanes; this oracle re-implements the
same semantics (restir.wgsl:460-737) as a plain Python loop per pixel
with REAL branches and breaks, in numpy float32. Agreement between the
two is evidence the wavefront masking (active lanes, conditional RNG
consumption, per-lane termination) is faithful - a shared-bug between
them would have to be a shared reading of the reference, not a
vectorization artifact.

Scope: untextured scenes (the test asserts scene.tex_channels is empty);
all BSDF lobes (diffuse/GGX/glass) and light types are covered.
"""

from __future__ import annotations

import numpy as np

F = np.float32
U = np.uint32
MAX_DEPTH = 8
RR_START_DEPTH = 3
T_MIN = F(1e-3)
T_MAX = F(100.0)
PI = F(np.pi)


# ---------------------------------------------------------------- RNG ----
class Rng:
    MUL = 747796405
    INC = 2891336453
    OUT = 277803737
    INV = F(1.0 / 4294967295.0)

    def __init__(self, seed: int):
        self.state = int(seed) & 0xFFFFFFFF

    def rand(self) -> F:
        s = (self.state * self.MUL + self.INC) & 0xFFFFFFFF
        self.state = self._mix(s)
        return F(self.state) * self.INV

    @staticmethod
    def _mix(s: int) -> int:
        word = (((s >> ((s >> 28) + 4)) ^ s) * Rng.OUT) & 0xFFFFFFFF
        return ((word >> 22) ^ word) & 0xFFFFFFFF


def _n(v):
    return (v / F(np.sqrt(np.dot(v, v)))).astype(F)


def _dot(a, b):
    return F(np.dot(a.astype(F), b.astype(F)))


# ---------------------------------------------------------- intersection --
def intersect(tri, o, d, t_min, t_max):
    """Closest hit over the packed world soup. tri = (v0, e1, e2, valid)."""
    v0, e1, e2, valid = tri
    pvec = np.cross(d[None], e2).astype(F)
    det = np.sum(e1 * pvec, 1, dtype=F)
    ok = np.abs(det) > 1e-9
    inv = np.where(ok, F(1.0) / np.where(ok, det, F(1.0)), F(0.0)).astype(F)
    tvec = (o[None] - v0).astype(F)
    u = np.sum(tvec * pvec, 1, dtype=F) * inv
    qvec = np.cross(tvec, e1).astype(F)
    v = np.sum(d[None] * qvec, 1, dtype=F) * inv
    t = np.sum(e2 * qvec, 1, dtype=F) * inv
    hit = (ok & valid & (u >= 0) & (v >= 0) & (u + v <= 1)
           & (t > t_min) & (t < t_max))
    if not hit.any():
        return None
    idx = int(np.where(hit, t, np.inf).argmin())
    return {"tri": idx, "t": F(t[idx]), "u": F(u[idx]), "v": F(v[idx]),
            "front": bool(det[idx] > 0)}


def occluded(tri, o, d, t_min, t_max):
    return intersect(tri, o, d, t_min, t_max) is not None


# ------------------------------------------------------------- scene view --
class SceneView:
    """Numpy copies of the CompiledScene tables the oracle needs."""

    def __init__(self, scene):
        p = np.asarray(scene.tri_planes, F)
        self.tri = (p[0].T.copy(), p[1].T.copy(), p[2].T.copy(),
                    p[3, 0] > 0.5)
        self.tri_table = np.asarray(scene.tri_table, F)
        self.mat = np.asarray(scene.mat_table, F)
        self.light = np.asarray(scene.light_table, F)
        self.num_lights = scene.num_lights


def _mat(view, mid):
    row = view.mat[mid]
    return {"base_color": row[0:4], "emissive_factor": row[4:7],
            "roughness": F(row[7]), "metallic": F(row[8]),
            "transmission": F(row[9]), "ior": F(row[10]),
            "light_index": int(row[11])}


def _reconstruct(view, hit, o, d):
    row = view.tri_table[hit["tri"]]
    u, v = hit["u"], hit["v"]
    w = F(1.0) - u - v
    n = _n(row[0:3] * w + row[3:6] * u + row[6:9] * v)
    ff = n if hit["front"] else -n
    pos = (o + d * hit["t"]).astype(F)
    return {"pos": pos, "normal": n, "ffnormal": ff,
            "mat_id": int(row[25]), "front": hit["front"], "t": hit["t"]}


# ------------------------------------------------------------------ BSDF --
def _f0(base, metallic):
    return (F(0.04) + (base - F(0.04)) * metallic).astype(F)


def _fresnel(f0, voh):
    c = F(np.clip(1.0 - voh, 0.0, 1.0))
    return (f0 + (1.0 - f0) * c ** 5).astype(F)


def _lum(c):
    return F(c[0] * F(0.2126) + c[1] * F(0.7152) + c[2] * F(0.0722))


def _ndf(ndh, rough):
    a = rough * rough
    a2 = a * a
    dd = ndh * ndh * (a2 - 1.0) + 1.0
    return F(a2 / max(PI * dd * dd, 1e-20))


def _g1(ndv, rough):
    a2 = rough * rough
    return F(2.0 * ndv / max(ndv + np.sqrt(a2 + (1.0 - a2) * ndv * ndv),
                             1e-12))


def _prob_spec(base, metallic, n, wo):
    f_view = _fresnel(_f0(base, metallic), max(_dot(n, wo), F(0.0)))
    ls = _lum(f_view)
    ld = _lum(base * (F(1.0) - metallic))
    return F(np.clip(ls / (ls + ld + F(1e-4)), 0.001, 0.999))


def _eval_pdf(n, wi, wo, m, base):
    ndl = _dot(n, wi)
    ndv = _dot(n, wo)
    if m["transmission"] > 0.01 or ndl <= 0.0 or ndv <= 0.0:
        return F(0.0)
    ps = _prob_spec(base, m["metallic"], n, wo)
    h = _n(wi + wo)
    ndh = max(_dot(n, h), F(0.0))
    d = _ndf(ndh, m["roughness"])
    g1 = _g1(max(ndv, F(1e-6)), m["roughness"])
    pdf_spec = F(d * g1 / max(4.0 * ndv, 1e-6))
    pdf_diff = F(max(ndl, 0.0) / PI)
    return F(ps * pdf_spec + (1.0 - ps) * pdf_diff)


def _eval_bsdf(n, wi, wo, m, base):
    ndl = _dot(n, wi)
    ndv = _dot(n, wo)
    if m["transmission"] > 0.01 or ndl <= 0.0 or ndv <= 0.0:
        return np.zeros(3, F)
    h = _n(wi + wo)
    ndh = max(_dot(n, h), F(0.0))
    hdv = max(_dot(h, wo), F(0.0))
    f0 = _f0(base, m["metallic"])
    d = _ndf(ndh, m["roughness"])
    g = _g1(max(ndl, F(1e-6)), m["roughness"]) * _g1(max(ndv, F(1e-6)),
                                                     m["roughness"])
    f = _fresnel(f0, hdv)
    spec = (d * g * f / max(4.0 * ndl * ndv, 1e-3)).astype(F)
    kd = ((1.0 - f) * (1.0 - m["metallic"])).astype(F)
    diff = (kd * base / PI).astype(F)
    return diff + spec


def _reflect(v, n):
    return (v - 2.0 * _dot(v, n) * n).astype(F)


def _refract(v, n, eta):
    # mirrors utils/math3d.refract term-for-term (WGSL semantics)
    cos_i = F(-_dot(v, n))
    sin2_t = F(eta * eta * (F(1.0) - cos_i * cos_i))
    k = F(1.0) - sin2_t
    if k < 0.0:
        return np.zeros(3, F)
    return (eta * v + (eta * cos_i - F(np.sqrt(k))) * n).astype(F)


def _reflectance(cos, idx):
    r0 = (1.0 - idx) / (1.0 + idx)
    r0 = r0 * r0
    return F(r0 + (1.0 - r0) * (1.0 - cos) ** 5)


def _basis(n):
    # math3d.orthonormal_basis
    sign = F(1.0) if n[2] >= 0 else F(-1.0)
    a = F(-1.0) / (sign + n[2])
    b = n[0] * n[1] * a
    t = np.array([1.0 + sign * n[0] * n[0] * a, sign * b, -sign * n[0]], F)
    bt = np.array([b, sign + n[1] * n[1] * a, -n[1]], F)
    return t, bt


def _sample_vndf(wo_l, rough, u1, u2):
    alpha = F(rough * rough)
    vh = _n(np.array([alpha * wo_l[0], alpha * wo_l[1], wo_l[2]], F))
    lensq = F(vh[0] ** 2 + vh[1] ** 2)
    if lensq > 0.0:
        inv = F(1.0 / np.sqrt(max(lensq, F(1e-20))))
        t1 = np.array([-vh[1] * inv, vh[0] * inv, 0.0], F)
    else:
        t1 = np.array([1.0, 0.0, 0.0], F)
    t2 = np.cross(vh, t1).astype(F)
    r = F(np.sqrt(u1))
    phi = F(2.0 * PI * u2)
    p1 = F(r * np.cos(phi))
    p2 = F(r * np.sin(phi))
    s = F(0.5 * (1.0 + vh[2]))
    p2l = F((1.0 - s) * np.sqrt(max(1.0 - p1 * p1, F(0.0))) + s * p2)
    nh = (p1 * t1 + p2l * t2
          + F(np.sqrt(max(0.0, 1.0 - p1 * p1 - p2l * p2l))) * vh).astype(F)
    return _n(np.array([alpha * nh[0], alpha * nh[1], max(nh[2], F(0.0))], F))


def _sample_bsdf(rng, wo, ffn, front, m, base):
    if m["transmission"] > 0.01:
        r = rng.rand()
        ratio = F(1.0 / m["ior"]) if front else m["ior"]
        cos = min(_dot(wo, ffn), F(1.0))
        sin = F(np.sqrt(max(1.0 - cos * cos, F(0.0))))
        if ratio * sin > 1.0 or _reflectance(cos, ratio) > r:
            wi = _reflect(-wo, ffn)
        else:
            wi = _refract(-wo, ffn, ratio)
        return {"wi": wi, "pdf": F(0.0), "weight": base[:3].copy()}

    ps = _prob_spec(base[:3], m["metallic"], ffn, wo)
    r_lobe = rng.rand()
    u1 = rng.rand()
    u2 = rng.rand()
    t, bt = _basis(ffn)
    if r_lobe < ps:
        wo_l = np.array([_dot(t, wo), _dot(bt, wo), _dot(ffn, wo)], F)
        wm_l = _sample_vndf(wo_l, m["roughness"], u1, u2)
        wm = (wm_l[0] * t + wm_l[1] * bt + wm_l[2] * ffn).astype(F)
        wi = _reflect(-wo, _n(wm))
    else:
        z = F(u1 * 2.0 - 1.0)
        a = F(u2 * 2.0 * PI)
        rxy = F(np.sqrt(max(1.0 - z * z, F(0.0))))
        unit = np.array([rxy * np.cos(a), rxy * np.sin(a), z], F)
        wi = _n(ffn + unit)
    ndl = _dot(ffn, wi)
    ndv = _dot(ffn, wo)
    pdf = _eval_pdf(ffn, wi, wo, m, base[:3])
    if ndl > 0.0 and ndv > 0.0 and pdf > 0.0:
        w = (_eval_bsdf(ffn, wi, wo, m, base[:3]) * ndl / max(pdf, F(1e-20)))
        w = w.astype(F)
    else:
        w = np.zeros(3, F)
    return {"wi": wi, "pdf": pdf, "weight": w}


# ------------------------------------------------------------------- NEE --
def _sample_light(row, r1, r2):
    position = row[0:3]
    ltype = int(row[3])
    u_vec = row[4:7]
    area = F(row[7])
    v_vec = row[8:11]
    emission = row[11:15]
    if ltype == 0:
        su = F(r1 * 2.0 - 1.0)
        sv = F(r2 * 2.0 - 1.0)
        pos = (position + u_vec * su + v_vec * sv).astype(F)
        normal = _n(np.cross(u_vec, v_vec).astype(F))
    else:
        z = F(1.0 - 2.0 * r1)
        rxy = F(np.sqrt(max(0.0, 1.0 - z * z)))
        phi = F(2.0 * PI * r2)
        normal = np.array([rxy * np.cos(phi), rxy * np.sin(phi), z], F)
        pos = (position + normal * v_vec[0]).astype(F)
    return {"pos": pos, "normal": normal,
            "pdf": F(1.0 / max(area, 1e-12)), "emission": emission,
            "area": area}


def _nee(view, rng, pos, ffn, wo, m, base):
    """Returns the shadow-tested NEE contribution (not throughput-scaled)."""
    if view.num_lights == 0:
        return np.zeros(3, F)
    r_pick = rng.rand()
    li = int(np.floor(r_pick * view.num_lights))
    if li >= view.num_lights:
        return np.zeros(3, F)
    r1 = rng.rand()
    r2 = rng.rand()
    ls = _sample_light(view.light[li], r1, r2)
    pdf_nee = F(ls["pdf"] / view.num_lights)
    to_light = _n(ls["pos"] - pos)
    p_bsdf = _eval_pdf(ffn, to_light, wo, m, base[:3])
    mis = F(pdf_nee / max(pdf_nee + p_bsdf, 1e-20))
    weight = F(mis / max(pdf_nee, 1e-20))

    off = (pos + ffn * F(1e-3)).astype(F)
    delta = (ls["pos"] - off).astype(F)
    dist = F(np.sqrt(np.dot(delta, delta)))
    ldir = (delta / max(dist, F(1e-12))).astype(F)
    ndl = max(_dot(ffn, ldir), F(0.0))
    ldn = max(_dot(-ldir, ls["normal"]), F(0.0))
    if ndl <= 0.0 or ldn <= 0.0:
        return np.zeros(3, F)
    if occluded(view.tri, off, ldir, T_MIN, F(max(dist * F(0.999), 0.0))):
        return np.zeros(3, F)
    f = _eval_bsdf(ffn, ldir, wo, m, base[:3])
    g = F(ndl * ldn / max(dist * dist, 1e-12))
    return (ls["emission"][:3] * ls["emission"][3] * f * (g * weight)
            ).astype(F)


# ----------------------------------------------------------- trace_path --
def trace_path_scalar(view, gb_lane, view_pos, seed):
    """Oracle for one lane of ops/path_trace.trace_path (no textures)."""
    if not gb_lane["valid"]:
        return np.zeros(3, F)
    rng = Rng(seed)
    pos = gb_lane["pos"].astype(F)
    ffn = gb_lane["normal"].astype(F)
    mid = int(gb_lane["mat_id"])
    m = _mat(view, mid)
    base = np.concatenate([gb_lane["albedo"].astype(F), [F(1.0)]])

    acc = np.zeros(3, F)
    thr = np.ones(3, F)
    wo = _n(view_pos.astype(F) - pos)

    acc = acc + m["emissive_factor"]
    if m["light_index"] >= 0:
        return acc

    is_glass_primary = m["transmission"] > 0.01
    is_spec0 = is_glass_primary or m["roughness"] < 0.05
    prev_diffuse = False
    if not is_spec0:
        acc = acc + _nee(view, rng, pos, ffn, wo, m, base) * thr
        prev_diffuse = True

    sc = _sample_bsdf(rng, wo, ffn, True, m, base)
    if (sc["weight"] <= 0.0).all():
        return acc
    last_pdf = sc["pdf"]
    thr = (thr * sc["weight"]).astype(F)
    nd = sc["wi"]

    for depth in range(1, MAX_DEPTH):
        if depth >= RR_START_DEPTH:
            r_rr = rng.rand()
            p = F(thr.max())
            survival = F(np.clip(p, 0.05, 0.95))
            if r_rr > survival:
                break
            thr = (thr / survival).astype(F)

        off = (F(np.sign(_dot(ffn, nd))) * ffn).astype(F)
        origin = (pos + off * F(1e-3)).astype(F)
        hit = intersect(view.tri, origin, nd, T_MIN, T_MAX)
        if hit is None:
            break
        h = _reconstruct(view, hit, origin, nd)
        wo = (-nd).astype(F)
        m = _mat(view, h["mat_id"])
        base = m["base_color"].copy()

        ffn = h["ffnormal"]
        pos = h["pos"]

        if m["light_index"] >= 0:
            lrow = view.light[max(m["light_index"], 0)]
            le = (lrow[11:14] * lrow[14]).astype(F)
            dist_sq = F(h["t"] * h["t"])
            lcos = max(_dot(ffn, -wo), F(0.0))
            p_nee = F((1.0 / max(lrow[7], 1e-12))
                      * (dist_sq / max(lcos, F(1e-12)))
                      * (1.0 / max(view.num_lights, 1)))
            mis = F(last_pdf / max(last_pdf + p_nee, 1e-20)) \
                if lcos > 1e-3 else F(0.0)
            if not prev_diffuse:
                mis = F(1.0)
            if h["front"]:
                acc = acc + le * mis * thr
            break

        is_spec_b = is_glass_primary or m["roughness"] < 0.05
        if not is_spec_b:
            acc = acc + _nee(view, rng, pos, ffn, wo, m, base) * thr
            prev_diffuse = True
        else:
            prev_diffuse = False

        sc = _sample_bsdf(rng, wo, ffn, h["front"], m, base)
        if (sc["weight"] <= 0.0).all():
            break
        thr = (thr * sc["weight"]).astype(F)
        last_pdf = sc["pdf"]
        nd = sc["wi"]
    return acc
