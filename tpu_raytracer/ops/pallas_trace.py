"""Pallas TPU intersector: chunk-culled blocked Moller-Trumbore.

Why not per-lane BVH walks: on TPU those need random gathers, and XLA
gathers cost ~4 ms per fetch at G-buffer sizes while Mosaic's
`dynamic_gather` spans one 128-lane vreg. Instead, triangles sit
VMEM-resident in BVH-DFS order (spatially tight 128-tri chunks,
scene/builder.py) and intersection is a blocked sweep:

  1. A cheap XLA pre-pass slab-tests every live ray against every chunk
     AABB and OR-reduces per 256-ray block into a compacted per-block
     chunk WORKLIST (block-frustum culling; dead blocks get an empty
     list - free lane compaction for terminated wavefronts).
  2. The kernel walks only its block's worklist; each step evaluates the
     MT determinants for a whole chunk group as ONE MXU feature matmul
     (the default "mxuf2" kernel: phi(ray) replicated to K=48 so the
     full 3-pass bf16 hi/lo product rides a single dot - MXU cost is
     K-invariant up to 128, scripts/ucb_kdepth.py - and 2 chunks ride
     the dot's N dimension), then does sign-aware window tests +
     argmin-t on the VPU. Zero divergence, zero in-kernel gathers;
     winner attributes (exact t/u/v/front) are recomputed OUTSIDE the
     kernel from one wide tri_table row (ops/hit.py), so the sweep
     carries no selection machinery.

Replaces hardware `ray_query` (gbuffer.wgsl:108, restir.wgsl:601) for the
default scene sizes; the unified-stream BVH (ops/traversal.py) remains the
large-scene path and the refit structure for TLAS-style updates.

Layout: triangles packed as 4 planes of shape [3, Tp]: v0, e1, e2 plus a
validity row (padding kills phantom hits); chunk AABBs [Tp/CT, 8]; rays
[8, R] (o.xyz, d.xyz, t_min, t_max).
"""

from __future__ import annotations

import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 3.0e38

# Rays per block (= grid programs = rp/BR). Profiler: each program
# carries ~10 us of fixed cost (DMA waits + sub-128-lane feat
# relayouts), so a 262k-ray sweep pays a ~10 ms floor at BR=256 even
# with every lane dead; fatter blocks amortize it. VMEM bound: the
# [BR, 4*CT*grp] f32 window-test intermediates.
BR = int(os.environ.get("TPU_RT_BR", "1024"))
CT = 128      # triangles per inner chunk (lane-major) = cull granularity


def _mxus_grp() -> int:
    """Streamed-kernel group width, VMEM-bounded: the [BR, 4*CT*grp] f32
    product must stay <= the ~8.4 MB validated at (BR=512, grp=8); at
    BR=1024 that means grp=4, at 2048 grp=2 (a 16.8 MB product faults
    the kernel)."""
    return max(1, (512 * 8) // BR)


# Measured streamed-route block size (r5 step 19b): BR=2048 halves the
# streamed kernel's group width through the VMEM envelope and config 6
# dropped 0.70 -> 0.506 fps; the VMEM-resident path's tuned BR=2048 is
# NOT the streamed path's optimum.
STREAM_BR_CAP = 1024
# chunk count above which a VMEM-resident scene counts as DENSE (the
# same threshold the kernel auto-group uses for wide dots); dense
# scenes need the group width BR=2048 takes away - measured: config 3
# (bunny, 121 chunks) 1.36 -> 1.26 fps, config 6 (streamed knot)
# 0.342 -> 0.233 under the headline-tuned BR=2048.
DENSE_CHUNKS = 48


def maybe_cap_stream_br(tp: int, instanced: bool = False) -> None:
    """Workload-aware block-size guard - call BEFORE the first trace of a
    scene (the app and bench do, after scene build).

    If the scene is DENSE - beyond VMEM residency (streamed route), or
    VMEM-resident with more chunks than the wide-dot threshold - and the
    current block size came from TUNED.json (not an explicit user env -
    utils/tuned.APPLIED distinguishes), cap it at the dense-scene
    measured optimum. Safe pre-trace only: kernels resolve the BR global
    at trace time, and ray padding uses the same global, so later traces
    key on different shapes.
    """
    global BR
    # instanced scenes: the per-instance object-space sweep has the same
    # wide-dot economics regardless of the (small) object table - the
    # gallery measured 0.461 fps at BR1024 defaults vs 0.326 under the
    # tuned BR=2048 (r5 step 18c)
    if (tp // CT <= DENSE_CHUNKS and not instanced) or BR <= STREAM_BR_CAP:
        return
    from ..utils import tuned
    if "TPU_RT_BR" not in tuned.APPLIED:
        return          # user explicitly chose this BR - respect it
    print(f"tpu_raytracer: dense scene ({tp} tri slots): capping tuned "
          f"block size {BR} -> {STREAM_BR_CAP} (measured: configs 3/6 "
          "regress at BR=2048; PERF.md r5)", file=sys.stderr)
    BR = STREAM_BR_CAP


_VMEM_CAP_WARNED: set = set()


def _vmem_cap_mode(mode: str) -> str:
    """Clamp a grouped mode's width to the VMEM fault envelope.

    PERF.md r3: a 16.8 MB [BR, 4*CT*grp] f32 window product FAULTS the
    kernel, and a fault can wedge the axon tunnel for HOURS; 8.4 MB
    (BR=512, grp=8) is the validated ceiling, so the safe width is
    `_mxus_grp()`. Kernels that carry 3x [BR, CT] f32 selection scratch
    on top (mxuv; mxus under TPU_RT_MXUS_V=1) get HALF that width, and
    mxuv past BR=2048 downgrades to the scratch-free fused kernel.
    Explicitly-requested modes (TPU_RT_KERNEL / ucb scripts) pass through
    here too - a mis-sized A/B request must degrade, never fault."""
    if mode != "vpu" and BR > 512 * 8:
        # grp=1 already overflows: no width left to clamp - refuse loudly
        # (every MXU mode materializes at least a [BR, 4*CT] product)
        raise ValueError(
            f"TPU_RT_BR={BR}: even a grp=1 [BR, {4 * CT}] window product"
            f" exceeds the 8.4 MB VMEM fault envelope; use TPU_RT_BR <= "
            f"{512 * 8} (or TPU_RT_KERNEL=vpu)")
    base_cap = _mxus_grp()
    if mode.startswith("mxuv"):
        cap = base_cap // 2
        if cap < 1:       # even grp=1's scratch overflows: drop the scratch
            capped = f"mxuf{base_cap}"
        else:
            capped = mode if _mode_grp(mode) <= cap else f"mxuv{cap}"
    elif mode.startswith(("mxuf", "mxuw", "any")):
        pre = "any" if mode.startswith("any") else mode[:4]
        capped = mode if _mode_grp(mode) <= base_cap else f"{pre}{base_cap}"
    elif mode.startswith("mxus"):
        cap = (max(1, base_cap // 2)
               if os.environ.get("TPU_RT_MXUS_V", "0") == "1" else base_cap)
        # past grp=1 the matrix-best scratch itself can still overflow;
        # _run_kernel drops matrix_best via _mxus_matrix_best_ok then
        capped = mode if _mode_grp(mode) <= cap else f"mxus{cap}"
    else:
        return mode
    if capped == mode:
        return mode
    if mode not in _VMEM_CAP_WARNED:
        _VMEM_CAP_WARNED.add(mode)
        print(f"tpu_raytracer: kernel mode {mode!r} exceeds the VMEM "
              f"fault envelope at BR={BR}; clamped to {capped!r}",
              file=sys.stderr)
    return capped


def _mxus_matrix_best_ok(grp: int) -> bool:
    """Whether the streamed kernel may keep its matrix-best selection
    (TPU_RT_MXUS_V): it adds 3x [BR, CT] f32 scratch ON TOP of the
    [BR, 4*CT*grp] window product, and past grp=1 width clamping can't
    shrink the scratch - so the pair must fit the 8.4 MB envelope or
    matrix-best degrades to the argmin selection (results identical)."""
    return BR * CT * 4 * (4 * grp + 3) <= 512 * 8 * 4 * CT * 4


_MT_EPS = 1e-9

# Intersector kernel variant:
#   "mxufN" - the 3-pass bf16 split FUSED into one K=48 dot
#            ([f_hi|f_hi|f_lo] @ [c_hi;c_lo;c_hi] - MXU cost is
#            K-invariant up to 128, scripts/ucb_kdepth.py, so one K=48
#            dot costs a third of three K=16 dots), N chunks swept per
#            loop step along the dot's N dimension (worklists cull at
#            N-chunk granularity).
#   "mxu3" - one K=16 dot per chunk, 3-pass bf16 split (~2^-16 relative
#            error in the window tests; the winner's t/u/v are recomputed
#            exactly in ops/hit.py) (6.1 vs 4.6 Mrays/s base).
#   "mxuwN" - N chunks packed BLOCK-DIAGONALLY into one K=16N dot.
#            Strictly dominated by mxufN (the shared-feature dot never
#            needed the diagonal expansion) - kept for the A/B record.
#   "mxu1" - single bf16 pass. BROKEN for rendering: ~2^-8 t-window error
#            leaks contact shadows (18 dB vs exact; scripts/ucb_quality).
#            Kept for experiments only.
#   "vpu"  - the original all-VPU elementwise sweep (exact f32).
KERNEL_MODE = os.environ.get("TPU_RT_KERNEL", "mxuf2")


def _interpret() -> bool:
    """TPU compiles via Mosaic; other backends run the Pallas interpreter.

    TPU_RT_LOWER_MOSAIC=1 forces interpret=False so a CPU host can
    cross-LOWER every kernel for platform "tpu" (AOT `.lower()`), which
    runs Mosaic's full MLIR verification without a chip —
    tests/test_mosaic_lowering.py catches toolchain regressions (e.g.
    jax 0.9 rejecting f32 tpu.iota) off-chip. EXECUTING on CPU with it
    set would fail; it is a lowering-only switch.
    """
    if os.environ.get("TPU_RT_LOWER_MOSAIC", "0") == "1":
        return False
    return jax.default_backend() != "tpu"

GROUP = 8                      # chunks per K=128 block-diagonal dot
# coef VMEM for mxuw is 256 B/tri; stay well inside the 16 MB VMEM
MXUW_MAX_TP = 48 * 1024
# mxuf coef48 is 384 B/tri bf16; mxu3/mxu1 coef is 256 B/tri f32
MXUF_MAX_TP = 32 * 1024
MXU_MAX_TP = 48 * 1024


def _mode_grp(mode: str) -> int:
    """Chunks swept per loop step for grouped modes (mxufN/mxuwN/anyN)."""
    if mode.startswith("mxuf") or mode.startswith("mxuw") \
            or mode.startswith("mxus") or mode.startswith("mxuv"):
        return int(mode[4:]) if len(mode) > 4 else GROUP
    if mode.startswith("any"):
        return int(mode[3:]) if len(mode) > 3 else 2
    return 1


def pack_triangles(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray):
    """Host-side packing to the kernel layout.

    Returns (tri_planes [4, 3, Tp], chunk_aabb [Tp/CT, 8], Tp).
    Plane 3 row 0 is the validity mask (1.0 real, 0.0 padding).
    """
    t = v0.shape[0]
    tp = max(((t + CT - 1) // CT) * CT, CT)
    planes = np.zeros((4, 3, tp), np.float32)
    planes[0, :, :t] = v0.T
    planes[1, :, :t] = e1.T
    planes[2, :, :t] = e2.T
    planes[3, 0, :t] = 1.0

    # per-chunk world AABBs (BVH-DFS triangle order makes chunks spatially
    # tight) driving the per-block worklist cull.
    nc = tp // CT
    aabb = np.zeros((nc, 8), np.float32)
    v1 = v0 + e1
    v2 = v0 + e2
    mn = np.minimum(np.minimum(v0, v1), v2)
    mx = np.maximum(np.maximum(v0, v1), v2)
    for c in range(nc):
        lo = c * CT
        hi = min((c + 1) * CT, t)
        if lo < hi:
            aabb[c, 0:3] = mn[lo:hi].min(axis=0)
            aabb[c, 3:6] = mx[lo:hi].max(axis=0)
        else:
            aabb[c, 0:3] = INF
            aabb[c, 3:6] = -INF
    return planes, aabb, tp


def mt_coef_device(tri_planes, wide: bool = False, group: int = GROUP):
    """[4,3,Tp] planes -> Moller-Trumbore feature-matmul coefficients
    (jnp; cheap enough to rebuild per trace, so refit / LBVH-reorder
    paths need no extra bookkeeping).

    det/u_num/v_num/t_num are linear in the 16-dim ray feature vector
    phi = [o_i d_j (9), d (3), o (3), 1]:
        det   =  d . (e2 x e1)
        u_num =  det3(o,d,e2) + d . (v0 x e2)       (= u * det)
        v_num = -det3(o,d,e1) - d . (v0 x e1)       (= v * det)
        t_num =  o . n - v0 . n,  n = e1 x e2       (= t * det)
    Padding triangles are all-zero -> det == 0 -> can never hit.

    wide=False ("mxu3"): [16, NC*4*CT]; chunk c occupies columns
    [c*4CT, (c+1)*4CT) as [det|u|v|t] blocks of CT each.
    wide=True ("mxuw*"): [16, NG*4*group*CT] grouped by `group` chunks;
    group g occupies a [det|u|v|t]-major block of 4*group*CT columns,
    each quantity chunk-major - the kernel expands rows 16 -> 16*group
    block-diagonally so one dot covers all `group` chunks.
    """
    tp = tri_planes.shape[2]
    nc = tp // CT
    v0 = tri_planes[0].T                               # [Tp, 3]
    e1 = tri_planes[1].T
    e2 = tri_planes[2].T
    n = jnp.cross(e1, e2)
    z = jnp.zeros((tp,), jnp.float32)
    one = jnp.ones((tp,), jnp.float32)

    def skew(e):
        # S[f] with f = 3*i + j: o_i d_j S_f = det3(o, d, e)
        return [z, e[:, 2], -e[:, 1],
                -e[:, 2], z, e[:, 0],
                e[:, 1], -e[:, 0], z]

    c_det = [z] * 9 + [c for c in jnp.cross(e2, e1).T] + [z] * 3 + [z]
    v0xe2 = jnp.cross(v0, e2)
    c_u = skew(e2) + [v0xe2[:, 0], v0xe2[:, 1], v0xe2[:, 2]] + [z] * 3 + [z]
    v0xe1 = jnp.cross(v0, e1)
    c_v = ([-s for s in skew(e1)]
           + [-v0xe1[:, 0], -v0xe1[:, 1], -v0xe1[:, 2]] + [z] * 3 + [z])
    c_t = ([z] * 12 + [n[:, 0], n[:, 1], n[:, 2]]
           + [-jnp.sum(v0 * n, axis=1)])
    coef = jnp.stack(
        [jnp.stack(cols, axis=1) for cols in (c_det, c_u, c_v, c_t)],
        axis=2)                                        # [Tp, 16, 4]
    if not wide:
        coef = coef.reshape(nc, CT, 16, 4).transpose(2, 0, 3, 1)
        return coef.reshape(16, nc * 4 * CT)           # [16, NC*4*CT]
    ng = (nc + group - 1) // group
    pad = ng * group * CT - tp
    if pad:
        coef = jnp.concatenate(
            [coef, jnp.zeros((pad, 16, 4), jnp.float32)], axis=0)
    coef = coef.reshape(ng, group, CT, 16, 4)
    coef = coef.transpose(3, 0, 4, 1, 2)               # [16,NG,4,group,CT]
    return coef.reshape(16, ng * 4 * group * CT)


def default_coef_grp(tp: int) -> int:
    """Group width the trace-time mode selection will use for a tp-column
    scene under the current KERNEL_MODE - so builders can precompute
    `mt_coef48(planes, grp)` ONCE (CompiledScene.coef48) instead of XLA
    re-running the bf16 conversion inside every bounce-loop body.
    Returns 0 when the active kernel doesn't consume coef48."""
    mode = KERNEL_MODE
    nc = tp // CT
    if mode in ("mxuf2", "mxuv2") and nc > 48:
        # mirror trace_brute_pallas's auto-upgrade (mxuv halves the
        # width for its [BR, CT] scratch)
        auto = (max(2, min(8, _mxus_grp())) if mode == "mxuf2"
                else max(2, _mxus_grp() // 2))
        mode = f"{mode[:4]}{auto}"
    if (mode.startswith("mxuf") or mode.startswith("mxuv")
            or mode.startswith("any")) and tp > MXUF_MAX_TP:
        mode = f"mxus{_mxus_grp()}"
    if not (mode.startswith("mxuf") or mode.startswith("mxus")
            or mode.startswith("mxuv")):
        return 0
    return _mode_grp(_vmem_cap_mode(mode))


def _mxuw_mask(group: int = GROUP):
    """[16*group, 4*group*CT] block-diagonal selector: row band
    16j..16j+16 is live only over chunk j's columns (each quantity block
    is chunk-major)."""
    cols = 4 * group * CT
    r = np.arange(16 * group)[:, None] // 16
    j = (np.arange(cols)[None, :] % (group * CT)) // CT
    return jnp.asarray((r == j).astype(np.float32))


def mt_coef48(tri_planes, group: int = 1):
    """[4,3,Tp] planes -> fused 3-pass coefficients [48, NG*group*4*CT]
    bf16: rows [c_hi; c_lo; c_hi] so ONE K=48 dot against
    [f_hi | f_hi | f_lo] accumulates the full bf16x3 product in f32.
    Chunk count padded up to a multiple of `group` (zero coef = det 0 =
    never hits)."""
    coef = mt_coef_device(tri_planes)                  # [16, NC*4CT] f32
    nc = coef.shape[1] // (4 * CT)
    ng = (nc + group - 1) // group
    pad = (ng * group - nc) * 4 * CT
    if pad:
        coef = jnp.concatenate(
            [coef, jnp.zeros((16, pad), jnp.float32)], axis=1)
    hi, lo = _split_bf16(coef)
    return jnp.concatenate([hi, lo, hi], axis=0)       # [48, NG*grp*4CT]


def _feat48_from(ox, oy, oz, dx, dy, dz):
    """Ray components [BR] -> fused bf16 feature matrix [48, BR] =
    [f_hi ; f_hi ; f_lo] stacked along the MAJOR (sublane) dim - every
    row is a full-lane [BR] vector, so the stack/split/concat are cheap
    sublane writes. (The earlier [BR, 48] minor-dim layout cost ~3.3 ms
    per 262k-ray call in Mosaic relayouts - BR-invariant, i.e. per
    element - and dominated dead sweeps; PERF.md.) Pairs with
    mt_coef48's row blocks via a dim-0 contraction in `_dot48`."""
    one = jnp.ones_like(ox)
    feat = jnp.stack([
        ox * dx, ox * dy, ox * dz,
        oy * dx, oy * dy, oy * dz,
        oz * dx, oz * dy, oz * dz,
        dx, dy, dz, ox, oy, oz, one,
    ], axis=0)                                        # [16, BR]
    f_hi, f_lo = _split_bf16_kernel(feat)
    return jnp.concatenate([f_hi, f_hi, f_lo], axis=0)


def _feat48(rays):
    return _feat48_from(rays[0], rays[1], rays[2],
                        rays[3], rays[4], rays[5])


def _dot48(feat_t, coef):
    """[48, BR] x [48, N] -> [BR, N] (contract dim 0 of both)."""
    return jax.lax.dot_general(
        feat_t, coef, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)


def _mt_kernel_mxuf(count_ref, list_ref, entry_ref, rays_ref, coef_ref,
                    t_ref, idx_ref, done_ref, *, num_groups, any_hit,
                    use_worklist=True, grp=2, early=True):
    """Fused-pass MXU MT sweep: the whole 3-pass bf16 product is ONE
    K=48 dot per group of `grp` chunks (columns are chunk-major, so the
    shared ray features need no block-diagonal expansion - unlike
    `_mt_kernel_mxuw` the extra chunks ride the dot's N dimension).

    Front-to-back EARLY TERMINATION: the worklist arrives sorted by the
    block's conservative chunk entry distance (entry_ref); once every
    live lane's best t is closer than the next unit's entry, no
    remaining unit can improve any lane and the rest of the sweep
    collapses to a scalar branch (classic ordered-BVH economics without
    per-ray pointer walks). Dead lanes (t_max <= 0) start at t_best = 0
    so they never block termination; miss lanes legitimately hold INF
    and force a full sweep of their block's list.
    """
    rays = rays_ref[:]
    t_min = rays[6][:, None]
    t_max = rays[7][:, None]

    b = pl.program_id(0)
    n_live = count_ref[b] if use_worklist else num_groups
    cols = grp * 4 * CT

    def make_sweep(feat):
        def sweep_group(g, t_best, idx_best):
            prod = _dot48(feat, coef_ref[:, pl.ds(g * cols, cols)])
            for k in range(grp):             # unrolled: VPU tests per chunk
                o = k * 4 * CT
                det = prod[:, o:o + CT]
                u_n = prod[:, o + CT:o + 2 * CT]
                v_n = prod[:, o + 2 * CT:o + 3 * CT]
                t_n = prod[:, o + 3 * CT:o + 4 * CT]
                sgn = jnp.where(det >= 0.0, 1.0, -1.0)
                d_abs = det * sgn
                ok = d_abs > _MT_EPS
                u2 = u_n * sgn
                v2 = v_n * sgn
                t_val = (t_n * sgn) / jnp.where(ok, d_abs, 1.0)
                hit = (ok & (u2 >= 0.0) & (v2 >= 0.0) & (u2 + v2 <= d_abs)
                       & (t_val > t_min) & (t_val < t_max)
                       & (t_val < t_best[:, None]))
                t_cand = jnp.where(hit, t_val, INF)
                best_lane = jnp.argmin(t_cand, axis=1)
                t_new = jnp.min(t_cand, axis=1)
                improved = t_new < t_best
                t_best = jnp.where(improved, t_new, t_best)
                idx_best = jnp.where(improved,
                                     (g * grp + k) * CT + best_lane, idx_best)
            return t_best, idx_best
        return sweep_group

    if not early:
        # small scenes: plain carry loop (no ref round-trips, no flag).
        # DEAD-BLOCK SKIP: fully-terminated wavefront blocks (empty
        # worklist) pay only the init writes - the feature build /
        # bf16 splits are gated behind n_live > 0 so a mostly-dead
        # late-bounce sweep costs DMA + init, not per-element work.
        t_ref[0, :] = jnp.full((BR,), INF, jnp.float32)
        idx_ref[0, :] = jnp.full((BR,), -1, jnp.int32)

        @pl.when(n_live > 0)
        def _():
            sweep_group = make_sweep(_feat48(rays))

            def group(i, carry):
                g = list_ref[i, b] if use_worklist else i
                return sweep_group(g, *carry)

            init = (jnp.full((BR,), INF, jnp.float32),
                    jnp.full((BR,), -1, jnp.int32))
            t_best, idx_best = jax.lax.fori_loop(0, n_live, group, init)
            t_ref[0, :] = t_best
            idx_ref[0, :] = idx_best
        return

    live0 = rays[7] > 0.0
    t_ref[0, :] = jnp.where(live0, INF, 0.0)
    idx_ref[0, :] = jnp.full((BR,), -1, jnp.int32)
    done_ref[0] = jnp.int32(0)

    @pl.when(n_live > 0)
    def _():
        sweep_group = make_sweep(_feat48(rays))

        def group(i, carry):
            @pl.when(done_ref[0] == 0)
            def _():
                t_best, idx_best = sweep_group(
                    list_ref[i, b], t_ref[0, :], idx_ref[0, :])
                t_ref[0, :] = t_best
                idx_ref[0, :] = idx_best
                nxt = entry_ref[jnp.minimum(i + 1, num_groups - 1), b]
                done_ref[0] = (jnp.max(t_best) < nxt).astype(jnp.int32)
            return carry

        jax.lax.fori_loop(0, n_live, group, jnp.int32(0))


def _mt_kernel_mxuv(count_ref, list_ref, entry_ref, rays_ref, coef_ref,
                    t_ref, idx_ref, tn_ref, d_ref, idm_ref, done_ref, *,
                    num_groups, use_worklist=True, grp=2, early=True):
    """Selection-free fused-pass MXU sweep ("mxuv"): same K=48 dot as
    `_mt_kernel_mxuf`, but the per-chunk winner selection is gone.

    Two VPU savings per chunk vs mxuf:
      * NO per-chunk cross-lane argmin/min reduction - the running best
        lives as a [BR, CT] matrix (column j = triangle slot j of
        whichever chunk last won it); ONE argmin runs after the sweep.
      * NO per-element division - t never materializes in the loop; the
        "closer" test cross-multiplies numerator/denominator pairs
        (t_a < t_b  <=>  tn_a*d_b < tn_b*d_a, all denominators positive
        by the sign-fold), exactly the trick the any-hit kernel plays
        on its window bounds. One [BR, CT] division runs at finalize.

    The winner's exact t/u/v are recomputed outside the kernel
    (ops/hit.py) as with every mxu* mode, so the pair representation
    only has to ORDER candidates correctly to f32 rounding.

    Tie semantics: exact-t ties between triangles in DIFFERENT columns
    of the running best resolve to the lowest global id (the finalize
    min-reduction). Ties in the SAME column (ids congruent mod CT,
    i.e. the same slot of different chunks) keep the first-swept
    candidate - the update compare is strict - so they resolve by
    worklist order exactly like mxuf's cross-chunk ties
    (ops/compaction.py note). No RNG-order consequences either way.

    Front-to-back early termination (entry-sorted worklists) keeps the
    mxuf economics: lane termination = exists column with
    tn < next_entry * d (one mult + compare, division-free).
    """
    rays = rays_ref[:]
    t_min = rays[6][:, None]
    t_max = rays[7][:, None]

    b = pl.program_id(0)
    n_live = count_ref[b] if use_worklist else num_groups
    cols = grp * 4 * CT

    # dead lanes (t_max <= 0): tn = -INF so the termination test always
    # passes for them and no candidate ever compares closer (hit is
    # false anyway - their t window is empty). Live lanes start at
    # tn/d = INF/1. (f32 broadcasts throughout - Mosaic rejects bool
    # minor-dim broadcasts; ids ride f32, exact below 2^24.)
    sgn_live = jnp.where(rays[7] > 0.0, 1.0, -1.0)         # [BR]
    tn_ref[:, :] = jnp.broadcast_to((sgn_live * INF)[:, None], (BR, CT))
    d_ref[:, :] = jnp.ones((BR, CT), jnp.float32)
    idm_ref[:, :] = jnp.full((BR, CT), -1.0, jnp.float32)
    t_ref[0, :] = jnp.where(sgn_live > 0.0, INF, 0.0)
    idx_ref[0, :] = jnp.full((BR,), -1, jnp.int32)
    if early:
        done_ref[0] = jnp.int32(0)

    # int iota + convert: Mosaic (jax>=0.9) verifies tpu.iota as
    # integer-only; a direct f32 broadcasted_iota fails lowering.
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (BR, CT), 1).astype(
        jnp.float32)

    @pl.when(n_live > 0)
    def _():
        feat = _feat48(rays)

        def sweep_group(g):
            prod = _dot48(feat, coef_ref[:, pl.ds(g * cols, cols)])
            for k in range(grp):             # unrolled: VPU tests per chunk
                o = k * 4 * CT
                det = prod[:, o:o + CT]
                u_n = prod[:, o + CT:o + 2 * CT]
                v_n = prod[:, o + 2 * CT:o + 3 * CT]
                t_n = prod[:, o + 3 * CT:o + 4 * CT]
                sgn = jnp.where(det >= 0.0, 1.0, -1.0)
                d_abs = det * sgn
                ok = d_abs > _MT_EPS
                u2 = u_n * sgn
                v2 = v_n * sgn
                tn2 = t_n * sgn
                hit = (ok & (u2 >= 0.0) & (v2 >= 0.0) & (u2 + v2 <= d_abs)
                       & (tn2 > t_min * d_abs) & (tn2 < t_max * d_abs))
                tb = tn_ref[:, :]
                db = d_ref[:, :]
                improved = hit & (tn2 * db < tb * d_abs)
                gid = ((g * grp + k) * CT).astype(jnp.float32) + col_iota
                tn_ref[:, :] = jnp.where(improved, tn2, tb)
                d_ref[:, :] = jnp.where(improved, d_abs, db)
                idm_ref[:, :] = jnp.where(improved, gid, idm_ref[:, :])

        if early:
            def group(i, carry):
                @pl.when(done_ref[0] == 0)
                def _():
                    sweep_group(list_ref[i, b])
                    nxt = entry_ref[jnp.minimum(i + 1, num_groups - 1), b]
                    okm = tn_ref[:, :] < nxt * d_ref[:, :]
                    ray_ok = jnp.max(jnp.where(okm, 1.0, 0.0), axis=1)
                    done_ref[0] = (jnp.min(ray_ok) > 0.0).astype(jnp.int32)
                return carry

            jax.lax.fori_loop(0, n_live, group, jnp.int32(0))
        else:
            def group(i, carry):
                sweep_group(list_ref[i, b] if use_worklist else i)
                return carry

            jax.lax.fori_loop(0, n_live, group, jnp.int32(0))

        # finalize: ONE division + TWO cross-lane min-reductions per
        # block (no argmin / no integer minor-dim broadcasts - only
        # f32 ops with proven Mosaic lowerings)
        idm = idm_ref[:, :]
        t_mat = jnp.where(idm < 0.0, INF, tn_ref[:, :] / d_ref[:, :])
        t_best = jnp.min(t_mat, axis=1)
        win = t_mat <= t_best[:, None]
        idx_f = jnp.min(jnp.where(win, idm, INF), axis=1)
        have = t_best < INF
        t_ref[0, :] = jnp.where(have, t_best, t_ref[0, :])
        idx_ref[0, :] = jnp.where(have, idx_f, -1.0).astype(jnp.int32)


def _mt_kernel_any(count_ref, list_ref, entry_ref, rays_ref, coef_ref,
                   t_ref, idx_ref, done_ref, *, num_groups,
                   use_worklist=True, grp=2, early=True):
    """Any-hit (occlusion) sweep (restir.wgsl:375-381, flag 0x4
    terminate-on-first-hit economics): division-free window tests, no
    argmin-t / winner selection - an occlusion query only needs a
    per-lane hit flag, so the whole selection half of the closest-hit
    kernel disappears. The worklist arrives front-to-back sorted, so
    near occluders are found first; once every live lane is occluded
    the remaining units collapse to a scalar branch.

    Outputs: idx = 1 where occluded else -1; t = t_max (unused).
    """
    rays = rays_ref[:]
    t_min = rays[6][:, None]
    t_max = rays[7][:, None]
    inactive = jnp.where(rays[7] <= 0.0, 1.0, 0.0)     # [BR]

    b = pl.program_id(0)
    n_live = count_ref[b] if use_worklist else num_groups
    cols = grp * 4 * CT

    t_ref[0, :] = rays[7]

    def make_sweep(feat):
        def sweep_group(g, acc_mat):
            """Accumulates hits ELEMENTWISE into a [BR, CT] f32 matrix -
            the per-chunk cross-lane max-reduce of the earlier version
            cost ~7 vreg ops per chunk; one elementwise max costs 1.
            Callers reduce once (per unit for the early flag, per block
            otherwise)."""
            prod = _dot48(feat, coef_ref[:, pl.ds(g * cols, cols)])
            for k in range(grp):
                o = k * 4 * CT
                det = prod[:, o:o + CT]
                u_n = prod[:, o + CT:o + 2 * CT]
                v_n = prod[:, o + 2 * CT:o + 3 * CT]
                t_n = prod[:, o + 3 * CT:o + 4 * CT]
                sgn = jnp.where(det >= 0.0, 1.0, -1.0)
                d_abs = det * sgn
                ok = d_abs > _MT_EPS
                u2 = u_n * sgn
                v2 = v_n * sgn
                tn2 = t_n * sgn
                hit = (ok & (u2 >= 0.0) & (v2 >= 0.0) & (u2 + v2 <= d_abs)
                       & (tn2 > t_min * d_abs) & (tn2 < t_max * d_abs))
                acc_mat = jnp.maximum(acc_mat, jnp.where(hit, 1.0, 0.0))
            return acc_mat
        return sweep_group

    idx_ref[0, :] = jnp.full((BR,), -1, jnp.int32)

    if not early:
        # dead-block skip: empty-worklist blocks pay init only
        @pl.when(n_live > 0)
        def _():
            sweep_group = make_sweep(_feat48(rays))

            def body(i, acc_mat):
                g = list_ref[i, b] if use_worklist else i
                return sweep_group(g, acc_mat)

            acc_mat = jax.lax.fori_loop(
                0, n_live, body, jnp.zeros((BR, CT), jnp.float32))
            hit_acc = jnp.max(acc_mat, axis=1)
            idx_ref[0, :] = jnp.where(hit_acc > 0.0, 1, -1).astype(jnp.int32)
        return

    done_ref[0] = jnp.int32(0)

    @pl.when(n_live > 0)
    def _():
        sweep_group = make_sweep(_feat48(rays))

        def body(i, carry):
            @pl.when(done_ref[0] == 0)
            def _():
                prev = jnp.where(idx_ref[0, :] > 0, 1.0, 0.0)
                seed = jnp.broadcast_to(prev[:, None], (BR, CT))
                g = list_ref[i, b] if use_worklist else i
                found = jnp.max(sweep_group(g, seed), axis=1)
                idx_ref[0, :] = jnp.where(
                    found > 0.0, 1, -1).astype(jnp.int32)
                all_done = jnp.min(jnp.maximum(found, inactive)) > 0.0
                done_ref[0] = all_done.astype(jnp.int32)
            return carry

        jax.lax.fori_loop(0, n_live, body, jnp.int32(0))


def _mt_kernel_mxui(rays_ref, aabb_ref, coef_ref, t_ref, idx_ref, *,
                    num_chunks, any_hit, grp=2):
    """Fused-pass MXU sweep with IN-KERNEL chunk culling: each chunk
    group is slab-tested against the block's rays ([BR] lanes, ~1/128th
    of the group's MT cost) and swept under a `pl.when` scalar guard.

    Replaces the XLA worklist prepass entirely for small scenes - the
    prepass glue (slab fusion + argsort + take_along_axis + SMEM
    worklists) costs ~3 ms per 524k-ray traversal call at 512^2, most of
    it NOT the tests themselves (PERF.md). No front-to-back ordering /
    early-out: reserved for the worklist path on dense scenes.

    aabb_ref: [NG, 8] group AABBs in SMEM (grp chunks unioned).
    """
    rays = rays_ref[:]
    t_min = rays[6][:, None]
    t_max = rays[7][:, None]
    feat = _feat48(rays)
    ox, oy, oz = rays[0], rays[1], rays[2]
    inv_x = 1.0 / _nonzero(rays[3])
    inv_y = 1.0 / _nonzero(rays[4])
    inv_z = 1.0 / _nonzero(rays[5])
    live = rays[7] > 0.0

    cols = grp * 4 * CT

    def slab_any(g):
        """Does ANY live lane's [t_min, t_max] segment cross group g's
        box? ([BR] VPU ops + one scalar reduce.)"""
        ax = (aabb_ref[g, 0] - ox) * inv_x
        bx = (aabb_ref[g, 3] - ox) * inv_x
        ay = (aabb_ref[g, 1] - oy) * inv_y
        by = (aabb_ref[g, 4] - oy) * inv_y
        az = (aabb_ref[g, 2] - oz) * inv_z
        bz = (aabb_ref[g, 5] - oz) * inv_z
        t_in = jnp.maximum(
            jnp.maximum(jnp.minimum(ax, bx), jnp.minimum(ay, by)),
            jnp.maximum(jnp.minimum(az, bz), rays[6]))
        t_out = jnp.minimum(
            jnp.minimum(jnp.maximum(ax, bx), jnp.maximum(ay, by)),
            jnp.minimum(jnp.maximum(az, bz), rays[7]))
        hit = (t_in <= t_out) & live
        return jnp.max(jnp.where(hit, 1.0, 0.0)) > 0.0

    def sweep(g, t_best, idx_best):
        prod = _dot48(feat, coef_ref[:, pl.ds(g * cols, cols)])
        for k in range(grp):
            o = k * 4 * CT
            det = prod[:, o:o + CT]
            u_n = prod[:, o + CT:o + 2 * CT]
            v_n = prod[:, o + 2 * CT:o + 3 * CT]
            t_n = prod[:, o + 3 * CT:o + 4 * CT]
            sgn = jnp.where(det >= 0.0, 1.0, -1.0)
            d_abs = det * sgn
            ok = d_abs > _MT_EPS
            u2 = u_n * sgn
            v2 = v_n * sgn
            if any_hit:
                tn2 = t_n * sgn
                hit = (ok & (u2 >= 0.0) & (v2 >= 0.0) & (u2 + v2 <= d_abs)
                       & (tn2 > t_min * d_abs) & (tn2 < t_max * d_abs))
                t_best = jnp.minimum(
                    t_best,
                    jnp.min(jnp.where(hit, 0.0, INF), axis=1))
                idx_best = jnp.where(t_best < INF, 1, idx_best)
            else:
                t_val = (t_n * sgn) / jnp.where(ok, d_abs, 1.0)
                hit = (ok & (u2 >= 0.0) & (v2 >= 0.0) & (u2 + v2 <= d_abs)
                       & (t_val > t_min) & (t_val < t_max)
                       & (t_val < t_best[:, None]))
                t_cand = jnp.where(hit, t_val, INF)
                best_lane = jnp.argmin(t_cand, axis=1)
                t_new = jnp.min(t_cand, axis=1)
                improved = t_new < t_best
                t_best = jnp.where(improved, t_new, t_best)
                idx_best = jnp.where(improved,
                                     (g * grp + k) * CT + best_lane,
                                     idx_best)
        return t_best, idx_best

    ng = (num_chunks + grp - 1) // grp
    t_ref[0, :] = jnp.full((BR,), INF, jnp.float32)
    idx_ref[0, :] = jnp.full((BR,), -1, jnp.int32)

    def body(i, carry):
        @pl.when(slab_any(i))
        def _():
            t_best, idx_best = sweep(i, t_ref[0, :], idx_ref[0, :])
            t_ref[0, :] = t_best
            idx_ref[0, :] = idx_best
        return carry

    jax.lax.fori_loop(0, ng, body, jnp.int32(0))


def _nonzero(d, eps=1e-12):
    return jnp.where(jnp.abs(d) < eps, jnp.where(d < 0, -eps, eps), d)


def _mt_kernel_mxus(count_ref, list_ref, entry_ref, rays_ref, coef_hbm,
                    t_ref, idx_ref, buf_ref, sem_ref, *scratch,
                    num_groups, any_hit, use_worklist=True, grp=8,
                    early=True, matrix_best=False):
    """HBM-STREAMED fused-pass sweep: the coef matrix stays in HBM and
    each worklist unit's [48, 4*grp*CT] slice is DMA'd into a VMEM
    double buffer one step ahead of the sweep - triangle capacity is no
    longer bounded by VMEM (the resident kernels cap at ~32k tris;
    DamagedHelmet-class glTFs are ~100k+). Worklist culling keeps the
    streamed bytes proportional to what each block actually sweeps.

    Front-to-back EARLY TERMINATION (worklists arrive entry-sorted):
    closest-hit stops once every live lane's best t beats the next
    unit's conservative entry distance; any-hit (restir.wgsl:375-381
    flag-0x4 economics) skips the argmin/division half entirely and
    stops once every live lane is occluded. Because unit i+1's prefetch
    is issued BEFORE unit i's sweep decides we are done, the terminating
    iteration itself drains that in-flight copy (wait on slot (i+1)%2)
    and sets the SMEM flag to 2 (0 = sweeping, 2 = terminated+drained).
    Never defer the drain to a later iteration: later iterations issue
    no copy of their own, so waiting any other slot there blocks on a
    never-signalled DMA semaphore and hangs the chip.

    matrix_best=True (closest-hit only; TPU_RT_MXUS_V=1): the per-chunk
    argmin/min + per-element division are replaced by the mxuv running
    [BR, CT] numerator/denominator best (see _mt_kernel_mxuv), reduced
    once per block - the DMA stream is untouched, only the VPU half of
    each unit shrinks.
    """
    if matrix_best:
        tn_ref, d_ref, idm_ref, done_ref = scratch
    else:
        (done_ref,) = scratch
    rays = rays_ref[:]
    t_min = rays[6][:, None]
    t_max = rays[7][:, None]
    live0 = rays[7] > 0.0
    inactive = jnp.where(rays[7] <= 0.0, 1.0, 0.0)     # [BR]

    b = pl.program_id(0)
    n_live = count_ref[b] if use_worklist else num_groups
    cols = grp * 4 * CT
    # the [48, BR] feature build and the matrix-best scratch splats are
    # per-element work a fully-dead block (n_live == 0) must NOT pay -
    # every branch below computes them under its pl.when(n_live > 0)
    # gate, like _mt_kernel_mxuf/_mt_kernel_any (dead-block skip)

    def start_copy(i, slot):
        g = list_ref[i, b] if use_worklist else i
        pltpu.make_async_copy(
            coef_hbm.at[:, pl.ds(g * cols, cols)],
            buf_ref.at[slot], sem_ref.at[slot]).start()

    def wait_copy(slot):
        pltpu.make_async_copy(
            buf_ref.at[slot], buf_ref.at[slot], sem_ref.at[slot]).wait()

    if any_hit:
        t_ref[0, :] = rays[7]
        idx_ref[0, :] = jnp.full((BR,), -1, jnp.int32)
    else:
        # dead lanes (t_max <= 0) start at t_best = 0 so they never block
        # the front-to-back termination check
        t_ref[0, :] = jnp.where(live0, INF, 0.0)
        idx_ref[0, :] = jnp.full((BR,), -1, jnp.int32)
    done_ref[0] = jnp.int32(0)

    def init_mat():
        # see _mt_kernel_mxuv: dead lanes at tn = -INF (always "done",
        # never improved); live lanes at tn/d = INF/1
        sgn_live = jnp.where(rays[7] > 0.0, 1.0, -1.0)
        tn_ref[:, :] = jnp.broadcast_to((sgn_live * INF)[:, None], (BR, CT))
        d_ref[:, :] = jnp.ones((BR, CT), jnp.float32)
        idm_ref[:, :] = jnp.full((BR, CT), -1.0, jnp.float32)

    @pl.when(n_live > 0)
    def _():
        start_copy(0, 0)

    # int iota + convert (Mosaic jax>=0.9 rejects f32 iota; see mxuv)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (BR, CT), 1).astype(
        jnp.float32)

    def sweep_cols_mat(prod, g):
        for k in range(grp):
            o = k * 4 * CT
            det = prod[:, o:o + CT]
            u_n = prod[:, o + CT:o + 2 * CT]
            v_n = prod[:, o + 2 * CT:o + 3 * CT]
            t_n = prod[:, o + 3 * CT:o + 4 * CT]
            sgn = jnp.where(det >= 0.0, 1.0, -1.0)
            d_abs = det * sgn
            ok = d_abs > _MT_EPS
            u2 = u_n * sgn
            v2 = v_n * sgn
            tn2 = t_n * sgn
            hit = (ok & (u2 >= 0.0) & (v2 >= 0.0) & (u2 + v2 <= d_abs)
                   & (tn2 > t_min * d_abs) & (tn2 < t_max * d_abs))
            tb = tn_ref[:, :]
            db = d_ref[:, :]
            improved = hit & (tn2 * db < tb * d_abs)
            gid = ((g * grp + k) * CT).astype(jnp.float32) + col_iota
            tn_ref[:, :] = jnp.where(improved, tn2, tb)
            d_ref[:, :] = jnp.where(improved, d_abs, db)
            idm_ref[:, :] = jnp.where(improved, gid, idm_ref[:, :])

    def finalize_mat():
        idm = idm_ref[:, :]
        t_mat = jnp.where(idm < 0.0, INF, tn_ref[:, :] / d_ref[:, :])
        t_best = jnp.min(t_mat, axis=1)
        win = t_mat <= t_best[:, None]
        idx_f = jnp.min(jnp.where(win, idm, INF), axis=1)
        have = t_best < INF
        t_ref[0, :] = jnp.where(have, t_best, t_ref[0, :])
        idx_ref[0, :] = jnp.where(have, idx_f, -1.0).astype(jnp.int32)

    if matrix_best and not any_hit and not early:
        @pl.when(n_live > 0)
        def _():
            feat = _feat48(rays)
            init_mat()

            def group_m(i, carry):
                @pl.when(i + 1 < n_live)
                def _():
                    start_copy(i + 1, (i + 1) % 2)

                wait_copy(i % 2)
                g = list_ref[i, b] if use_worklist else i
                sweep_cols_mat(_dot48(feat, buf_ref[i % 2]), g)
                return carry

            jax.lax.fori_loop(0, n_live, group_m, jnp.int32(0))
            finalize_mat()
        return

    def sweep_cols(prod, g, t_best, idx_best, hit_acc):
        """ONE shared MT window-test block for the carry loop AND the
        early-termination loop (any_hit is a static python branch, so
        each kernel instance traces exactly one side; the unused
        operands of the other side are dead at trace time)."""
        for k in range(grp):
            o = k * 4 * CT
            det = prod[:, o:o + CT]
            u_n = prod[:, o + CT:o + 2 * CT]
            v_n = prod[:, o + 2 * CT:o + 3 * CT]
            t_n = prod[:, o + 3 * CT:o + 4 * CT]
            sgn = jnp.where(det >= 0.0, 1.0, -1.0)
            d_abs = det * sgn
            ok = d_abs > _MT_EPS
            u2 = u_n * sgn
            v2 = v_n * sgn
            if any_hit:
                tn2 = t_n * sgn
                hit = (ok & (u2 >= 0.0) & (v2 >= 0.0)
                       & (u2 + v2 <= d_abs)
                       & (tn2 > t_min * d_abs) & (tn2 < t_max * d_abs))
                # elementwise [BR, CT] accumulation; reduced ONCE
                # after the loop (see _mt_kernel_any)
                hit_acc = jnp.maximum(hit_acc, jnp.where(hit, 1.0, 0.0))
            else:
                t_val = (t_n * sgn) / jnp.where(ok, d_abs, 1.0)
                hit = (ok & (u2 >= 0.0) & (v2 >= 0.0)
                       & (u2 + v2 <= d_abs)
                       & (t_val > t_min) & (t_val < t_max)
                       & (t_val < t_best[:, None]))
                t_cand = jnp.where(hit, t_val, INF)
                best_lane = jnp.argmin(t_cand, axis=1)
                t_new = jnp.min(t_cand, axis=1)
                improved = t_new < t_best
                t_best = jnp.where(improved, t_new, t_best)
                idx_best = jnp.where(
                    improved, (g * grp + k) * CT + best_lane, idx_best)
        return t_best, idx_best, hit_acc

    if not early:
        # CARRY-based loop (no per-unit ref round-trips / scalar branch -
        # those cost ~60% per unit when termination never fires, measured
        # on random rays, scripts/ucb_mxus.py r3). Short worklists take
        # this path; long entry-sorted ones take the early path below.
        @pl.when(n_live > 0)
        def _():
            feat = _feat48(rays)

            def group_c(i, carry):
                t_best, idx_best, hit_acc = carry

                @pl.when(i + 1 < n_live)
                def _():
                    start_copy(i + 1, (i + 1) % 2)

                wait_copy(i % 2)
                g = list_ref[i, b] if use_worklist else i
                prod = _dot48(feat, buf_ref[i % 2])
                return sweep_cols(prod, g, t_best, idx_best, hit_acc)

            init = (jnp.full((BR,), INF, jnp.float32),
                    jnp.full((BR,), -1, jnp.int32),
                    jnp.zeros((BR, CT) if any_hit else (BR,), jnp.float32))
            t_best, idx_best, hit_acc = jax.lax.fori_loop(
                0, n_live, group_c, init)
            if any_hit:
                flag = jnp.max(hit_acc, axis=1)
                idx_ref[0, :] = jnp.where(flag > 0.0, 1,
                                          -1).astype(jnp.int32)
            else:
                t_ref[0, :] = jnp.where(live0, t_best, 0.0)
                idx_ref[0, :] = idx_best
        return

    def group(i, feat):
        # feat rides the loop CARRY (not a closure) so its [48, BR]
        # build can live under the caller's pl.when(n_live > 0) gate
        @pl.when(done_ref[0] == 0)
        def _():
            @pl.when(i + 1 < n_live)
            def _():
                start_copy(i + 1, (i + 1) % 2)

            wait_copy(i % 2)
            g = list_ref[i, b] if use_worklist else i
            prod = _dot48(feat, buf_ref[i % 2])
            if any_hit:
                prev = jnp.where(idx_ref[0, :] > 0, 1.0, 0.0)
                acc_mat = jnp.broadcast_to(prev[:, None], (BR, CT))
                # ONE reduce per unit (the termination flag needs the
                # per-lane value)
                _, _, acc_mat = sweep_cols(
                    prod, g, jnp.float32(0.0), jnp.int32(0), acc_mat)
                hit_acc = jnp.max(acc_mat, axis=1)
                idx_ref[0, :] = jnp.where(
                    hit_acc > 0.0, 1, -1).astype(jnp.int32)
                term = jnp.min(jnp.maximum(hit_acc, inactive)) > 0.0
            elif matrix_best:
                sweep_cols_mat(prod, g)
                nxt = entry_ref[jnp.minimum(i + 1, num_groups - 1), b]
                okm = tn_ref[:, :] < nxt * d_ref[:, :]
                ray_ok = jnp.max(jnp.where(okm, 1.0, 0.0), axis=1)
                term = jnp.min(ray_ok) > 0.0
            else:
                t_best, idx_best, _ = sweep_cols(
                    prod, g, t_ref[0, :], idx_ref[0, :], jnp.float32(0.0))
                t_ref[0, :] = t_best
                idx_ref[0, :] = idx_best
                nxt = entry_ref[jnp.minimum(i + 1, num_groups - 1), b]
                term = jnp.max(t_best) < nxt
            if early:
                # terminating: the prefetch issued above for unit i+1
                # (slot (i+1)%2) is the only copy still in flight - drain
                # THAT slot in THIS iteration. Waiting any other slot (or
                # deferring the drain to a later iteration, which issues
                # no copy of its own) blocks on a never-signalled DMA
                # semaphore and hangs the kernel on real hardware.
                @pl.when(term & (i + 1 < n_live))
                def _():
                    wait_copy((i + 1) % 2)

                done_ref[0] = jnp.where(term, 2, 0).astype(jnp.int32)

        return feat

    @pl.when(n_live > 0)
    def _():
        if matrix_best and not any_hit:
            init_mat()
        jax.lax.fori_loop(0, n_live, group, _feat48(rays))
        if matrix_best and not any_hit:
            finalize_mat()


def _mt_kernel_mxuw(count_ref, list_ref, entry_ref, rays_ref, coef_ref,
                    mask_ref, t_ref, idx_ref, *, num_groups, any_hit,
                    use_worklist=True, passes=3, grp=GROUP):
    """Wide MXU MT sweep: GROUP chunks per K=128 block-diagonal dot.

    A K=16 dot costs the same as K=128 on the MXU (systolic fill;
    scripts/ucb_kdepth.py), so expanding the [16, 4*GROUP*CT] compact
    coefficients into a [128, 4*GROUP*CT] block-diagonal (tile rows x
    the 0/1 mask) buys GROUP chunks per dot for one chunk's price.
    Worklists cull at GROUP-chunk granularity.
    """
    rays = rays_ref[:]
    ox, oy, oz = rays[0], rays[1], rays[2]
    dx, dy, dz = rays[3], rays[4], rays[5]
    t_min = rays[6][:, None]
    t_max = rays[7][:, None]
    one = jnp.ones_like(ox)
    feat = jnp.stack([
        ox * dx, ox * dy, ox * dz,
        oy * dx, oy * dy, oy * dz,
        oz * dx, oz * dy, oz * dz,
        dx, dy, dz, ox, oy, oz, one,
    ], axis=1)                                        # [BR, 16]
    f_hi, f_lo = _split_bf16_kernel(feat)
    fh = jnp.concatenate([f_hi] * grp, axis=1)        # [BR, 16*grp]
    fl = jnp.concatenate([f_lo] * grp, axis=1)
    mask = mask_ref[:]

    b = pl.program_id(0)
    n_live = count_ref[b] if use_worklist else num_groups
    gct = grp * CT
    cols = 4 * gct

    def group(i, carry):
        t_best, idx_best = carry
        g = list_ref[i, b] if use_worklist else i
        cs = coef_ref[:, pl.ds(g * cols, cols)]       # [16, 4*grp*CT]
        c_hi, c_lo = _split_bf16_kernel(cs)
        bd_hi = jnp.concatenate([c_hi] * grp, axis=0) * mask.astype(
            jnp.bfloat16)
        bd_lo = jnp.concatenate([c_lo] * grp, axis=0) * mask.astype(
            jnp.bfloat16)

        def dot(a, bb):
            return jax.lax.dot_general(
                a, bb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)

        prod = dot(fh, bd_hi)
        if passes >= 3:
            prod = prod + dot(fh, bd_lo) + dot(fl, bd_hi)

        det = prod[:, 0:gct]
        u_n = prod[:, gct:2 * gct]
        v_n = prod[:, 2 * gct:3 * gct]
        t_n = prod[:, 3 * gct:4 * gct]
        sgn = jnp.where(det >= 0.0, 1.0, -1.0)
        d_abs = det * sgn
        ok = d_abs > _MT_EPS
        u2 = u_n * sgn
        v2 = v_n * sgn
        t_val = (t_n * sgn) / jnp.where(ok, d_abs, 1.0)
        hit = (ok & (u2 >= 0.0) & (v2 >= 0.0) & (u2 + v2 <= d_abs)
               & (t_val > t_min) & (t_val < t_max)
               & (t_val < t_best[:, None]))
        t_cand = jnp.where(hit, t_val, INF)
        best_lane = jnp.argmin(t_cand, axis=1)
        t_new = jnp.min(t_cand, axis=1)
        improved = t_new < t_best
        return (jnp.where(improved, t_new, t_best),
                jnp.where(improved, g * gct + best_lane, idx_best))

    init = (jnp.full((BR,), INF, jnp.float32), jnp.full((BR,), -1, jnp.int32))
    t_best, idx_best = jax.lax.fori_loop(0, n_live, group, init)
    t_ref[0, :] = t_best
    idx_ref[0, :] = idx_best


def _split_bf16(x):
    """f32 -> (hi, lo) bf16 pair with hi + lo ~ x (16 mantissa bits).

    MUST go through `lax.reduce_precision`: the naive
    `x - x.astype(bf16).astype(f32)` gets its convert round-trip ELIDED
    by XLA's excess-precision simplifier under jit, silently zeroing the
    lo term (the fused mxuf dot then degrades to a single bf16 pass:
    ~10% t error on grazing hits -> phantom light-quad occlusions;
    scripts/ucb_k48_bisect3.py is the eager-vs-jit repro). Mosaic
    (in-kernel) never folded it, which is why the in-kernel splits of
    mxu3/mxuw masked the bug."""
    hi_f32 = jax.lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)
    hi = hi_f32.astype(jnp.bfloat16)
    lo = (x - hi_f32).astype(jnp.bfloat16)
    return hi, lo


def _split_bf16_kernel(x):
    """In-kernel split: Mosaic neither elides the convert round-trip nor
    lowers `reduce_precision`, so the naive form is both safe and the
    only option inside Pallas kernels.

    INTERPRET mode however runs the kernel body through XLA, which DOES
    fold the naive f32->bf16->f32 round-trip (zeroing the lo term - the
    r2 pitfall) and silently degraded interpret-mode sweeps to a 1-pass
    bf16 window (~7% t error on grazing hits; caught by the r5 canary
    CPU repro, ray 994). Interpret uses reduce_precision so CPU kernel
    tests carry the REAL 3-pass numerics."""
    if _interpret():
        hi_f32 = jax.lax.reduce_precision(x, exponent_bits=8,
                                          mantissa_bits=7)
        return hi_f32.astype(jnp.bfloat16), (x - hi_f32).astype(jnp.bfloat16)
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _mt_kernel_mxu(count_ref, list_ref, entry_ref, rays_ref, coef_ref,
                   t_ref, idx_ref, *, num_chunks, any_hit,
                   use_worklist=True, passes=3):
    """Blocked MT sweep with the per-(ray,tri) algebra on the MXU.

    Each chunk step is one [BR,16] @ [16,4*CT] matmul (bf16, `passes`-way
    hi/lo split accumulated in f32) producing det/u_num/v_num/t_num,
    followed by sign-aware division-free window tests + argmin on the VPU.
    Replaces the ~60-op elementwise MT of `_mt_kernel` with ~22 VPU ops +
    MXU work, ~an order of magnitude faster per test on v5e
    (scripts/ucb_mxu.py).
    """
    rays = rays_ref[:]
    ox, oy, oz = rays[0], rays[1], rays[2]
    dx, dy, dz = rays[3], rays[4], rays[5]
    t_min = rays[6][:, None]
    t_max = rays[7][:, None]
    one = jnp.ones_like(ox)
    feat = jnp.stack([
        ox * dx, ox * dy, ox * dz,
        oy * dx, oy * dy, oy * dz,
        oz * dx, oz * dy, oz * dz,
        dx, dy, dz, ox, oy, oz, one,
    ], axis=1)                                        # [BR, 16]
    f_hi, f_lo = _split_bf16_kernel(feat)

    b = pl.program_id(0)
    n_live = count_ref[b] if use_worklist else num_chunks

    def chunk(i, carry):
        t_best, idx_best = carry
        c = list_ref[i, b] if use_worklist else i
        coef = coef_ref[:, pl.ds(c * 4 * CT, 4 * CT)]  # [16, 4CT]

        def dot(a, bb):
            return jax.lax.dot_general(
                a, bb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)

        c_hi, c_lo = _split_bf16_kernel(coef)
        prod = dot(f_hi, c_hi)
        if passes >= 3:
            prod = prod + dot(f_hi, c_lo) + dot(f_lo, c_hi)

        det = prod[:, 0:CT]
        u_n = prod[:, CT:2 * CT]
        v_n = prod[:, 2 * CT:3 * CT]
        t_n = prod[:, 3 * CT:4 * CT]
        sgn = jnp.where(det >= 0.0, 1.0, -1.0)
        d_abs = det * sgn
        ok = d_abs > _MT_EPS
        u2 = u_n * sgn
        v2 = v_n * sgn
        t_val = (t_n * sgn) / jnp.where(ok, d_abs, 1.0)
        hit = (ok & (u2 >= 0.0) & (v2 >= 0.0) & (u2 + v2 <= d_abs)
               & (t_val > t_min) & (t_val < t_max)
               & (t_val < t_best[:, None]))
        t_cand = jnp.where(hit, t_val, INF)
        best_lane = jnp.argmin(t_cand, axis=1)
        t_new = jnp.min(t_cand, axis=1)
        improved = t_new < t_best
        return (jnp.where(improved, t_new, t_best),
                jnp.where(improved, c * CT + best_lane, idx_best))

    init = (jnp.full((BR,), INF, jnp.float32), jnp.full((BR,), -1, jnp.int32))
    t_best, idx_best = jax.lax.fori_loop(0, n_live, chunk, init)
    t_ref[0, :] = t_best
    idx_ref[0, :] = idx_best


def _mt_kernel(count_ref, list_ref, entry_ref, rays_ref, tri_ref, t_ref,
               idx_ref, *, num_chunks, any_hit, use_worklist=True):
    rays = rays_ref[:]                      # [8, BR]
    ox, oy, oz = rays[0], rays[1], rays[2]  # [BR]
    dx, dy, dz = rays[3], rays[4], rays[5]
    t_min = rays[6]
    t_max = rays[7]

    # Per-block chunk worklist (host-of-kernel XLA pass): only chunks whose
    # AABB intersects some live ray of this block are visited - the
    # block-frustum culling that replaces per-ray BVH traversal. Dead
    # blocks have count 0 and skip the sweep entirely.
    b = pl.program_id(0)
    n_live = count_ref[b] if use_worklist else num_chunks

    def chunk(i, carry):
        t_best, idx_best = carry
        c = list_ref[i, b] if use_worklist else i
        tri = tri_ref[:, :, pl.ds(c * CT, CT)]    # [4, 3, CT]
        v0x, v0y, v0z = tri[0, 0], tri[0, 1], tri[0, 2]   # [CT]
        e1x, e1y, e1z = tri[1, 0], tri[1, 1], tri[1, 2]
        e2x, e2y, e2z = tri[2, 0], tri[2, 1], tri[2, 2]
        valid_t = tri[3, 0] > 0.5

        # broadcast rays down sublanes, tris along lanes: [BR, CT]
        rdx, rdy, rdz = dx[:, None], dy[:, None], dz[:, None]
        # pvec = d x e2
        px = rdy * e2z[None] - rdz * e2y[None]
        py = rdz * e2x[None] - rdx * e2z[None]
        pz = rdx * e2y[None] - rdy * e2x[None]
        det = e1x[None] * px + e1y[None] * py + e1z[None] * pz
        det_ok = jnp.abs(det) > _MT_EPS
        inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
        # tvec = o - v0
        tx = ox[:, None] - v0x[None]
        ty = oy[:, None] - v0y[None]
        tz = oz[:, None] - v0z[None]
        u = (tx * px + ty * py + tz * pz) * inv_det
        # qvec = tvec x e1
        qx = ty * e1z[None] - tz * e1y[None]
        qy = tz * e1x[None] - tx * e1z[None]
        qz = tx * e1y[None] - ty * e1x[None]
        v = (rdx * qx + rdy * qy + rdz * qz) * inv_det
        t = (e2x[None] * qx + e2y[None] * qy + e2z[None] * qz) * inv_det

        hit = (
            det_ok & valid_t[None]
            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > t_min[:, None]) & (t < t_max[:, None])
            & (t < t_best[:, None])
        )
        t_cand = jnp.where(hit, t, INF)
        best_lane = jnp.argmin(t_cand, axis=1)            # [BR]
        t_new = jnp.min(t_cand, axis=1)
        improved = t_new < t_best

        t_best = jnp.where(improved, t_new, t_best)
        idx_best = jnp.where(improved, c * CT + best_lane, idx_best)
        return t_best, idx_best

    init = (
        jnp.full((BR,), INF, jnp.float32),
        jnp.full((BR,), -1, jnp.int32),
    )
    t_best, idx_best = jax.lax.fori_loop(0, n_live, chunk, init)
    t_ref[0, :] = t_best
    idx_ref[0, :] = idx_best


def _block_entry(rays, chunk_aabb, num_chunks, nb, grp, force_union=False):
    """XLA worklist prepass: conservative per-(block, unit) entry distance.

    Per-ray slab tests of every chunk AABB against each ray's live
    (t_min, t_max) window, OR-reduced per BR-lane block: INF = no live
    ray touches the unit (culled); otherwise the min entry t, which is
    also the front-to-back sort key for the worklist (BVH-style ordered
    traversal economics without per-ray walks). Because the slab test is
    WINDOWED by t_max, bounded rays (NEE shadows carry t_max = light
    distance; segmented sweeps chain each lane's best t) shorten the
    worklists for free - pinned by tests/test_worklist_tbound.py.

    LAYOUT: everything is [NC, nb, BR] - the MINOR dim is the full
    BR-lane ray axis. The earlier [nb, BR, NC, 3] formulation had minor
    dims 3 and NC that XLA:TPU pads to 128 lanes (~0.5 GB of
    tile-padding traffic per 1M-ray call -> ~7.5 ms per traversal call,
    the dominant per-depth glue of the bounce loops; PERF.md r3).
    TPU_RT_GRP_CULL=1: slab-test GROUP union AABBs directly (grp x less
    prepass work; slightly looser worklists - BVH-DFS order keeps group
    unions tight). Worklists cull at group granularity either way.
    `force_union=True` takes the union-AABB path unconditionally - the
    COARSE culling caller (see trace_brute_pallas) passes grp far above
    the kernel group width exactly to avoid the per-chunk slab cost, so
    the exact chunk-min formulation would defeat it.

    Returns e_blk [nb, NU] where NU = ceil(num_chunks / grp).
    """
    eps = 1e-12
    aabb_src = chunk_aabb
    grp_cull = (grp > 1
                and (force_union
                     or os.environ.get("TPU_RT_GRP_CULL", "0") == "1"))
    if grp_cull:
        ng = (num_chunks + grp - 1) // grp
        pad = ng * grp - aabb_src.shape[0]
        if pad:
            empty = jnp.concatenate(
                [jnp.full((pad, 3), INF, jnp.float32),
                 jnp.full((pad, 3), -INF, jnp.float32),
                 jnp.zeros((pad, 2), jnp.float32)], axis=1)
            aabb_src = jnp.concatenate([aabb_src, empty], axis=0)
        ca = aabb_src.reshape(ng, grp, 8)
        aabb_src = jnp.concatenate(
            [ca[:, :, 0:3].min(axis=1), ca[:, :, 3:6].max(axis=1),
             jnp.zeros((ng, 2), jnp.float32)], axis=1)     # [NG, 8]
    tmin_nb = rays[6].reshape(1, nb, BR)
    tmax_nb = rays[7].reshape(1, nb, BR)
    nc_u = aabb_src.shape[0]
    t_lo = jnp.broadcast_to(tmin_nb, (nc_u, nb, BR))
    t_hi = jnp.broadcast_to(tmax_nb, (nc_u, nb, BR))
    for k in range(3):
        d_k = rays[3 + k]
        inv_k = (1.0 / jnp.where(jnp.abs(d_k) < eps,
                                 jnp.where(d_k < 0, -eps, eps), d_k)
                 ).reshape(1, nb, BR)
        o_k = rays[k].reshape(1, nb, BR)
        lo_k = (aabb_src[:, k][:, None, None] - o_k) * inv_k
        hi_k = (aabb_src[:, k + 3][:, None, None] - o_k) * inv_k
        t_lo = jnp.maximum(t_lo, jnp.minimum(lo_k, hi_k))
        t_hi = jnp.minimum(t_hi, jnp.maximum(lo_k, hi_k))
    ray_hit = (t_lo <= t_hi) & (tmax_nb > 0.0)             # [NC|NG, nb, BR]
    e_blk = jnp.where(ray_hit, t_lo, INF).min(axis=2).T    # [nb, NC|NG]

    if grp > 1 and not grp_cull:
        # cull at group-of-chunks granularity (one worklist entry per dot)
        ng = (num_chunks + grp - 1) // grp
        pad = ng * grp - num_chunks
        if pad:
            e_blk = jnp.concatenate(
                [e_blk, jnp.full((nb, pad), INF, jnp.float32)], axis=1)
        e_blk = e_blk.reshape(nb, ng, grp).min(axis=2)     # [nb, NG]
    return e_blk


@functools.partial(jax.jit, static_argnames=("any_hit", "reorder", "kernel",
                                             "coef48_grp"))
def trace_brute_pallas(tri_planes, chunk_aabb, ray_o, ray_d, t_min, t_max,
                       any_hit: bool = False, active=None,
                       reorder: str = "none", kernel: str = KERNEL_MODE,
                       coef48=None, coef48_grp: int = 0):
    """Closest-hit (or any-hit) over ALL triangles.

    Args:
      tri_planes: [4, 3, Tp] from `pack_triangles` (device array).
      ray_o, ray_d: [R, 3]; t_min/t_max scalar or [R].
      active: [R] bool; inactive lanes get t_max=0 (test nothing real).
      reorder: ray-stream permutation before blocking (ops/compaction.py):
        "none" keeps caller order; "live" packs active lanes first so
        trailing blocks die wholesale; "bins" additionally groups live
        lanes by direction octant so each block's chunk worklist stays
        short. Results are identical across modes up to exact-t
        cross-chunk ties (ops/compaction.py).

    Returns dict(t, tri); the winner's exact u/v/front are recomputed
    from its wide tri_table row in ops/hit.py.

    ray_o/ray_d may be [R, 3] arrays or component tuples of three [R]
    arrays (utils/vec3.V3) - the component form feeds the [8, R] ray
    block with zero repacking.
    """
    if isinstance(ray_o, tuple):
        o_c, d_c = list(ray_o), list(ray_d)
        r = o_c[0].shape[0]
    else:
        o_c = [ray_o[:, k] for k in range(3)]
        d_c = [ray_d[:, k] for k in range(3)]
        r = ray_o.shape[0]
    tp = tri_planes.shape[2]
    num_chunks = tp // CT
    rp = max(((r + BR - 1) // BR) * BR, BR)

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    if active is not None:
        t_max = jnp.where(active, t_max, 0.0)

    dest = None
    if reorder != "none":
        # reorder path materializes the [rp, 8] row table (one wide-row
        # gather applies the permutation); default "none" builds the
        # [8, rp] transposed layout directly - a [rp, 8] array pads its
        # minor dim to 128 lanes (~0.5 GB at 1M rays, PERF.md r3).
        from . import compaction

        rows = jnp.zeros((rp, 8), jnp.float32)
        rows = rows.at[:r, 0].set(o_c[0])
        rows = rows.at[:r, 1].set(o_c[1])
        rows = rows.at[:r, 2].set(o_c[2])
        rows = rows.at[:r, 3].set(d_c[0])
        rows = rows.at[:r, 4].set(d_c[1])
        rows = rows.at[:r, 5].set(d_c[2])
        rows = rows.at[:r, 6].set(t_min)
        rows = rows.at[:r, 7].set(t_max)
        live = rows[:, 7] > 0.0
        if reorder == "bins":
            key, nb_bins = compaction.direction_bins(rows[:, 3:6], live)
            src, dest = compaction.partition_bins(key, nb_bins)
        else:
            src, dest, _ = compaction.partition_live(live)
        rays = rows[src].T
    else:
        pad = rp - r
        rays = jnp.stack(
            o_c + d_c + [t_min, t_max], axis=0)         # [8, R]
        if pad:
            rays = jnp.concatenate(
                [rays, jnp.zeros((8, pad), jnp.float32)], axis=1)

    # VMEM fault-envelope clamp runs BEFORE any dispatch path - the
    # INCULL experiment below launches its own kernel and must not
    # bypass the BR refusal / width caps (a fault can wedge the tunnel
    # for hours). The later resolution chain re-applies it; idempotent.
    kernel = _vmem_cap_mode(kernel)

    # EXPERIMENT (default OFF - regressed 7.7 -> 5.3 Mrays/s): cull
    # INSIDE the kernel (slab-guarded groups) instead of the XLA worklist
    # prepass. The per-group scalar reduce + pl.when branch machinery
    # costs more than the ~3 ms/call of prepass glue it saves; kept for
    # the record + future Mosaic toolchains.
    if (kernel.startswith("mxuf") and dest is None
            and num_chunks <= 64 and tp <= MXUF_MAX_TP
            and os.environ.get("TPU_RT_INCULL", "0") != "0"):
        grp = min(2 if num_chunks <= 48 else 8, _mxus_grp())
        ng = (num_chunks + grp - 1) // grp
        pad = ng * grp - num_chunks
        ca = chunk_aabb
        if pad:
            empty = jnp.concatenate(
                [jnp.full((pad, 3), INF, jnp.float32),
                 jnp.full((pad, 3), -INF, jnp.float32),
                 jnp.zeros((pad, 2), jnp.float32)], axis=1)
            ca = jnp.concatenate([ca, empty], axis=0)
        ca = ca.reshape(ng, grp, 8)
        gaabb = jnp.concatenate(
            [ca[:, :, 0:3].min(axis=1), ca[:, :, 3:6].max(axis=1),
             jnp.zeros((ng, 2), jnp.float32)], axis=1)      # [NG, 8]
        coef = mt_coef48(tri_planes, group=grp)
        nb = rp // BR
        kern = functools.partial(
            _mt_kernel_mxui, num_chunks=num_chunks, any_hit=any_hit,
            grp=grp)
        interpret = _interpret()
        t, idx = pl.pallas_call(
            kern,
            grid=(nb,),
            interpret=interpret,
            in_specs=[
                pl.BlockSpec((8, BR), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ng, 8), lambda b: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(coef.shape, lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, BR), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BR), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, rp), jnp.float32),
                jax.ShapeDtypeStruct((1, rp), jnp.int32),
            ],
        )(rays, gaabb, coef)
        missed = idx[0, :r] < 0
        return {
            "t": jnp.where(missed, jnp.float32(INF), t[0, :r]),
            "tri": idx[0, :r],
        }

    mode = kernel
    if mode in ("mxuf2", "mxuv2") and num_chunks > 48:
        # dense scenes want wide dots (fewer loop steps; bunny: 110 ms
        # at grp 2 vs 35 ms at grp 8, scripts/ucb_kern.py --bunny); small
        # scenes want fine cull granularity. Group width is VMEM-capped
        # against BR (see _mxus_grp); mxuv additionally carries 3x
        # [BR, CT] f32 scratch, so it takes half the width.
        auto = (max(2, min(8, _mxus_grp())) if mode == "mxuf2"
                else max(2, _mxus_grp() // 2))
        mode = f"{mode[:4]}{auto}"
    if any_hit and not mode.startswith("vpu") \
            and os.environ.get("TPU_RT_ANYHIT", "1") != "0":
        # occlusion queries take the early-out kernel (same group width
        # as a grouped closest-hit mode, else pairs of chunks)
        mode = f"any{_mode_grp(mode)}" if _mode_grp(mode) > 1 else "any2"
    if mode.startswith("mxuw") and tp > MXUW_MAX_TP:
        mode = "mxu3"
    if (mode.startswith("mxuf") or mode.startswith("mxuv")
            or mode.startswith("any")) and tp > MXUF_MAX_TP:
        # beyond VMEM residency: stream the coef from HBM (the streamed
        # kernel keeps the any-hit fast path - no argmin/division,
        # all-occluded early exit - via the any_hit flag)
        mode = f"mxus{_mxus_grp()}"
    if mode.startswith("mxu") and not mode.startswith("mxuw") \
            and not mode.startswith("mxuf") and not mode.startswith("mxus") \
            and tp > MXU_MAX_TP:
        mode = "vpu"
    mode = _vmem_cap_mode(mode)
    grp = _mode_grp(mode)

    if os.environ.get("TPU_RT_NO_WORKLIST", "0") == "1" and dest is None:
        # A/B knob: skip the whole XLA slab/sort prepass (~3 ms/call of
        # glue on Cornell-class scenes whose incoherent bounce blocks
        # touch most chunks anyway - the worklist culls little there
        # while every traversal call pays for building it). The kernel
        # sweeps every unit in layout order; results are identical up to
        # exact-t cross-chunk ties (sweep order changes). Dense scenes
        # want worklists - measure before flipping any default.
        nb0 = rp // BR
        n_units = (num_chunks + grp - 1) // grp if grp > 1 else num_chunks
        return _run_kernel(
            rays, tri_planes, jnp.zeros((nb0,), jnp.int32),
            jnp.zeros((1, nb0), jnp.int32), jnp.zeros((1, nb0), jnp.float32),
            r, rp, nb0, num_chunks, tp, any_hit, dest=None, mode=mode,
            coef48=coef48, coef48_grp=coef48_grp, num_units=n_units)

    # --- block-level chunk culling (cheap XLA pre-pass) ---
    # COARSE culling: the prepass slab-tests O(units x rays), which at
    # the kernel's group granularity grows linearly with triangles
    # (~1.3 s/call at 1M tris, 262k rays - the old swept-path ceiling).
    # When the kernel-unit count exceeds TPU_RT_CULL_UNITS, the prepass
    # instead tests union AABBs of c kernel units at a time (c a power
    # of two), bounding its cost at ANY triangle count, and the entry
    # matrix is repeated back to kernel granularity - member units
    # inherit their coarse unit's conservative entry, so the sort,
    # counts, SMEM caps, and segmentation below are untouched. Culling
    # is conservative (a union contains every member): worklists may be
    # looser, never tighter; winner equality is pinned by
    # tests/test_mxu_kernel.py::test_coarse_cull_matches_default.
    nb = rp // BR
    n_kernel_units = (num_chunks + grp - 1) // grp if grp > 1 else num_chunks
    cull_target = max(1, int(os.environ.get("TPU_RT_CULL_UNITS", "1024")))
    c = 1
    while n_kernel_units > c * cull_target:
        c *= 2
    e_blk = _block_entry(rays, chunk_aabb, num_chunks, nb, grp * c,
                         force_union=c > 1)
    if c > 1:
        e_blk = jnp.repeat(e_blk, c, axis=1)[:, :n_kernel_units]
    num_units_all = e_blk.shape[1]
    nb_pad = ((nb + 127) // 128) * 128
    cap_units = int(os.environ.get("TPU_RT_SEG_CAP", "0")) \
        or (512 * 1024) // (nb_pad * 8)
    # each segment is a full grid launch (nb programs x ~10 us floor), so
    # fragmenting into many segments loses to ONE unculled sweep; past 8
    # segments (huge frame x huge scene) take the legacy no-worklist
    # path. Under COARSE culling the economics invert - the prepass no
    # longer grows with the scene, so chained front-to-back segments
    # beat one full sweep far longer; the ceiling rises to 64 segments
    # (TPU_RT_SEG_MAX overrides either way).
    seg_max = int(os.environ.get("TPU_RT_SEG_MAX", "0")) \
        or (8 if c == 1 else 64)
    if (num_units_all <= cap_units or dest is not None
            or num_units_all > seg_max * max(cap_units, 1)):
        # single sweep (dest-permuted streams can't chain t_max through
        # segments - they keep the legacy no-worklist fallback if huge)
        counts = (e_blk < INF).sum(axis=1).astype(jnp.int32)   # [nb]
        # worklist sorted front-to-back (INF = unhit units sort last;
        # count excludes them); stored [U, nb]
        order = jnp.argsort(e_blk, axis=1, stable=True)
        chunk_list = order.astype(jnp.int32).T
        entry_list = jnp.take_along_axis(e_blk, order, axis=1).T
        return _run_kernel(rays, tri_planes, counts, chunk_list, entry_list,
                           r, rp, nb, num_chunks, tp, any_hit, dest=dest,
                           mode=mode, coef48=coef48, coef48_grp=coef48_grp)

    # --- SEGMENTED sweep: worklists past the SMEM budget split into
    # unit-id ranges (BVH-DFS order keeps ranges spatially coherent) and
    # the kernel runs once per segment with the ray window CHAINED:
    # closest-hit feeds each lane's running best t in as the next
    # segment's t_max (strict < keeps the earlier segment's winner on
    # exact ties = the lowest triangle id); any-hit kills occluded lanes
    # (t_max = 0). The slab prepass ran once with the ORIGINAL window, so
    # later segments additionally drop units whose conservative entry
    # distance lies beyond every live lane's chained bound (a [nb, seg]
    # compare - entries sort ascending, so tightening the COUNT is enough
    # to keep the front-to-back contract). This keeps culling + early
    # termination at ANY triangle count - previously such scenes fell
    # back to the no-worklist full sweep.
    n_seg = -(-num_units_all // cap_units)
    seg = -(-num_units_all // n_seg)
    t_best = jnp.full((r,), INF, jnp.float32)
    idx_best = jnp.full((r,), -1, jnp.int32)
    t_max_now = rays[7, :r]
    lane_pad = rp - r
    for s in range(n_seg):
        lo = s * seg
        hi = min(lo + seg, num_units_all)
        e_s = e_blk[:, lo:hi]
        order_s = jnp.argsort(e_s, axis=1, stable=True)
        chunk_list_s = (order_s + lo).astype(jnp.int32).T
        entry_list_s = jnp.take_along_axis(e_s, order_s, axis=1).T
        if s:
            lane_max = (jnp.minimum(t_max_now, t_best) if not any_hit
                        else jnp.where(idx_best >= 0, 0.0, t_max_now))
            rays = rays.at[7, :r].set(lane_max)
            lm = lane_max
            if lane_pad:
                lm = jnp.concatenate(
                    [lm, jnp.zeros((lane_pad,), jnp.float32)])
            blk_bound = lm.reshape(nb, BR).max(axis=1)     # [nb]
            counts_s = (entry_list_s.T < blk_bound[:, None]).sum(
                axis=1).astype(jnp.int32)
        else:
            counts_s = (e_s < INF).sum(axis=1).astype(jnp.int32)
        out = _run_kernel(rays, tri_planes, counts_s, chunk_list_s,
                          entry_list_s, r, rp, nb, num_chunks, tp, any_hit,
                          mode=mode, coef48=coef48, coef48_grp=coef48_grp)
        got = out["tri"] >= 0
        t_best = jnp.where(got, out["t"], t_best)
        idx_best = jnp.where(got, out["tri"], idx_best)
    missed = idx_best < 0
    return {"t": jnp.where(missed, jnp.float32(INF), t_best),
            "tri": idx_best}


def _coef48_or(coef48, coef48_grp, tri_planes, grp):
    """Scene-precomputed coef48 when its group width matches, else the
    in-graph conversion (tests / non-default kernels)."""
    if coef48 is not None and coef48_grp == grp and coef48.shape[1] > 0:
        return coef48
    return mt_coef48(tri_planes, group=grp)


def _run_kernel(rays, tri_planes, counts, chunk_list, entry_list, r, rp, nb,
                num_chunks, tp, any_hit, dest=None, mode=KERNEL_MODE,
                coef48=None, coef48_grp: int = 0, num_units=None):
    # SMEM pads the minor dim to 128; when worklists would blow the ~1MB
    # SMEM budget (huge frame x huge scene) the kernel sweeps all chunks
    # and ignores the (dummy) list. An explicit num_units (with dummy
    # lists) means the caller skipped the prepass deliberately
    # (TPU_RT_NO_WORKLIST) - sweep all units in layout order.
    if num_units is None:
        num_units = chunk_list.shape[0]   # chunks, or GROUP-chunk groups
        nb_pad = ((nb + 127) // 128) * 128
        use_worklist = num_units * nb_pad * 8 <= 512 * 1024
    else:
        use_worklist = False
    if not use_worklist:
        chunk_list = jnp.zeros((1, nb), jnp.int32)
        entry_list = jnp.zeros((1, nb), jnp.float32)
    # front-to-back early termination: the per-step flag check + ref
    # round-trips cost ~30% per unit even when it never fires
    # (ucb_kern --bunny random rays), so it only pays when worklists are
    # LONG enough that coherent blocks can skip most of theirs
    early = (num_units >= int(os.environ.get("TPU_RT_EARLY_MIN", "64"))
             and os.environ.get("TPU_RT_EARLY", "1") != "0"
             and (use_worklist
                  # the any-hit all-occluded exit needs only the SMEM
                  # done flag, not entry-sorted worklists: keep it under
                  # TPU_RT_NO_WORKLIST for the resident kernel (layout
                  # order still finds near occluders spatially-coherent
                  # early). mxus' early path stays worklist-gated - its
                  # DMA drain protocol assumes entry-sorted lists.
                  or (any_hit and mode.startswith("any"))))
    extra_args = ()
    extra_specs = []
    scratch_shapes = []
    if mode.startswith("any"):
        grp = _mode_grp(mode)
        tri_arg = _coef48_or(coef48, coef48_grp, tri_planes, grp)
        tri_spec = pl.BlockSpec(tri_arg.shape, lambda b: (0, 0),
                                memory_space=pltpu.VMEM)
        scratch_shapes = [pltpu.SMEM((1,), jnp.int32)]
        kernel = functools.partial(
            _mt_kernel_any, num_groups=num_units,
            use_worklist=use_worklist, grp=grp, early=early)
    elif mode.startswith("mxuv"):
        grp = _mode_grp(mode)
        tri_arg = _coef48_or(coef48, coef48_grp, tri_planes, grp)
        tri_spec = pl.BlockSpec(tri_arg.shape, lambda b: (0, 0),
                                memory_space=pltpu.VMEM)
        scratch_shapes = [
            pltpu.VMEM((BR, CT), jnp.float32),
            pltpu.VMEM((BR, CT), jnp.float32),
            pltpu.VMEM((BR, CT), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ]
        kernel = functools.partial(
            _mt_kernel_mxuv, num_groups=num_units,
            use_worklist=use_worklist, grp=grp, early=early)
    elif mode.startswith("mxus"):
        grp = _mode_grp(mode)
        cols = grp * 4 * CT
        tri_arg = _coef48_or(coef48, coef48_grp, tri_planes, grp)
        tri_spec = pl.BlockSpec(memory_space=pl.ANY)      # stays in HBM
        matrix_best = (not any_hit
                       and os.environ.get("TPU_RT_MXUS_V", "0") == "1"
                       and _mxus_matrix_best_ok(grp))
        scratch_shapes = [
            pltpu.VMEM((2, 48, cols), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        if matrix_best:
            scratch_shapes += [
                pltpu.VMEM((BR, CT), jnp.float32),
                pltpu.VMEM((BR, CT), jnp.float32),
                pltpu.VMEM((BR, CT), jnp.float32),
            ]
        scratch_shapes.append(pltpu.SMEM((1,), jnp.int32))
        kernel = functools.partial(
            _mt_kernel_mxus, num_groups=num_units, any_hit=any_hit,
            use_worklist=use_worklist, grp=grp, early=early,
            matrix_best=matrix_best)
    elif mode.startswith("mxuf"):
        grp = _mode_grp(mode)
        tri_arg = _coef48_or(coef48, coef48_grp, tri_planes, grp)
        tri_spec = pl.BlockSpec(tri_arg.shape, lambda b: (0, 0),
                                memory_space=pltpu.VMEM)
        scratch_shapes = [pltpu.SMEM((1,), jnp.int32)]
        kernel = functools.partial(
            _mt_kernel_mxuf, num_groups=num_units, any_hit=any_hit,
            use_worklist=use_worklist, grp=grp, early=early)
    elif mode.startswith("mxuw"):
        grp = int(mode[4:]) if len(mode) > 4 else GROUP
        tri_arg = mt_coef_device(tri_planes, wide=True, group=grp)
        tri_spec = pl.BlockSpec(tri_arg.shape, lambda b: (0, 0),
                                memory_space=pltpu.VMEM)
        extra_args = (_mxuw_mask(grp),)
        extra_specs = [pl.BlockSpec((16 * grp, 4 * grp * CT),
                                    lambda b: (0, 0),
                                    memory_space=pltpu.VMEM)]
        kernel = functools.partial(
            _mt_kernel_mxuw, num_groups=num_units, any_hit=any_hit,
            use_worklist=use_worklist, grp=grp)
    elif mode.startswith("mxu"):
        tri_arg = mt_coef_device(tri_planes)
        tri_spec = pl.BlockSpec((16, num_chunks * 4 * CT), lambda b: (0, 0),
                                memory_space=pltpu.VMEM)
        kernel = functools.partial(
            _mt_kernel_mxu, num_chunks=num_chunks, any_hit=any_hit,
            use_worklist=use_worklist, passes=1 if mode == "mxu1" else 3)
    else:
        tri_arg = tri_planes
        tri_spec = pl.BlockSpec((4, 3, tp), lambda b: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        kernel = functools.partial(_mt_kernel, num_chunks=num_chunks,
                                   any_hit=any_hit, use_worklist=use_worklist)
    # CPU backend (tests / multi-chip dry runs on virtual devices) runs the
    # kernel in the Pallas interpreter; TPU compiles via Mosaic.
    interpret = _interpret()
    t, idx = pl.pallas_call(
        kernel,
        grid=(nb,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((nb,), lambda b: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((num_units if use_worklist else 1, nb),
                         lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((num_units if use_worklist else 1, nb),
                         lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, BR), lambda b: (0, b), memory_space=pltpu.VMEM),
            tri_spec,
            *extra_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, BR), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BR), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, rp), jnp.float32),
            jax.ShapeDtypeStruct((1, rp), jnp.int32),
        ],
        scratch_shapes=scratch_shapes,
    )(counts, chunk_list, entry_list, rays, tri_arg, *extra_args)

    if dest is not None:
        # undo the ray permutation with ONE wide-row gather (tri id rides
        # bitcast through f32).
        out_rows = jnp.concatenate([
            t.T, jax.lax.bitcast_convert_type(idx, jnp.float32).T,
        ], axis=-1)[dest]
        t = out_rows[:, 0:1].T
        idx = jax.lax.bitcast_convert_type(out_rows[:, 1:2], jnp.int32)[:, 0][None]

    missed = idx[0, :r] < 0
    return {
        "t": jnp.where(missed, jnp.float32(INF), t[0, :r]),
        "tri": idx[0, :r],
    }


# ---------------------------------------------------------------------------
# Two-level INSTANCED intersector (shared-BLAS analogue, builder.rs:143-189 +
# TLAS update :454-468): ONE object-space coefficient block per mesh, shared
# by every instance; rays are transformed into object space INSIDE the kernel
# with UNNORMALIZED directions, so the hit parameter t is identical in both
# spaces and needs no rescaling. 100 instances of one mesh cost ~1x the mesh
# memory, and moving an instance re-computes only its inverse affine + world
# AABB (no triangle/coefficient rebuild - real TLAS-update economics).
#
# Culling is two-level, mirroring TLAS/BLAS:
#   * XLA prepass: per-block slab tests against INSTANCE world AABBs,
#     packed into a per-block instance BITMASK ([I/32, nb] i32 SMEM - a
#     per-unit id list would blow SMEM at gallery scale);
#   * in-kernel: per grp-chunk group, an object-space slab test over the
#     block's transformed rays guards each MXU sweep (pl.when).
# ---------------------------------------------------------------------------

INST_GRP = 2   # chunks per dot group in the instanced kernel


def pack_triangles_instanced(mesh_tris, grp: int = INST_GRP):
    """Per-MESH object-space packing for the two-level instanced sweep.

    mesh_tris: list of (v0 [t,3], e1, e2) per mesh. Each mesh is padded to
    a multiple of grp*CT triangles so neither 128-tri chunks nor grp-wide
    dot groups span meshes (zero coef = det 0 = never hits).

    Returns (planes [4,3,TpO], gaabb [8, NGO] object group AABBs
    TRANSPOSED for SMEM (minor dim is padded to 128 there), spans
    [2, NMesh] i32 = (first group, group count) per mesh).
    """
    unit = grp * CT
    planes_list, aabb_cols, spans = [], [], []
    g0 = 0
    for v0, e1, e2 in mesh_tris:
        t = v0.shape[0]
        tp = max(((t + unit - 1) // unit) * unit, unit)
        p = np.zeros((4, 3, tp), np.float32)
        p[0, :, :t] = v0.T
        p[1, :, :t] = e1.T
        p[2, :, :t] = e2.T
        p[3, 0, :t] = 1.0
        planes_list.append(p)
        ng = tp // unit
        v1 = v0 + e1
        v2 = v0 + e2
        mn = np.minimum(np.minimum(v0, v1), v2)
        mx = np.maximum(np.maximum(v0, v1), v2)
        for g in range(ng):
            lo, hi = g * unit, min((g + 1) * unit, t)
            if lo < hi:
                box = np.concatenate([mn[lo:hi].min(axis=0),
                                      mx[lo:hi].max(axis=0),
                                      np.zeros(2, np.float32)])
            else:
                box = np.concatenate([np.full(3, INF, np.float32),
                                      np.full(3, -INF, np.float32),
                                      np.zeros(2, np.float32)])
            aabb_cols.append(box.astype(np.float32))
        spans.append((g0, ng))
        g0 += ng
    planes = np.concatenate(planes_list, axis=2)
    gaabb = np.stack(aabb_cols, axis=1).astype(np.float32)   # [8, NGO]
    spans = np.asarray(spans, np.int32).T                    # [2, NM]
    return planes, gaabb, spans


def _mt_kernel_inst(mask_ref, rays_ref, affine_ref, span_ref, gaabb_ref,
                    coef_ref, t_ref, idx_ref, inst_ref, done_ref, *,
                    num_inst, any_hit, grp=INST_GRP):
    """Two-level instanced sweep: outer loop over instances (bitmask
    culled), rays transformed per instance (per-lane cost ~1/100th of one
    group sweep), inner loop over the instance's object chunk groups with
    an object-space slab guard per group. Winner is (object tri, inst).
    """
    rays = rays_ref[:]
    t_minl = rays[6]
    t_maxl = rays[7]
    live0 = t_maxl > 0.0
    inactive = jnp.where(live0, 0.0, 1.0)
    t_min2 = t_minl[:, None]
    t_max2 = t_maxl[:, None]
    b = pl.program_id(0)
    cols = grp * 4 * CT

    if any_hit:
        t_ref[0, :] = t_maxl
    else:
        t_ref[0, :] = jnp.where(live0, INF, 0.0)
    idx_ref[0, :] = jnp.full((BR,), -1, jnp.int32)
    inst_ref[0, :] = jnp.full((BR,), -1, jnp.int32)
    done_ref[0] = jnp.int32(0)

    wox, woy, woz = rays[0], rays[1], rays[2]
    wdx, wdy, wdz = rays[3], rays[4], rays[5]

    def inst_body(i, carry):
        word = mask_ref[i // 32, b]
        bit = jax.lax.shift_right_logical(word, i % 32) & 1

        @pl.when((bit != 0) & (done_ref[0] == 0))
        def _():
            a00 = affine_ref[0, i]
            a01 = affine_ref[1, i]
            a02 = affine_ref[2, i]
            a10 = affine_ref[3, i]
            a11 = affine_ref[4, i]
            a12 = affine_ref[5, i]
            a20 = affine_ref[6, i]
            a21 = affine_ref[7, i]
            a22 = affine_ref[8, i]
            b0 = affine_ref[9, i]
            b1 = affine_ref[10, i]
            b2 = affine_ref[11, i]
            ox = a00 * wox + a01 * woy + a02 * woz + b0
            oy = a10 * wox + a11 * woy + a12 * woz + b1
            oz = a20 * wox + a21 * woy + a22 * woz + b2
            dx = a00 * wdx + a01 * wdy + a02 * wdz
            dy = a10 * wdx + a11 * wdy + a12 * wdz
            dz = a20 * wdx + a21 * wdy + a22 * wdz
            feat = _feat48_from(ox, oy, oz, dx, dy, dz)
            inv_x = 1.0 / _nonzero(dx)
            inv_y = 1.0 / _nonzero(dy)
            inv_z = 1.0 / _nonzero(dz)
            base = span_ref[0, i]
            cnt = span_ref[1, i]

            def grp_body(j, c):
                g = base + j
                cur = t_ref[0, :]
                hi_lane = jnp.minimum(t_maxl, cur) if not any_hit else t_maxl
                ax = (gaabb_ref[0, g] - ox) * inv_x
                bx = (gaabb_ref[3, g] - ox) * inv_x
                ay = (gaabb_ref[1, g] - oy) * inv_y
                by = (gaabb_ref[4, g] - oy) * inv_y
                az = (gaabb_ref[2, g] - oz) * inv_z
                bz = (gaabb_ref[5, g] - oz) * inv_z
                t_in = jnp.maximum(
                    jnp.maximum(jnp.minimum(ax, bx), jnp.minimum(ay, by)),
                    jnp.maximum(jnp.minimum(az, bz), t_minl))
                t_out = jnp.minimum(
                    jnp.minimum(jnp.maximum(ax, bx), jnp.maximum(ay, by)),
                    jnp.minimum(jnp.maximum(az, bz), hi_lane))
                touched = (t_in <= t_out) & live0
                box_any = jnp.max(jnp.where(touched, 1.0, 0.0)) > 0.0

                @pl.when(box_any)
                def _():
                    prod = _dot48(feat, coef_ref[:, pl.ds(g * cols, cols)])
                    if any_hit:
                        prev = jnp.where(idx_ref[0, :] > 0, 1.0, 0.0)
                        acc_mat = jnp.broadcast_to(prev[:, None], (BR, CT))
                        for k in range(grp):
                            o = k * 4 * CT
                            det = prod[:, o:o + CT]
                            u_n = prod[:, o + CT:o + 2 * CT]
                            v_n = prod[:, o + 2 * CT:o + 3 * CT]
                            t_n = prod[:, o + 3 * CT:o + 4 * CT]
                            sgn = jnp.where(det >= 0.0, 1.0, -1.0)
                            d_abs = det * sgn
                            ok = d_abs > _MT_EPS
                            u2 = u_n * sgn
                            v2 = v_n * sgn
                            tn2 = t_n * sgn
                            hit = (ok & (u2 >= 0.0) & (v2 >= 0.0)
                                   & (u2 + v2 <= d_abs)
                                   & (tn2 > t_min2 * d_abs)
                                   & (tn2 < t_max2 * d_abs))
                            acc_mat = jnp.maximum(
                                acc_mat, jnp.where(hit, 1.0, 0.0))
                        hit_acc = jnp.max(acc_mat, axis=1)
                        idx_ref[0, :] = jnp.where(
                            hit_acc > 0.0, 1, -1).astype(jnp.int32)
                        # inst must name an ACTUAL occluder: only lanes
                        # newly occluded by THIS instance take i (prev
                        # lanes keep their first occluder; acc_mat is
                        # seeded with prev, so hit_acc alone can't tell)
                        inst_ref[0, :] = jnp.where(
                            (hit_acc > 0.0) & (prev == 0.0),
                            i, inst_ref[0, :])
                    else:
                        t_best = t_ref[0, :]
                        idx_best = idx_ref[0, :]
                        in_best = inst_ref[0, :]
                        for k in range(grp):
                            o = k * 4 * CT
                            det = prod[:, o:o + CT]
                            u_n = prod[:, o + CT:o + 2 * CT]
                            v_n = prod[:, o + 2 * CT:o + 3 * CT]
                            t_n = prod[:, o + 3 * CT:o + 4 * CT]
                            sgn = jnp.where(det >= 0.0, 1.0, -1.0)
                            d_abs = det * sgn
                            ok = d_abs > _MT_EPS
                            u2 = u_n * sgn
                            v2 = v_n * sgn
                            t_val = (t_n * sgn) / jnp.where(ok, d_abs, 1.0)
                            hit = (ok & (u2 >= 0.0) & (v2 >= 0.0)
                                   & (u2 + v2 <= d_abs)
                                   & (t_val > t_min2) & (t_val < t_max2)
                                   & (t_val < t_best[:, None]))
                            t_cand = jnp.where(hit, t_val, INF)
                            best_lane = jnp.argmin(t_cand, axis=1)
                            t_new = jnp.min(t_cand, axis=1)
                            improved = t_new < t_best
                            t_best = jnp.where(improved, t_new, t_best)
                            idx_best = jnp.where(
                                improved, (g * grp + k) * CT + best_lane,
                                idx_best)
                            in_best = jnp.where(improved, i, in_best)
                        t_ref[0, :] = t_best
                        idx_ref[0, :] = idx_best
                        inst_ref[0, :] = in_best
                return c

            jax.lax.fori_loop(0, cnt, grp_body, jnp.int32(0))
            if any_hit:
                occ = jnp.where(idx_ref[0, :] > 0, 1.0, 0.0)
                done_ref[0] = (jnp.min(jnp.maximum(occ, inactive))
                               > 0.0).astype(jnp.int32)
        return carry

    jax.lax.fori_loop(0, num_inst, inst_body, jnp.int32(0))


def _rays_padded(ray_o, ray_d, t_min, t_max, active, r, rp):
    """[8, rp] transposed ray table (no padded [rp, 8] materialization)."""
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    if active is not None:
        t_max = jnp.where(active, t_max, 0.0)
    rays = jnp.concatenate(
        [ray_o.T, ray_d.T, t_min[None], t_max[None]], axis=0)
    if rp > r:
        rays = jnp.concatenate(
            [rays, jnp.zeros((8, rp - r), jnp.float32)], axis=1)
    return rays


@functools.partial(jax.jit, static_argnames=("any_hit", "grp"))
def trace_instanced_pallas(obj_planes, obj_gaabb, inst_affine_inv,
                           inst_group_span, inst_aabb, ray_o, ray_d,
                           t_min, t_max, any_hit: bool = False, active=None,
                           grp: int = INST_GRP, coef48=None):
    """Two-level instanced closest-hit / any-hit.

    The [BR, 4*CT*grp] window product must stay inside the 8.4 MB VMEM
    fault envelope (see _vmem_cap_mode); grp is baked in at pack time
    (pack_triangles_instanced), so over-wide BR fails loudly here
    instead of faulting the chip (a fault can wedge the axon tunnel
    for hours, PERF.md r3).

    Args:
      obj_planes:      [4, 3, TpO] object-space planes (shared per mesh).
      obj_gaabb:       [8, NGO] object-space group AABBs (transposed).
      inst_affine_inv: [12, I] rows = world->object affine (A^-1 | b).
      inst_group_span: [2, I] i32 (group base, count) of each instance's
                       mesh in the object layout.
      inst_aabb:       [I, 8] instance WORLD AABBs (prepass culling;
                       refit updates these).
    Returns dict(t, tri (OBJECT triangle id), inst).
    """
    if BR * 4 * CT * grp * 4 > 512 * 8 * 4 * CT * 4:
        raise ValueError(
            f"instanced sweep window [BR={BR}, {4 * CT * grp}] exceeds the"
            f" 8.4 MB VMEM fault envelope; lower TPU_RT_BR (<= "
            f"{512 * 8 // grp}) - grp={grp} is fixed at pack time")
    tp_obj = obj_planes.shape[2]
    if tp_obj > MXUF_MAX_TP and jax.default_backend() == "tpu":
        # the instanced kernel pins the whole per-mesh coef block in
        # VMEM (there is no streamed instanced variant); past the
        # validated residency cap refuse loudly instead of risking a
        # Mosaic VMEM oversubscription fault (builder instancing="on"
        # can request this - "auto" never does)
        raise ValueError(
            f"instanced scene's unique meshes pack to {tp_obj} triangle"
            f" slots > the {MXUF_MAX_TP} VMEM-residency cap of the"
            f" instanced kernel; build with instancing='auto'/'off'"
            f" (flattened scenes stream from HBM instead)")
    r = ray_o.shape[0]
    rp = max(((r + BR - 1) // BR) * BR, BR)
    rays = _rays_padded(ray_o, ray_d, t_min, t_max, active, r, rp)
    nb = rp // BR
    n_inst = inst_aabb.shape[0]

    # --- prepass: block x instance world AABB slab -> bitmask [W, nb] ---
    eps = 1e-12
    tmin_nb = rays[6].reshape(1, nb, BR)
    tmax_nb = rays[7].reshape(1, nb, BR)
    t_lo = jnp.broadcast_to(tmin_nb, (n_inst, nb, BR))
    t_hi = jnp.broadcast_to(tmax_nb, (n_inst, nb, BR))
    for k in range(3):
        d_k = rays[3 + k]
        inv_k = (1.0 / jnp.where(jnp.abs(d_k) < eps,
                                 jnp.where(d_k < 0, -eps, eps), d_k)
                 ).reshape(1, nb, BR)
        o_k = rays[k].reshape(1, nb, BR)
        lo_k = (inst_aabb[:, k][:, None, None] - o_k) * inv_k
        hi_k = (inst_aabb[:, k + 3][:, None, None] - o_k) * inv_k
        t_lo = jnp.maximum(t_lo, jnp.minimum(lo_k, hi_k))
        t_hi = jnp.minimum(t_hi, jnp.maximum(lo_k, hi_k))
    hit_blk = jnp.any((t_lo <= t_hi) & (tmax_nb > 0.0), axis=2)  # [I, nb]
    w = (n_inst + 31) // 32
    pad_i = w * 32 - n_inst
    if pad_i:
        hit_blk = jnp.concatenate(
            [hit_blk, jnp.zeros((pad_i, nb), jnp.bool_)], axis=0)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    mask = (hit_blk.reshape(w, 32, nb).astype(jnp.uint32)
            * weights[None, :, None]).sum(axis=1, dtype=jnp.uint32)
    mask = jax.lax.bitcast_convert_type(mask, jnp.int32)         # [W, nb]

    coef = (coef48 if coef48 is not None and coef48.shape[1] > 0
            else mt_coef48(obj_planes, group=grp))
    kern = functools.partial(_mt_kernel_inst, num_inst=n_inst,
                             any_hit=any_hit, grp=grp)
    interpret = _interpret()
    t, idx, inst = pl.pallas_call(
        kern,
        grid=(nb,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((w, nb), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, BR), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec(inst_affine_inv.shape, lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(inst_group_span.shape, lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(obj_gaabb.shape, lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(coef.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BR), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BR), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BR), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, rp), jnp.float32),
            jax.ShapeDtypeStruct((1, rp), jnp.int32),
            jax.ShapeDtypeStruct((1, rp), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(mask, rays, inst_affine_inv, inst_group_span, obj_gaabb, coef)

    missed = idx[0, :r] < 0
    return {
        "t": jnp.where(missed, jnp.float32(INF), t[0, :r]),
        "tri": idx[0, :r],
        "inst": inst[0, :r],
    }


def _trace_instanced_xla(obj_planes, unit_inst, unit_group,
                         inst_affine_inv, ray_o, ray_d, t_min, t_max,
                         any_hit=False, active=None, grp: int = INST_GRP):
    """Compiled (non-Pallas) instanced brute force for CPU backends: scan
    over (instance, chunk-group) units; rays transformed per unit.
    Semantics == the instanced pallas kernel."""
    r = ray_o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    if active is not None:
        t_max = jnp.where(active, t_max, 0.0)
    unit = grp * CT
    tri = jnp.moveaxis(
        obj_planes.reshape(4, 3, obj_planes.shape[2] // unit, unit),
        2, 0)                                           # [NU_obj, 4, 3, unit]

    def body(carry, xs):
        t_best, idx_best, inst_best = carry
        inst_id, g = xs
        aff = inst_affine_inv[:, inst_id]               # [12]
        a = aff[:9].reshape(3, 3)
        bvec = aff[9:12]
        o = ray_o @ a.T + bvec
        d = ray_d @ a.T
        chunk = tri[g]
        v0 = chunk[0].T[None]
        e1 = chunk[1].T[None]
        e2 = chunk[2].T[None]
        valid_t = chunk[3, 0] > 0.5
        pvec = jnp.cross(d[:, None, :], e2)
        det = jnp.sum(e1 * pvec, -1)
        ok = jnp.abs(det) > _MT_EPS
        inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        tvec = o[:, None, :] - v0
        u = jnp.sum(tvec * pvec, -1) * inv
        qvec = jnp.cross(tvec, e1)
        v = jnp.sum(d[:, None, :] * qvec, -1) * inv
        t = jnp.sum(e2 * qvec, -1) * inv
        hit = (ok & valid_t[None] & (u >= 0) & (v >= 0) & (u + v <= 1)
               & (t > t_min[:, None]) & (t < t_max[:, None])
               & (t < t_best[:, None]))
        t_cand = jnp.where(hit, t, jnp.float32(INF))
        lane = jnp.argmin(t_cand, axis=1)
        rr = jnp.arange(r)
        t_new = t_cand[rr, lane]
        improved = t_new < t_best
        t_best = jnp.where(improved, t_new, t_best)
        idx_best = jnp.where(improved,
                             g * unit + lane.astype(jnp.int32), idx_best)
        inst_best = jnp.where(improved, inst_id, inst_best)
        return (t_best, idx_best, inst_best), None

    init = (jnp.full((r,), INF, jnp.float32),
            jnp.full((r,), -1, jnp.int32),
            jnp.full((r,), -1, jnp.int32))
    (t_best, idx_best, inst_best), _ = jax.lax.scan(
        body, init, (unit_inst, unit_group))
    missed = idx_best < 0
    return {"t": jnp.where(missed, jnp.float32(INF), t_best),
            "tri": idx_best, "inst": inst_best}
