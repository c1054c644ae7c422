"""The VMEM fault-envelope clamp on kernel group widths.

A [BR, 4*CT*grp] f32 window product past ~8.4 MB FAULTS the Pallas
kernel on the axon tunnel, and a fault can wedge the tunnel for hours
(PERF.md r3) - so ANY mode string reaching the kernel dispatch, including
explicit TPU_RT_KERNEL A/B requests, must be clamped to the validated
envelope rather than allowed to fault. Kernels carrying 3x [BR, CT] f32
selection scratch (mxuv; mxus under TPU_RT_MXUS_V=1) get half the width.
"""

import pytest

from tpu_raytracer.ops import pallas_trace as pt


@pytest.fixture
def br(monkeypatch):
    def set_br(v):
        monkeypatch.setattr(pt, "BR", v)
    return set_br


def _bytes(mode, br_v, mxus_v=False):
    grp = pt._mode_grp(mode)
    win = br_v * 4 * pt.CT * grp * 4
    if mode.startswith("mxuv"):
        win += 3 * br_v * pt.CT * 4
    if mode.startswith("mxus") and mxus_v and pt._mxus_matrix_best_ok(grp):
        # matrix-best selection scratch, kept only when it fits
        win += 3 * br_v * pt.CT * 4
    return win


ENVELOPE = 512 * 8 * 4 * pt.CT * 4      # the validated 8.39 MB ceiling


@pytest.mark.parametrize("br_v", [256, 512, 1024, 2048, 4096])
@pytest.mark.parametrize(
    "mode", ["mxuf1", "mxuf2", "mxuf4", "mxuf8", "mxuv1", "mxuv2", "mxuv4",
             "any2", "any8", "mxus2", "mxus8", "mxuw2", "mxuw8"])
def test_capped_modes_fit_envelope(br, br_v, mode):
    br(br_v)
    capped = pt._vmem_cap_mode(mode)
    # window product (+ mxuv scratch) of whatever actually runs fits
    assert _bytes(capped, br_v) <= ENVELOPE, (mode, br_v, capped)
    # the clamp never WIDENS a request
    assert pt._mode_grp(capped) <= max(pt._mode_grp(mode), 1)


def test_defaults_unchanged_at_br1024(br):
    br(1024)
    assert pt._vmem_cap_mode("mxuf2") == "mxuf2"
    assert pt._vmem_cap_mode("mxuf4") == "mxuf4"
    assert pt._vmem_cap_mode("mxuv2") == "mxuv2"
    assert pt._vmem_cap_mode("any4") == "any4"
    assert pt._vmem_cap_mode("mxus4") == "mxus4"
    assert pt._vmem_cap_mode("vpu") == "vpu"
    assert pt._vmem_cap_mode("mxu3") == "mxu3"


def test_fault_combos_are_clamped(br):
    # the exact combo that faulted in the r3 bisect: 16.8 MB product
    br(1024)
    assert pt._vmem_cap_mode("mxuf8") == "mxuf4"
    br(2048)
    assert pt._vmem_cap_mode("mxuv2") == "mxuv1"
    br(4096)
    assert pt._vmem_cap_mode("mxuf2") == "mxuf1"
    # mxuv's scratch no longer fits at all: scratch-free fused fallback
    assert pt._vmem_cap_mode("mxuv1") == "mxuf1"


def test_mxus_halved_only_under_matrix_best(br, monkeypatch):
    br(1024)
    monkeypatch.delenv("TPU_RT_MXUS_V", raising=False)
    assert pt._vmem_cap_mode("mxus8") == "mxus4"
    monkeypatch.setenv("TPU_RT_MXUS_V", "1")
    assert pt._vmem_cap_mode("mxus8") == "mxus2"


@pytest.mark.parametrize("br_v", [256, 512, 1024, 2048, 4096])
@pytest.mark.parametrize("mode", ["mxus1", "mxus2", "mxus4", "mxus8"])
def test_mxus_matrix_best_total_fits_envelope(br, monkeypatch, br_v, mode):
    """Width clamping alone can't shrink the matrix-best scratch (it
    scales with BR, not grp) - the kernel must DROP matrix-best when the
    window + scratch pair would exceed the envelope, and whatever runs
    must fit. At BR=4096 even mxus1 + scratch is 14.7 MB - the class of
    allocation that faulted and wedged the tunnel in r3."""
    br(br_v)
    monkeypatch.setenv("TPU_RT_MXUS_V", "1")
    capped = pt._vmem_cap_mode(mode)
    assert _bytes(capped, br_v, mxus_v=True) <= ENVELOPE, (mode, br_v,
                                                           capped)


def test_matrix_best_dropped_when_scratch_overflows(br, monkeypatch):
    monkeypatch.setenv("TPU_RT_MXUS_V", "1")
    br(1024)
    assert pt._mxus_matrix_best_ok(2)          # 5.8 MB: keep
    br(2048)
    assert pt._mxus_matrix_best_ok(1)          # 7.3 MB: keep
    br(4096)
    assert not pt._mxus_matrix_best_ok(1)      # 14.7 MB: drop


def test_instanced_guard_rejects_overwide_br(br):
    br(4096)
    import jax.numpy as jnp
    import numpy as np

    planes, gaabb, spans = pt.pack_triangles_instanced(
        [(np.zeros((1, 3), np.float32), np.eye(3, dtype=np.float32)[:1],
          np.eye(3, dtype=np.float32)[1:2])])
    with pytest.raises(ValueError, match="fault envelope"):
        pt.trace_instanced_pallas(
            jnp.asarray(planes), jnp.asarray(gaabb),
            jnp.zeros((12, 1), jnp.float32), jnp.asarray(spans),
            jnp.zeros((1, 8), jnp.float32),
            jnp.zeros((8, 3), jnp.float32), jnp.ones((8, 3), jnp.float32),
            1e-3, 100.0)
