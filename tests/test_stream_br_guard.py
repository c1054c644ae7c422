"""Workload-aware block-size guard (PERF.md r5, config-6 regression).

TUNED.json's headline-optimal TPU_RT_BR=2048 halves the HBM-streamed
kernel's group width through the VMEM envelope (config 6: 0.70 -> 0.506
fps), so beyond-VMEM scenes must cap a TUNED-applied block size at the
streamed route's measured optimum - while an EXPLICIT user env is never
overridden.
"""

import importlib

from tpu_raytracer.ops import pallas_trace
from tpu_raytracer.utils import tuned


def _with_br(monkeypatch, br, tuned_applied):
    monkeypatch.setattr(pallas_trace, "BR", br)
    monkeypatch.setattr(tuned, "APPLIED",
                        {"TPU_RT_BR": str(br)} if tuned_applied else {})


def test_tuned_br_capped_for_streamed_scene(monkeypatch):
    _with_br(monkeypatch, 2048, tuned_applied=True)
    pallas_trace.maybe_cap_stream_br(pallas_trace.MXUF_MAX_TP + 128)
    assert pallas_trace.BR == pallas_trace.STREAM_BR_CAP


def test_tuned_br_capped_for_dense_vmem_scene(monkeypatch):
    # bunny-class: VMEM-resident but past the wide-dot chunk threshold
    # (config 3 measured 1.36 fps at BR1024 vs 1.26 at 2048)
    _with_br(monkeypatch, 2048, tuned_applied=True)
    pallas_trace.maybe_cap_stream_br(
        (pallas_trace.DENSE_CHUNKS + 1) * pallas_trace.CT)
    assert pallas_trace.BR == pallas_trace.STREAM_BR_CAP


def test_explicit_br_respected(monkeypatch):
    _with_br(monkeypatch, 2048, tuned_applied=False)
    pallas_trace.maybe_cap_stream_br(pallas_trace.MXUF_MAX_TP + 128)
    assert pallas_trace.BR == 2048


def test_sparse_scene_untouched(monkeypatch):
    # Cornell-class (11 chunks): the headline's own BR=2048 must survive
    _with_br(monkeypatch, 2048, tuned_applied=True)
    pallas_trace.maybe_cap_stream_br(
        pallas_trace.DENSE_CHUNKS * pallas_trace.CT)
    assert pallas_trace.BR == 2048


def test_apply_tuned_syncs_imported_pallas_trace(tmp_path, monkeypatch):
    import json

    p = tmp_path / "TUNED.json"
    p.write_text(json.dumps({"env": {"TPU_RT_BR": "2048"}}))
    monkeypatch.delenv("TPU_RT_BR", raising=False)
    monkeypatch.delenv("TPU_RT_TUNED", raising=False)
    monkeypatch.setattr(tuned, "APPLIED", {})
    monkeypatch.setattr(pallas_trace, "BR", 1024)
    applied = tuned.apply_tuned(str(p))
    assert applied == {"TPU_RT_BR": "2048"}
    assert pallas_trace.BR == 2048          # synced despite prior import
    assert "TPU_RT_BR" in tuned.APPLIED
    monkeypatch.delenv("TPU_RT_BR", raising=False)


def test_tuned_br_capped_for_instanced_scene(monkeypatch):
    # gallery-class: small object-space table but instanced sweeps
    # (config 7 measured 0.461 fps at BR1024 vs 0.326 at tuned 2048)
    _with_br(monkeypatch, 2048, tuned_applied=True)
    pallas_trace.maybe_cap_stream_br(40 * pallas_trace.CT, instanced=True)
    assert pallas_trace.BR == pallas_trace.STREAM_BR_CAP
