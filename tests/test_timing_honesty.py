"""The bench timing window must be VALUE-anchored, not readiness-anchored.

r4 platform fact (PERF.md): jax 0.9's `block_until_ready` can return
before the dispatch executes over the axon tunnel - 8 full ReSTIR frames
"completed" in 13 ms, a 1734 Mrays/s fantasy headline. The fix anchors
every timing-window edge on a host-materialized VALUE
(utils/timing.sync_value). This test pins the fix against refactors:

  * both window edges of bench._measure_restir must go through
    sync_value (a spy counts the calls), and
  * the measured window must INCLUDE the time the closing value fetch
    takes to materialize (the spy delays the final fetch; a
    readiness-anchored loop - e.g. one that went back to
    block_until_ready, which a lying backend completes instantly -
    would close the window without it).
"""

import os
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DELAY_S = 1.5


def test_measure_window_includes_value_materialization(monkeypatch):
    sys.path.insert(0, REPO)
    import bench
    from tpu_raytracer.models import scenes
    from tpu_raytracer.utils import timing as timing_mod

    real = timing_mod.sync_value
    calls = []

    def spy(x):
        v = real(x)              # the genuine device->host value fetch
        calls.append(time.time())
        if len(calls) == 2:      # the window-closing anchor: simulate a
            time.sleep(DELAY_S)  # value that takes DELAY_S to materialize
        return v

    # a lying backend's readiness returns instantly - timing must not
    # notice the difference because nothing in the window may rely on it
    monkeypatch.setattr(timing_mod, "sync_value", spy)
    monkeypatch.setattr("jax.block_until_ready", lambda x: x)

    scene = scenes.create_cornell_box()
    r = bench._measure_restir(scene, 32, 32, warmup=1, measured=1)

    assert len(calls) == 2, "both timing edges must be value-anchored"
    measured_window_s = r["ms_per_frame"] / 1e3
    assert measured_window_s >= DELAY_S, (
        f"measured window {measured_window_s:.3f}s excludes the "
        f"{DELAY_S}s the closing value took to materialize - the "
        "window is readiness-anchored (the r4 fantasy-headline lie)")
