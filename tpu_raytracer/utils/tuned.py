"""On-chip-tuned default gates (TUNED.json).

The TPU_RT_* env gates (CLAUDE.md) select between BIT-IDENTICAL or
winner-equal kernel/layout variants whose relative speed can only be
settled on real hardware. The measurement ladder (scripts/r3_measure.sh)
A/Bs them; `scripts/r4_autoflip.py` records the best MEASURED step's
exact env set in `TUNED.json` at the repo root. Product entry points
(bench.py, `python -m tpu_raytracer`, __graft_entry__.py) call
`apply_tuned()` before the first jit trace, so driver benches and the
app pick up measured winners even when no interactive session is alive
to flip code defaults by hand.

Semantics:
  * `os.environ.setdefault` only - an explicit env var ALWAYS wins;
  * `TPU_RT_TUNED=0` disables the whole mechanism;
  * tests never call this (conftest does not), so test-suite gate
    defaults stay the committed code defaults.

This is the TPU analogue of a driver picking its best measured
dispatch configuration; provenance (step name, measured value,
baseline) is stored alongside the env set for the honest record.
"""

from __future__ import annotations

import json
import os

_ALLOWED_PREFIX = "TPU_RT_"

# Keys apply_tuned actually set this process (vs explicit user env).
# Workload-aware guards consult this: a TUNED default may be overridden
# per scene class (pallas_trace.maybe_cap_stream_br), an explicit user
# env never is.
APPLIED: dict = {}


def apply_tuned(path: str | None = None) -> dict:
    """setdefault the TUNED.json env set; returns what was applied."""
    if os.environ.get("TPU_RT_TUNED", "1") == "0":
        return {}
    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), "TUNED.json")
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}
    applied = {}
    for k, v in dict(data.get("env", {})).items():
        if not k.startswith(_ALLOWED_PREFIX):   # never touch non-gate env
            continue
        if os.environ.setdefault(k, str(v)) == str(v):
            applied[k] = str(v)
    APPLIED.update(applied)
    if "TPU_RT_BR" in applied:
        # The block-rays module constant is read at pallas_trace IMPORT;
        # entry points that import the package before calling apply_tuned
        # (the app: `from .app import interactive` runs first) would
        # silently keep the default - sync it so TUNED BR always lands.
        # (Kernels resolve the global at TRACE time, so this is safe
        # before the first trace.)
        import sys
        m = sys.modules.get("tpu_raytracer.ops.pallas_trace")
        if m is not None:
            m.BR = int(os.environ["TPU_RT_BR"])
    return applied
