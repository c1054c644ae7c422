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
    return applied
