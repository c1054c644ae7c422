"""bench.py watchdog: a wedged tunnel must yield an honest JSON error
line, never silence.

r3 proved the init watchdog (BENCH_r03.json records the 600 s error line
instead of nothing). The mid-run timer covers the OTHER observed wedge
mode: a healthy init followed by every dispatch hanging (post-fault
axon behavior, PERF.md r3 hazard note). Subprocess test: force CPU
(TPU_RT_CPU=1 - the axon plugin ignores JAX_PLATFORMS), shrink the
run timer below the 512^2 headline compile time, and assert the
emitted line is driver-parseable.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_midrun_watchdog_emits_parseable_error_line():
    env = dict(os.environ)
    env.update({
        "TPU_RT_CPU": "1",          # real backend init, no tunnel
        "BENCH_WATCHDOG_S": "1",    # fires long before the CPU compile ends
        "TPU_RT_TUNED": "0",
    })
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=600, cwd=REPO)
    assert proc.returncode == 4, (proc.returncode, proc.stdout, proc.stderr)
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1, proc.stdout
    out = json.loads(lines[0])
    assert out["value"] == 0.0
    assert out["metric"] == "cornell_restir_512x512_mrays_per_s_per_chip"
    assert "wedged mid-run" in out["error"]
