"""Summarize the measurement ladder's results into a decision table.

Reads /tmp/r3m/*.log (scripts/r3_measure.sh output), extracts each step's
headline JSON line (bench.py) or final timing lines (ucb scripts), and
prints a table sorted by Mrays/s so gate flips are a read-off, not a
log-dig. Pure host-side parsing - safe to run any time.

Usage: python scripts/r3_flip_table.py [--dir /tmp/r3m]
"""

import argparse
import glob
import json
import os
import re


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/r3m")
    args = ap.parse_args()

    bench_rows = []
    other = []
    for path in sorted(glob.glob(os.path.join(args.dir, "[0-9]*.log"))):
        name = os.path.basename(path)[:-4]
        text = open(path, errors="replace").read()
        js = None
        for line in text.splitlines():
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                try:
                    js = json.loads(line)
                except json.JSONDecodeError:
                    pass
        if js is not None:
            det = js.get("detail", {})
            bench_rows.append((name, js.get("value"), js.get("unit", ""),
                               det.get("fps"), js.get("metric", "")))
            continue
        # ucb scripts: keep their per-mode timing lines
        keep = [ln for ln in text.splitlines()
                if re.search(r"\d+\.\d+ ms|t_agree|Mrays", ln)]
        other.append((name, keep[-10:]))

    if bench_rows:
        print(f"{'step':34s} {'value':>10s} {'unit':10s} {'fps':>7s}")
        for name, value, unit, fps, metric in sorted(
                bench_rows, key=lambda r: -(r[1] or 0.0)):
            fps_s = f"{fps:.2f}" if isinstance(fps, (int, float)) else "-"
            print(f"{name:34s} {value!s:>10s} {unit:10s} {fps_s:>7s}")
    for name, lines in other:
        print(f"\n--- {name}")
        for ln in lines:
            print("   ", ln)
    aborted = os.path.join(args.dir, "ABORTED")
    if os.path.exists(aborted):
        print("\n!! LADDER ABORTED:", open(aborted).read().strip())


if __name__ == "__main__":
    main()
