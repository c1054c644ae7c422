"""Post-ladder unattended gate flip: measured winners -> TUNED.json.

Reads the measurement ladder's logs (/tmp/r3m, scripts/r3_measure.sh),
considers ONLY plain-headline bench steps (metric
cornell_restir_512x512_mrays_per_s_per_chip - config runs and ucb
sweeps are different workloads), and if the best step beats the
committed-defaults step 00 by more than --margin (default 2%), writes
its EXACT env set (parsed from r3_measure.sh itself, so the adopted
combination is always one that actually ran and passed its post-step
health probe) to TUNED.json with provenance, then commits.

Run by scripts/r4_watch.sh when the ladder finishes; safe to re-run by
hand any time (pure log parsing + one file write).
"""

import argparse
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HEADLINE_METRIC = "cornell_restir_512x512_mrays_per_s_per_chip"
# gates an unattended flip may NEVER adopt: tap_batch advances the
# reservoir-update draw at the visibility test, so its RNG stream
# diverges from the reference whenever a tap is blocked (ops/restir.py
# tap_batch note) - a parity decision for a human, not a hook
PARITY_UNSAFE = {"TPU_RT_TAP_BATCH"}
# gates the Mrays/s comparator CANNOT judge: GB_REUSE skips the primary
# sweep's rays on static frames, so rays/s PENALIZES a wall-clock win
# (r4: 12.69 Mrays but 4.77 fps vs 4.60). The honest comparator there is
# fps - reported for a human, excluded from unattended Mrays adoption.
RAYS_METRIC_INVALID = {"TPU_RT_GB_REUSE"}


def parse_step_envs(ladder_sh: str) -> dict:
    """step name -> {env: value} for plain `python bench.py` steps."""
    envs = {}
    pat = re.compile(r"^run\s+(\S+)\s+((?:[A-Z0-9_]+=\S+\s+)*)python bench\.py\s*$")
    for line in open(ladder_sh):
        m = pat.match(line.strip())
        if m:
            name, env_s = m.group(1), m.group(2)
            envs[name] = dict(kv.split("=", 1) for kv in env_s.split())
    return envs


def read_headline(path: str):
    value, fps = None, None
    for line in open(path, errors="replace"):
        line = line.strip()
        if line.startswith("{") and HEADLINE_METRIC in line:
            try:
                js = json.loads(line)
            except json.JSONDecodeError:
                continue
            if js.get("metric") == HEADLINE_METRIC:
                value = js.get("value")
                fps = js.get("detail", {}).get("fps")
    return value, fps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/r3m")
    ap.add_argument("--margin", type=float, default=0.02)
    ap.add_argument("--no-commit", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "TUNED.json"))
    ap.add_argument("--ladder",
                    default=(os.path.join(REPO, "scripts/r5_measure.sh") + ","
                             + os.path.join(REPO, "scripts/r5b_measure.sh")),
                    help="comma-separated ladder scripts whose step names "
                         "define env sets")
    args = ap.parse_args()

    step_envs = {}
    for ladder in args.ladder.split(","):
        if os.path.exists(ladder):
            step_envs.update(parse_step_envs(ladder))
    results, fps_only = {}, {}
    for path in sorted(glob.glob(os.path.join(args.dir, "[0-9]*.log"))):
        name = os.path.basename(path)[:-4]
        if name not in step_envs:
            continue
        if PARITY_UNSAFE & set(step_envs[name]):
            continue
        v, fps = read_headline(path)
        if not (isinstance(v, (int, float)) and v > 0):
            continue
        if RAYS_METRIC_INVALID & set(step_envs[name]):
            fps_only[name] = (float(v), fps)   # human decision, fps-based
            continue
        results[name] = float(v)
    for name, (v, fps) in sorted(fps_only.items()):
        print(f"  [fps-comparator only] {name}: {v} Mrays/s, {fps} fps "
              f"(ray-skipping gate - not adoptable on Mrays/s)")
    if "00_headline_default" not in results:
        print("no committed-defaults headline measurement; not flipping")
        return 1
    base = results["00_headline_default"]
    best = max(results, key=results.get)
    print("measured headline steps:")
    for k in sorted(results, key=results.get, reverse=True):
        print(f"  {k:34s} {results[k]:8.2f} Mrays/s  env={step_envs[k]}")
    if best == "00_headline_default" or \
            results[best] < base * (1.0 + args.margin):
        print(f"defaults win (best {best} = {results[best]:.2f} vs "
              f"base {base:.2f}, margin {args.margin:.0%}); not flipping")
        # an explicit empty TUNED.json records that the decision RAN
        out = {"env": {}, "from_step": "00_headline_default",
               "value": base, "baseline": base,
               "note": "committed defaults measured best"}
    else:
        out = {"env": step_envs[best], "from_step": best,
               "value": results[best], "baseline": base,
               "note": f"+{(results[best]/base - 1):.1%} vs committed "
                       "defaults on the measured headline"}
        print(f"flipping to {best}: {step_envs[best]} "
              f"({base:.2f} -> {results[best]:.2f} Mrays/s)")
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    if not args.no_commit and os.path.dirname(os.path.abspath(args.out)) == REPO:
        subprocess.run(["git", "-C", REPO, "add", args.out], check=True)
        msg = (f"Adopt measured headline winner {out['from_step']} as tuned "
               f"defaults ({out['baseline']} -> {out['value']} Mrays/s)")
        # --only: an unattended commit must never sweep up unrelated
        # staged files from an interrupted interactive session
        subprocess.run(["git", "-C", REPO, "commit", "-m", msg,
                        "-m", "Automated post-ladder flip "
                        "(scripts/r4_autoflip.py); env set is exactly the "
                        "measured step's, applied via utils/tuned.py "
                        "setdefault so explicit env always wins.",
                        "--only", "--", os.path.basename(args.out)],
                       check=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
