#!/bin/bash
# Round-5 on-chip measurement ladder: the dark rows of the r4 matrix.
#
# Ordering (safest + decision-relevant first; risky tail DEAD LAST):
#   1. committed-defaults baseline as an ACTUAL step (ADVICE r4: never
#      trust a copied interactive log as the autoflip baseline).
#   2. headline gate combos that never produced a number in r4
#      (mxuv2+HIST_QUAD - both won alone; mxuv2+OHG; all-on) plus the
#      still-unmeasured singles (GATHER_T) and mxuv2+GB_REUSE (decide
#      GB_REUSE with the fps comparator, VERDICT r4 item 8).
#   3. mxus DMA-drain canary EARLY (hours of recovery margin if it
#      wedges the tunnel - the r3 fix is unprovable off-chip).
#   4. config 2 (no number since r2) + the 1080p config-4 profile the
#      round-5 attack must be aimed by.
#   5. BR=2048 under mxuv2 (the per-call-floor lever, VERDICT item 4).
#   6. risky tail: config 6 (dense knot, the workload that faulted in
#      r3), config 7 (first on-chip instanced number), ~1M-tri routing
#      A/B (sets TPU_RT_BRUTE_MAX). Any of these can wedge the tunnel
#      for hours - every decision-relevant number is banked first.
#
# Harness semantics match r3_measure.sh: STOP file, DEADLINE (stale-
# ignored), BLACKOUT windows, TPU_RT_TUNED=0 per step, post-step health
# probe, ABORT on unhealthy tunnel. Logs go to /tmp/r3m (the operator
# archives the previous round's logs before arming - r5_rearm.sh does).
set -u
cd /root/repo
mkdir -p /tmp/r3m
# Never contend with an in-flight interactive bench run - but bound the
# wait and verify the PID is really a bench (ADVICE r4: a stale pidfile
# whose PID was reused blocks the ladder forever).
if [ -f /tmp/bench.pid ]; then
  bp=$(cat /tmp/bench.pid)
  waited=0
  while [ -n "$bp" ] && kill -0 "$bp" 2>/dev/null \
        && grep -qa 'bench\|ucb_\|render_restir' "/proc/$bp/cmdline" 2>/dev/null; do
    sleep 20; waited=$((waited + 20))
    if [ "$waited" -ge 1800 ]; then
      echo "bench.pid $bp still alive after 30 min - proceeding anyway"
      break
    fi
  done
fi
LADDER_T0=$(date +%s)
DEADLINE=""
if [ -f /tmp/r3m/DEADLINE ]; then
  DEADLINE=$(cat /tmp/r3m/DEADLINE)
  if [ "$LADDER_T0" -gt "$DEADLINE" ]; then
    echo "stale deadline $DEADLINE ignored (ladder start $LADDER_T0)"
    DEADLINE=""
  fi
fi
health() {
  timeout 300 python -c "
import jax, jax.numpy as jnp
print(jnp.sum(jnp.arange(8.0)).block_until_ready())" \
    >>/tmp/r3m/health.log 2>&1
}
run() {
  local name="$1"; shift
  if [ -n "$DEADLINE" ] && [ "$(date +%s)" -gt "$DEADLINE" ]; then
    echo "=== $name SKIPPED (past deadline) ==="
    return
  fi
  if [ -f /tmp/r3m/STOP ]; then
    echo "=== $name STOPPED (operator /tmp/r3m/STOP) ==="
    echo "STOPPED by operator $(date)" | tee /tmp/r3m/ABORTED
    summary
    exit 0
  fi
  if [ -f /tmp/r3m/BLACKOUT ]; then
    while read -r b_start b_end; do
      [ -n "${b_start:-}" ] && [ -n "${b_end:-}" ] || continue
      now=$(date +%s)
      if [ "$now" -lt "$b_end" ] && [ "$now" -ge $((b_start - 1800)) ]; then
        echo "=== $name WAITING out driver-bench blackout ($b_start-$b_end) ==="
        while [ "$(date +%s)" -lt "$b_end" ]; do sleep 60; done
      fi
    done < /tmp/r3m/BLACKOUT
  fi
  echo "=== $name: $* $(date -u +%H:%M:%S) ==="
  timeout 1800 env TPU_RT_TUNED=0 "$@" >"/tmp/r3m/${name}.log" 2>&1
  echo "=== $name rc=$? $(date -u +%H:%M:%S) ==="
  if ! health; then
    echo "TUNNEL UNHEALTHY after $name $(date)" | tee /tmp/r3m/ABORTED
    summary
    exit 1
  fi
}
summary() {
  {
    echo "=== SUMMARY $(date) ==="
    for f in /tmp/r3m/[0-9]*.log; do
      echo "--- $(basename "$f")"
      grep -h -E '"metric"|"config"|Mrays|ms  t_agree| ms,|t_agree|BRUTE_MAX|canary' "$f" | tail -12
    done
  } | tee /tmp/r3m/SUMMARY
}
# --- 1. baseline + headline combos (cheap, highest information) -------
run 00_headline_default       python bench.py
run 03_headline_mxuv          TPU_RT_KERNEL=mxuv2 python bench.py
run 03b_headline_mxuv_hq      TPU_RT_KERNEL=mxuv2 TPU_RT_HIST_QUAD=1 python bench.py
run 08b_headline_gather_t     TPU_RT_GATHER_T=1 python bench.py
run 03c_headline_mxuv_hq_gt   TPU_RT_KERNEL=mxuv2 TPU_RT_HIST_QUAD=1 TPU_RT_GATHER_T=1 python bench.py
run 05_headline_combo         TPU_RT_KERNEL=mxuv2 TPU_RT_OHG=1 python bench.py
run 08f_headline_combo_all    TPU_RT_KERNEL=mxuv2 TPU_RT_OHG=1 TPU_RT_HIST_QUAD=1 TPU_RT_GATHER_T=1 TPU_RT_GB_REUSE=1 python bench.py
run 03d_headline_mxuv_gbreuse TPU_RT_KERNEL=mxuv2 TPU_RT_GB_REUSE=1 python bench.py
# --- 2. mxus canary EARLY (recovery margin if it wedges) --------------
run 05z_mxus_canary           python scripts/ucb_mxus_canary.py
# --- 3. the dark config numbers + the profile that aims round 5 ------
run 16_config2                TPU_RT_KERNEL=mxuv2 python bench.py --config 2
run 17b_profile_config4       TPU_RT_KERNEL=mxuv2 python scripts/ucb_profile.py --config4 --frames 3
run 17_config4_mxuv           TPU_RT_KERNEL=mxuv2 python bench.py --config 4
run 13_config3_mxuv           TPU_RT_KERNEL=mxuv2 python bench.py --config 3
# --- 4. BR escalation under mxuv2 (per-call-floor lever; inside the
#        VMEM clamp envelope but still the edge - after configs) -------
run 09b_headline_br2048_mxuv  TPU_RT_BR=2048 TPU_RT_KERNEL=mxuv2 python bench.py
run 10b_config4_br2048        TPU_RT_BR=2048 TPU_RT_KERNEL=mxuv2 python bench.py --config 4
# --- 5. risky tail: never-completed dense/instanced workloads ---------
run 19_config6                python bench.py --config 6
run 18b_config7_instanced     python bench.py --config 7
run 25_bigscene_1M            python scripts/ucb_bigscene.py
summary
echo "LADDER DONE $(date)" | tee /tmp/r3m/DONE
