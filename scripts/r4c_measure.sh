#!/bin/bash
# Post-serial-gather-fix re-measurement ladder (round 4, late).
#
# Context: the r4 A/B ladder ran BEFORE the jax-0.9 serial-gather fix
# (views.py read_cols_x2), when every headline variant was drowned under
# ~680 ms/frame of serial per-lane gather - differences between gates
# were invisible and autoflip correctly kept defaults (3.28 Mrays/s).
# The fix took the measured headline to 13.31 Mrays/s, so the gate A/Bs
# are worth re-measuring: the sweeps (~115 ms) and gathers they target
# are now the majority of the frame again.
#
# Step NAMES match scripts/r3_measure.sh so r4_autoflip.py can map env
# sets. Same harness semantics as r4_measure.sh: STOP file, deadline,
# blackouts, post-step health probe. Shorter per-step timeout (1500 s):
# late-round steps must never straddle the driver's end-of-round bench.
set -u
cd /root/repo
mkdir -p /tmp/r3m
# Never contend with an in-flight interactive bench run.
if [ -f /tmp/bench.pid ]; then
  bp=$(cat /tmp/bench.pid)
  while [ -n "$bp" ] && kill -0 "$bp" 2>/dev/null; do sleep 20; done
fi
# The interactive defaults run doubles as the autoflip baseline.
if [ -f /tmp/r3m/00_headline_postfix.log ] && [ ! -f /tmp/r3m/00_headline_default.log ]; then
  cp /tmp/r3m/00_headline_postfix.log /tmp/r3m/00_headline_default.log
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
      if [ "$now" -lt "$b_end" ] && [ "$now" -ge $((b_start - 1500)) ]; then
        echo "=== $name WAITING out driver-bench blackout ($b_start-$b_end) ==="
        while [ "$(date +%s)" -lt "$b_end" ]; do sleep 60; done
      fi
    done < /tmp/r3m/BLACKOUT
  fi
  echo "=== $name: $* ==="
  timeout 1500 env TPU_RT_TUNED=0 "$@" >"/tmp/r3m/${name}.log" 2>&1
  echo "=== $name rc=$? ==="
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
      grep -h -E '"metric"|"config"|Mrays|ms  t_agree| ms,|t_agree' "$f" | tail -12
    done
  } | tee /tmp/r3m/SUMMARY
}
# 1. Post-fix diagnostic: where the 219 ms frame goes now (cached compile)
run 14_profile_default        python scripts/ucb_profile.py --frames 3
# 2. Highest-information headline A/Bs (each pays a fresh compile)
run 08f_headline_combo_all    TPU_RT_KERNEL=mxuv2 TPU_RT_OHG=1 TPU_RT_HIST_QUAD=1 TPU_RT_GATHER_T=1 TPU_RT_GB_REUSE=1 python bench.py
run 05_headline_combo         TPU_RT_KERNEL=mxuv2 TPU_RT_OHG=1 python bench.py
run 08e_headline_gbreuse      TPU_RT_GB_REUSE=1 python bench.py
run 04_headline_ohg           TPU_RT_OHG=1 python bench.py
run 08c_headline_histquad     TPU_RT_HIST_QUAD=1 python bench.py
# 3. BASELINE configs with committed defaults (post-fix numbers)
run 17_config4                python bench.py --config 4
run 15_config1                python bench.py --config 1
run 13_config3_default        python bench.py --config 3
run 18_config5                python bench.py --config 5
run 19_config6_LAST           python bench.py --config 6
summary
echo "LADDER DONE $(date)" | tee /tmp/r3m/DONE
