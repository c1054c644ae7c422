#!/bin/bash
# Round-4 CURATED measurement ladder - the jax 0.9 toolchain upgrade
# regressed the honest headline ~3x (10.2 -> 3.28 Mrays/s, see PERF.md),
# which invalidates the r3 A/B priorities; and each step now pays a
# ~17 min uncached compile, so the full r3_measure.sh order cannot fit a
# round. This ladder runs the DIAGNOSTIC first (per-stage profile), then
# the highest-information headline A/Bs, then BASELINE configs, then the
# risky kernel tail. Step NAMES match r3_measure.sh so r4_autoflip.py
# can map env sets. Same harness semantics: safest first, STOP file,
# deadline, blackouts, post-step health probe.
set -u
cd /root/repo
mkdir -p /tmp/r3m
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
      if [ "$now" -lt "$b_end" ] && [ "$now" -ge $((b_start - 2400)) ]; then
        echo "=== $name WAITING out driver-bench blackout ($b_start-$b_end) ==="
        while [ "$(date +%s)" -lt "$b_end" ]; do sleep 60; done
      fi
    done < /tmp/r3m/BLACKOUT
  fi
  echo "=== $name: $* ==="
  timeout 2400 env TPU_RT_TUNED=0 "$@" >"/tmp/r3m/${name}.log" 2>&1
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
# 1. DIAGNOSTIC first: where does the jax-0.9 frame actually spend time
run 14_profile_default        python scripts/ucb_profile.py --frames 3
# 2. headline A/Bs, highest expected information first
run 04_headline_ohg           TPU_RT_OHG=1 python bench.py
run 05_headline_combo         TPU_RT_KERNEL=mxuv2 TPU_RT_OHG=1 python bench.py
run 05b_headline_noworklist   TPU_RT_NO_WORKLIST=1 python bench.py
run 08f_headline_combo_all    TPU_RT_KERNEL=mxuv2 TPU_RT_OHG=1 TPU_RT_HIST_QUAD=1 TPU_RT_GATHER_T=1 TPU_RT_GB_REUSE=1 python bench.py
# 3. BASELINE configs with committed defaults
run 13_config3_default        python bench.py --config 3
run 17_config4                python bench.py --config 4
run 17b_profile_config4       python scripts/ucb_profile.py --config4 --frames 3
run 15_config1                python bench.py --config 1
run 18_config5                python bench.py --config 5
run 16_config2                python bench.py --config 2
# 4. remaining single-gate headline A/Bs (aggregate already covered by 08f)
run 08b_headline_gather_t     TPU_RT_GATHER_T=1 python bench.py
run 08c_headline_histquad     TPU_RT_HIST_QUAD=1 python bench.py
run 08d_headline_nolastskip   TPU_RT_LAST_SKIP=0 python bench.py
run 08e_headline_gbreuse      TPU_RT_GB_REUSE=1 python bench.py
# 5. risky kernel tail: streamed canary FIRST, then dense scenes
run 05z_mxus_canary           python scripts/ucb_mxus_canary.py
run 06_mxus_default           python scripts/ucb_mxus.py
run 18b_config7_instanced     python bench.py --config 7
run 19_config6_LAST           python bench.py --config 6
run 01_kern_cornell           python scripts/ucb_kern.py
run 09_headline_br2048        TPU_RT_BR=2048 python bench.py
run 25_bigscene_1M            python scripts/ucb_bigscene.py
run 20_gallery_knot           python scripts/render_restir.py --scene knot --size 256 --frames 32 --out gallery/dense_knot_textured.png
run 21_gallery_truffle        python scripts/render_restir.py --scene truffle --size 256 --frames 32 --out gallery/truffle_showcase.png
run 22_gallery_vrm            python scripts/render_restir.py --scene vrm --size 256 --frames 32 --out gallery/vrm_figure.png
summary
echo "LADDER DONE $(date)" | tee /tmp/r3m/DONE
