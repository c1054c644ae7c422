#!/bin/bash
# Round-3 on-chip measurement ladder. Ordered SAFEST FIRST - a kernel
# fault can wedge the axon tunnel for hours (PERF.md r3 hazard note), so
# known-good defaults run before new kernels, and the previously-faulting
# dense-knot config runs last. One process on the chip at a time; every
# step is timeout-bounded and logged to /tmp/r3m/. After every step a
# trivial-dispatch health probe runs: if the tunnel is wedged, the ladder
# ABORTS (writes /tmp/r3m/ABORTED) instead of burning 40 min of timeout
# per remaining step against a dead chip.
set -u
cd /root/repo
mkdir -p /tmp/r3m
# deadline semantics: /tmp/r3m/DEADLINE (epoch secs) stops NEW steps so
# the driver's round-end bench gets an idle chip. A deadline already in
# the past when the ladder STARTS is stale (left over from a previous
# round while the tunnel was down) - binding to it would skip every
# step; ignore it instead.
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
  # optional wall-clock deadline (see top): the driver runs its own
  # bench at round end and two processes on the chip make timings lie -
  # stop starting new steps once past a deadline that was still ahead
  # of us when the ladder started
  if [ -n "$DEADLINE" ] && [ "$(date +%s)" -gt "$DEADLINE" ]; then
    echo "=== $name SKIPPED (past deadline) ==="
    return
  fi
  # graceful stop: killing a python mid-dispatch wedges the tunnel at
  # the claim leg (r4), so an operator stops the ladder BETWEEN steps
  # with `touch /tmp/r3m/STOP` - never by killing the running step
  if [ -f /tmp/r3m/STOP ]; then
    echo "=== $name STOPPED (operator /tmp/r3m/STOP) ==="
    echo "STOPPED by operator $(date)" | tee /tmp/r3m/ABORTED
    summary
    exit 0
  fi
  # blackout windows (/tmp/r3m/BLACKOUT, lines "START END" epoch secs):
  # known driver-bench slots. Unlike the deadline, a blackout does not
  # end the ladder - steps WAIT the window out. A step is also not
  # started if its 2400 s timeout could still be running when the
  # window opens (the driver's bench needs the chip idle, not merely
  # no new launches).
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
  # TPU_RT_TUNED=0: ladder steps measure EXACTLY their explicit env set -
  # a committed TUNED.json (scripts/r4_autoflip.py) must never leak into
  # an A/B step, or step 00 stops meaning "committed defaults"
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
# Headline A/B benches FIRST (the gate-flip decisions); the slower
# ucb kernel/mxus sweep scripts follow - if the chip returns late in
# the round, the decision-relevant numbers land before the deadline.
run 00_headline_default       python bench.py
run 03_headline_mxuv          TPU_RT_KERNEL=mxuv2 python bench.py
run 04_headline_ohg           TPU_RT_OHG=1 python bench.py
run 05_headline_combo         TPU_RT_KERNEL=mxuv2 TPU_RT_OHG=1 python bench.py
run 05b_headline_noworklist   TPU_RT_NO_WORKLIST=1 python bench.py
run 05c_headline_nwl_mxuv     TPU_RT_NO_WORKLIST=1 TPU_RT_KERNEL=mxuv2 python bench.py
run 08_headline_tapbatch      TPU_RT_TAP_BATCH=1 python bench.py
run 08b_headline_gather_t     TPU_RT_GATHER_T=1 python bench.py
run 08c_headline_histquad     TPU_RT_HIST_QUAD=1 python bench.py
run 08d_headline_nolastskip   TPU_RT_LAST_SKIP=0 python bench.py
run 08e_headline_gbreuse      TPU_RT_GB_REUSE=1 python bench.py
# pre-planned everything-on combo: if the individual A/Bs above are
# positive they are most likely composable - this records the composed
# headline without waiting for a by-hand follow-up run
run 08f_headline_combo_all    TPU_RT_KERNEL=mxuv2 TPU_RT_OHG=1 TPU_RT_HIST_QUAD=1 TPU_RT_GATHER_T=1 TPU_RT_GB_REUSE=1 python bench.py
run 01_kern_cornell           python scripts/ucb_kern.py
run 02_kern_bunny             python scripts/ucb_kern.py --bunny
# FIRST streamed-kernel contact is the tiny forced-early-exit canary
# (VERDICT r3 item 2): the r3 DMA-drain fix is unprovable off-chip and
# a fault here costs seconds of banked evidence, not the round
run 05z_mxus_canary           python scripts/ucb_mxus_canary.py
run 06_mxus_default           python scripts/ucb_mxus.py
run 07_mxus_matrix            TPU_RT_MXUS_V=1 python scripts/ucb_mxus.py
run 12_mxus_grpcull           TPU_RT_GRP_CULL=1 python scripts/ucb_mxus.py
run 13_config3_default        python bench.py --config 3
run 14_profile_default        python scripts/ucb_profile.py --frames 3
# per-stage profile under the combo gates too: PERF.md needs a fresh
# per-stage table for whatever defaults get flipped, and a short chip
# window may not allow a by-hand follow-up pass
run 14b_profile_combo         TPU_RT_KERNEL=mxuv2 TPU_RT_OHG=1 TPU_RT_HIST_QUAD=1 TPU_RT_GATHER_T=1 python scripts/ucb_profile.py --frames 3
# BASELINE configs with committed defaults (gate flips re-run by hand
# from the A/B results above). Config 6 is DEAD LAST: its dense-knot
# streamed sweep is what faulted pre-fix - if it wedges the tunnel,
# everything above is already recorded.
run 15_config1                python bench.py --config 1
run 16_config2                python bench.py --config 2
run 17_config4                python bench.py --config 4
# per-stage profile of the config-4 flow itself (1080p, motion + crystal
# refit + accum reset): the VERDICT r3 item-3 attack needs to know where
# the 1080p moving frame actually goes, not the 512^2 static one
run 17b_profile_config4       python scripts/ucb_profile.py --config4 --frames 3
run 18_config5                python bench.py --config 5
# BR escalation probes the edge of the VMEM fault envelope - run them
# only after every default-BR number is already on disk (a fault here
# wedges the tunnel; steps below it are already the risky tail)
run 09_headline_br2048        TPU_RT_BR=2048 python bench.py
run 10_headline_br2048_mxuv1  TPU_RT_BR=2048 TPU_RT_KERNEL=mxuv1 python bench.py
# config 4 is 1080p (8x the headline's rays -> 8x the programs/sweep at
# a given BR); its best block size may sit above the headline's 1024 -
# probe it once BR=2048 has proven safe on the headline step above
run 10b_config4_br2048        TPU_RT_BR=2048 python bench.py --config 4
run 11_headline_br4096_mxuf1  TPU_RT_BR=4096 TPU_RT_KERNEL=mxuf1 python bench.py
# instanced-gallery bench (VERDICT r3 item 6: first on-chip number for
# trace_instanced_pallas). A NEW kernel on-chip -> runs in the risky
# tail, after every default-BR number is banked.
run 18b_config7_instanced     python bench.py --config 7
run 19_config6_LAST           python bench.py --config 6
# gallery artifact (same workload class as config 6; aborts with it if
# the streamed sweep wedges the tunnel). Too slow for CPU (>28 min).
run 20_gallery_knot           python scripts/render_restir.py --scene knot --size 256 --frames 32 --out gallery/dense_knot_textured.png
# showcase renders of the r4 procedural named-scene assets (real loader
# path end-to-end); cheap scenes, but keep them after the banked numbers
# beyond-512k intersector decision (swept coarse-cull path vs BVH walk
# at ~983k tris; settles TPU_RT_BRUTE_MAX). A never-run-on-chip workload
# size -> riskiest slot of all, DEAD LAST among kernels.
run 25_bigscene_1M            python scripts/ucb_bigscene.py
run 21_gallery_truffle        python scripts/render_restir.py --scene truffle --size 256 --frames 32 --out gallery/truffle_showcase.png
run 22_gallery_vrm            python scripts/render_restir.py --scene vrm --size 256 --frames 32 --out gallery/vrm_figure.png
run 23_gallery_helmet         python scripts/render_restir.py --scene helmet --size 256 --frames 32 --out gallery/damaged_helmet.png
run 24_gallery_avocado        python scripts/render_restir.py --scene avocado --size 256 --frames 32 --out gallery/avocado.png
summary
echo "LADDER DONE $(date)" | tee /tmp/r3m/DONE
