#!/bin/bash
# Round-5 follow-up ladder: runs AFTER r5_measure.sh finishes.
#   - re-baselines step 00 on an idle box (both r5 attempts at 00 were
#     depressed by interactive CPU contention - one-core box);
#   - first on-chip run of the restored true-4K config 5 (sequential
#     row-band pipeline, pipeline.render_frame_banded);
#   - confirms the shipping TUNED.json headline through the exact
#     driver path (TPU_RT_TUNED honored);
#   - dense-knot gallery artifact (same workload class as config 6 -
#     risky, last).
# Re-run r4_autoflip.py BY HAND after this (it reads the refreshed 00).
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
    echo "STOPPED by operator $(date)" | tee /tmp/r3m/ABORTED_B
    exit 0
  fi
  echo "=== $name: $* $(date -u +%H:%M:%S) ==="
  timeout 1800 env TPU_RT_TUNED=0 "$@" >"/tmp/r3m/${name}.log" 2>&1
  echo "=== $name rc=$? $(date -u +%H:%M:%S) ==="
  if ! health; then
    echo "TUNNEL UNHEALTHY after $name $(date)" | tee /tmp/r3m/ABORTED_B
    exit 1
  fi
}
# BR2048+mxuv2 won BOTH comparators (15.08 Mrays, 5.16 fps); these test
# whether the other individual winners compose on top of it.
run 28_headline_br2048_mxuv_gbreuse TPU_RT_BR=2048 TPU_RT_KERNEL=mxuv2 TPU_RT_GB_REUSE=1 python bench.py
run 29_headline_br2048_mxuv_hq_gt   TPU_RT_BR=2048 TPU_RT_KERNEL=mxuv2 TPU_RT_HIST_QUAD=1 TPU_RT_GATHER_T=1 python bench.py
run 26_config5_4k_banded      TPU_RT_BR=2048 TPU_RT_KERNEL=mxuv2 python bench.py --config 5
# config 6/7 ran committed defaults in r5_measure; confirm the tuned
# gates don't regress the dense/instanced workloads before shipping.
run 19b_config6_tuned         TPU_RT_BR=2048 TPU_RT_KERNEL=mxuv2 python bench.py --config 6
run 27_headline_tuned         env TPU_RT_TUNED=1 python bench.py
# BR escalation tail: at BR=4096 the envelope admits only grp-1
# scratch-free kernels (mxuv falls to mxuf1); probes whether the
# program-floor amortization continues past 2048.
run 11_headline_br4096_mxuf1  TPU_RT_BR=4096 TPU_RT_KERNEL=mxuf1 python bench.py
run 11b_headline_br4096_hq_gt TPU_RT_BR=4096 TPU_RT_KERNEL=mxuf1 TPU_RT_HIST_QUAD=1 TPU_RT_GATHER_T=1 python bench.py
run 20_gallery_knot           python scripts/render_restir.py --scene knot --size 256 --frames 32 --out gallery/dense_knot_textured.png
echo "R5B DONE $(date)" | tee /tmp/r3m/DONE_B
