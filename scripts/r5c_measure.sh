#!/bin/bash
# Round-5c: config-4 gather attack steps, aimed by the 17b trace
# attribution (PERF.md r5): the 1080p frame is gather-bound -
# 445 ms/frame of spatial-tap comb gathers (43 ns/row at 2M rows) and
# 204 ms of per-depth texture gathers. GATHER_T (column-major gather
# output) and HIST_QUAD were measured ~neutral at 512^2 but never at
# 1080p, where gathers dominate.
set -u
cd /root/repo
run() {
  local name="$1"; shift
  echo "=== $name: $* $(date -u +%H:%M:%S) ==="
  timeout 1800 env TPU_RT_TUNED=0 "$@" >"/tmp/r3m/${name}.log" 2>&1
  echo "=== $name rc=$? $(date -u +%H:%M:%S) ==="
}
run 30_config4_tuned_full TPU_RT_BR=2048 TPU_RT_KERNEL=mxuv2 TPU_RT_HIST_QUAD=1 TPU_RT_GATHER_T=1 python bench.py --config 4
run 31_config4_gt         TPU_RT_KERNEL=mxuv2 TPU_RT_GATHER_T=1 python bench.py --config 4
echo "R5C DONE $(date)" | tee /tmp/r3m/DONE_C
