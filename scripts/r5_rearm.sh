#!/bin/bash
# Round-start re-arm of the unattended on-chip measurement chain.
# Sessions die to transient API errors; this makes the restart checklist
# (memory note "r3-tpu-session-plan") one idempotent command:
#
#   bash scripts/r5_rearm.sh <DEADLINE_epoch> [<BLACKOUT_start> <BLACKOUT_end>]...
#
# It (a) refreshes /tmp/r3m/DEADLINE and /tmp/r3m/BLACKOUT, (b) restarts
# any dead link of probe -> ladder -> autoflip-watch, and (c) prints a
# status summary. Safe to run repeatedly: nothing is restarted while its
# pidfile process is alive, a finished stage is never re-run, and a
# ladder that already STARTED is reported (not blindly relaunched -
# re-running measurement steps would contend for the chip and duplicate
# step logs; decide by hand from /tmp/r3m/ladder.log in that case).
set -u
cd /root/repo

if [ $# -lt 1 ]; then
  echo "usage: $0 <DEADLINE_epoch> [<blk_start> <blk_end>]..." >&2
  exit 2
fi
mkdir -p /tmp/r3m
echo "$1" > /tmp/r3m/DEADLINE
shift
: > /tmp/r3m/BLACKOUT
while [ $# -ge 2 ]; do
  echo "$1 $2" >> /tmp/r3m/BLACKOUT
  shift 2
done
echo "DEADLINE: $(cat /tmp/r3m/DEADLINE) ($(date -u -d @$(cat /tmp/r3m/DEADLINE) 2>/dev/null))"
echo "BLACKOUT:"; sed 's/^/  /' /tmp/r3m/BLACKOUT

alive() { # alive <pidfile>
  local pid
  pid=$(cat "$1" 2>/dev/null) || return 1
  [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null
}

# --- probe: loops backend init, writes "UP" to /tmp/tpu_probe.log, exits.
if grep -q '^UP' /tmp/tpu_probe.log 2>/dev/null; then
  echo "probe: tunnel already came UP ($(grep '^UP' /tmp/tpu_probe.log | tail -1))"
elif alive /tmp/probe.pid; then
  echo "probe: alive ($(cat /tmp/probe.pid)); last: $(grep -E '^(UP|down)' /tmp/tpu_probe.log 2>/dev/null | tail -1)"
else
  nohup bash scripts/tpu_probe.sh >/dev/null 2>&1 & echo $! > /tmp/probe.pid
  echo "probe: RESTARTED ($(cat /tmp/probe.pid))"
fi

# --- ladder: waits for the probe's UP line, then runs the measurement
# ladder once. /tmp/r3m_started marks that it began executing steps.
if [ -f /tmp/r3m/DONE ] || [ -f /tmp/r3m/ABORTED ]; then
  echo "ladder: FINISHED ($(ls /tmp/r3m/DONE /tmp/r3m/ABORTED 2>/dev/null | tr '\n' ' '))"
elif alive /tmp/ladder.pid; then
  echo "ladder: alive ($(cat /tmp/ladder.pid))$([ -f /tmp/r3m_started ] && echo ' - RUNNING STEPS' || echo ' - queued on probe')"
elif [ -f /tmp/r3m_started ]; then
  echo "ladder: STARTED but runner is dead and no DONE/ABORTED marker -"
  echo "        inspect /tmp/r3m/ladder.log before relaunching by hand."
else
  nohup bash -c 'while ! grep -q "^UP" /tmp/tpu_probe.log 2>/dev/null; do sleep 30; done; touch /tmp/r3m_started; bash /root/repo/scripts/r5_measure.sh >> /tmp/r3m/ladder.log 2>&1' \
    >/dev/null 2>&1 & echo $! > /tmp/ladder.pid
  echo "ladder: RESTARTED ($(cat /tmp/ladder.pid))"
fi

# --- autoflip watch: waits for DONE/ABORTED, then commits TUNED.json.
# Round-local marker only - a previous round's TUNED.json commit in the
# log must not suppress this round's flip (r5: it did).
if [ -f /tmp/r3m/AUTOFLIPPED ]; then
  echo "autoflip: already ran this round"
elif alive /tmp/r4_watch.pid; then
  echo "autoflip watch: alive ($(cat /tmp/r4_watch.pid))"
elif [ -f /tmp/r3m/DONE ] || [ -f /tmp/r3m/ABORTED ]; then
  echo "autoflip watch: dead but ladder finished - running autoflip NOW"
  python scripts/r4_autoflip.py; echo "autoflip rc=$?"
else
  nohup bash scripts/r4_watch.sh >>/tmp/r4_watch.log 2>&1 & echo $! > /tmp/r4_watch.pid
  echo "autoflip watch: RESTARTED ($(cat /tmp/r4_watch.pid))"
fi

echo "tree: $(git status --short | wc -l) dirty files"
