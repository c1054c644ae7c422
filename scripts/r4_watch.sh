#!/bin/bash
# Unattended post-ladder hook: wait for the measurement ladder to finish
# (scripts/r3_measure.sh writes /tmp/r3m/DONE or ABORTED), then flip
# measured winners into TUNED.json and commit (scripts/r4_autoflip.py).
# Survives interactive-session death: start with
#   nohup bash scripts/r4_watch.sh >/tmp/r4_watch.log 2>&1 & echo $! >/tmp/r4_watch.pid
set -u
cd /root/repo
while [ ! -f /tmp/r3m/DONE ] && [ ! -f /tmp/r3m/ABORTED ]; do
  sleep 60
done
echo "ladder finished $(date -u); running autoflip"
python scripts/r4_autoflip.py
echo "autoflip rc=$?"
touch /tmp/r3m/AUTOFLIPPED
