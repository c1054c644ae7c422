#!/bin/bash
# TPU tunnel probe: retry backend init every ~4 min; on success write an
# "UP" line (which releases the queued measurement ladder) and exit.
# Respects /tmp/r3m/BLACKOUT ("START END" epoch lines - driver-bench
# slots): no attempt may START within 300 s of a window or run inside
# one, because a probe attempt holds a backend claim for up to 240 s
# and the driver's bench needs the chip (and tunnel) to itself.
while true; do
  if [ -f /tmp/r3m/BLACKOUT ]; then
    while read -r b_start b_end; do
      [ -n "${b_start:-}" ] && [ -n "${b_end:-}" ] || continue
      now=$(date +%s)
      if [ "$now" -lt "$b_end" ] && [ "$now" -ge $((b_start - 300)) ]; then
        echo "blackout $b_start-$b_end: probe sleeping $(date -u)" >> /tmp/tpu_probe.log
        while [ "$(date +%s)" -lt "$b_end" ]; do sleep 60; done
      fi
    done < /tmp/r3m/BLACKOUT
  fi
  if timeout 240 python -c "
import jax
d = jax.devices()
assert d and d[0].platform != 'cpu', d
import jax.numpy as jnp
print(float(jnp.sum(jnp.arange(8.0)).block_until_ready()))
print('probe-ok', d[0])
" >>/tmp/tpu_probe.log 2>&1; then
    echo "UP $(date -u)" >> /tmp/tpu_probe.log
    exit 0
  else
    echo "down $(date -u)" >> /tmp/tpu_probe.log
  fi
  sleep 240
done
