#!/bin/bash
# Round-5 phase 7: the int8 5x-bar measurement (r5k), after pipeline6.
cd /root/repo
LOG=measurements_r5
until grep -q "pipeline6 END" $LOG/pipeline6.log 2>/dev/null; do sleep 30; done
probe() {
  until timeout 2400 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" 2>/dev/null; do
    echo "probe: TPU unavailable $(date -u +%FT%TZ); sleeping 300s" >> $LOG/probe.log
    sleep 300
  done
  echo "probe: TPU up $(date -u +%FT%TZ)" >> $LOG/probe.log
}
run_step() {
  name=$1; shift
  for attempt in 1 2 3; do
    probe
    echo "=== $name attempt $attempt $(date -u +%FT%TZ) commit $(git rev-parse --short HEAD) ===" >> $LOG/$name.log
    "$@" >> $LOG/$name.log 2>&1
    rc=$?
    echo "=== $name attempt $attempt exit $rc $(date -u +%FT%TZ) ===" >> $LOG/$name.log
    if [ $rc -eq 0 ]; then return 0; fi
    if ! grep -q "UNAVAILABLE\|backend setup\|DEADLINE" $LOG/$name.log; then
      echo "$name: non-outage failure, not retrying" >> $LOG/$name.log
      return $rc
    fi
    sleep 60
  done
  return 1
}
P=$LOG/pipeline7.log
echo "pipeline7 start $(date -u +%FT%TZ) commit $(git rev-parse --short HEAD)" > $P
run_step r5k python scripts/tune_r5k.py
echo "r5k rc=$? $(date -u +%FT%TZ)" >> $P
echo "pipeline7 END $(date -u +%FT%TZ)" >> $P
