#!/bin/bash
# Round-4 phase 5: the 50M flat int8 rerun (r3q backlog) — layout-independent
# of the IVF chunk-pool refactor happening in parallel on the host.
cd /root/repo
LOG=measurements_r4
run_step() {
  name=$1; shift
  for attempt in 1 2 3; do
    echo "=== $name attempt $attempt $(date -u +%FT%TZ) commit $(git rev-parse --short HEAD) ===" >> $LOG/$name.log
    "$@" >> $LOG/$name.log 2>&1
    rc=$?
    echo "=== $name attempt $attempt exit $rc $(date -u +%FT%TZ) ===" >> $LOG/$name.log
    if [ $rc -eq 0 ]; then return 0; fi
    if ! grep -q "UNAVAILABLE\|backend setup\|DEADLINE" $LOG/$name.log; then
      echo "$name: non-outage failure, not retrying" >> $LOG/$name.log
      return $rc
    fi
    sleep 120
  done
  return 1
}
P=$LOG/pipeline5.log
echo "pipeline5 start $(date -u +%FT%TZ) commit $(git rev-parse --short HEAD)" > $P
run_step r3q2 python scripts/tune_r3q_50m.py
echo "r3q2 rc=$? $(date -u +%FT%TZ)" >> $P
echo "pipeline5 END $(date -u +%FT%TZ)" >> $P
