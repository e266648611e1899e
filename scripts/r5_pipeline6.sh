#!/bin/bash
# Round-5 phase 6: clean re-measures on a quiet host (r5c2 was CPU-contended
# by a concurrent 10M numpy oracle job) + anything pipeline5 had to cut.
cd /root/repo
LOG=measurements_r5
mkdir -p $LOG
until grep -q "pipeline5b END" $LOG/pipeline5b.log 2>/dev/null; do sleep 60; done
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
P=$LOG/pipeline6.log
echo "pipeline6 start $(date -u +%FT%TZ) commit $(git rev-parse --short HEAD)" > $P
run_step r5j python scripts/tune_r5j.py
echo "r5j rc=$? $(date -u +%FT%TZ)" >> $P
run_step r5f2 python scripts/tune_r5f2.py
echo "r5f2 rc=$? $(date -u +%FT%TZ)" >> $P
run_step r5c3 python scripts/tune_r5c.py
echo "r5c3 rc=$? $(date -u +%FT%TZ)" >> $P
run_step bench_sanity python bench.py
echo "bench_sanity rc=$? $(date -u +%FT%TZ)" >> $P
echo "pipeline6 END $(date -u +%FT%TZ)" >> $P
