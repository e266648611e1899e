#!/bin/bash
# Round-5 phase 3: re-measure at HEAD (dense_fused route, _SCAN_RANKS=8,
# SMEM cap). Short on purpose: verify + slope + 1M grid; the 10M/50M runs
# go in phase 4 once the balanced-training work lands.
cd /root/repo
LOG=measurements_r5
mkdir -p $LOG
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
P=$LOG/pipeline3.log
echo "pipeline3 start $(date -u +%FT%TZ) commit $(git rev-parse --short HEAD)" > $P
run_step verify_drive3 python scripts/verify_drive.py
echo "verify_drive3 rc=$? $(date -u +%FT%TZ)" >> $P
run_step r4d2 python scripts/tune_r4d.py
echo "r4d2 rc=$? $(date -u +%FT%TZ)" >> $P
FT_NV=1000000 FT_NLIST=1024 FT_STORAGE=bf16,int8 FT_DATA=mix FT_BATCHES=50 \
  run_step ivf1m_v4 python scripts/bench_ivf_r4.py
echo "ivf1m_v4 rc=$? $(date -u +%FT%TZ)" >> $P
echo "pipeline3 END $(date -u +%FT%TZ)" >> $P
