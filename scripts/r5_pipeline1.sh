#!/bin/bash
# Round-5 phase 1: execute the IVF proof (VERDICT r4 task #1 — two rounds
# overdue), the filtered re-measure (#2), and the 50M collapse diagnosis
# (#3). Order: hardware sanity first, then the on-device IVF slope (the
# trustworthy kernel metric), then e2e grids 1M -> 10M -> Gaussian, then
# the 50M depth scan.
cd /root/repo
LOG=measurements_r5
mkdir -p $LOG
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
P=$LOG/pipeline1.log
echo "pipeline1 start $(date -u +%FT%TZ) commit $(git rev-parse --short HEAD)" > $P
run_step verify_drive python scripts/verify_drive.py
echo "verify_drive rc=$? $(date -u +%FT%TZ)" >> $P
run_step r4d python scripts/tune_r4d.py
echo "r4d rc=$? $(date -u +%FT%TZ)" >> $P
run_step r4b2 python scripts/tune_r4b.py
echo "r4b2 rc=$? $(date -u +%FT%TZ)" >> $P
FT_NV=1000000 FT_NLIST=1024 FT_STORAGE=bf16,int8 FT_DATA=mix FT_BATCHES=50 \
  run_step ivf1m_v3 python scripts/bench_ivf_r4.py
echo "ivf1m_v3 rc=$? $(date -u +%FT%TZ)" >> $P
FT_NV=10000000 FT_NLIST=4096 FT_STORAGE=bf16,int8 FT_DATA=mix FT_BATCHES=50 \
  run_step ivf10m_v2 python scripts/bench_ivf_r4.py
echo "ivf10m_v2 rc=$? $(date -u +%FT%TZ)" >> $P
FT_NV=1000000 FT_NLIST=1024 FT_STORAGE=bf16 FT_DATA=gauss FT_BATCHES=50 \
  run_step ivf1m_gauss python scripts/bench_ivf_r4.py
echo "ivf1m_gauss rc=$? $(date -u +%FT%TZ)" >> $P
run_step r5a python scripts/tune_r5a.py
echo "r5a rc=$? $(date -u +%FT%TZ)" >> $P
echo "pipeline1 END $(date -u +%FT%TZ)" >> $P
