#!/bin/bash
# Round-4 phase 6: IVF proof on the chunk-paged pool layout.
# Order: on-device slope first (the trustworthy kernel metric), then host
# QPS grids 1M -> 10M, filtered re-measure after the sel_remask fix, then
# the 50M runs if the round's clock allows.
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
P=$LOG/pipeline6.log
echo "pipeline6 start $(date -u +%FT%TZ) commit $(git rev-parse --short HEAD)" > $P
run_step verify_drive2 python scripts/verify_drive.py
echo "verify_drive2 rc=$? $(date -u +%FT%TZ)" >> $P
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
FT_NV=50000000 FT_NLIST=8192 FT_STORAGE=int8 FT_DATA=mix FT_BATCHES=30 FT_SKIP_FLAT=1 \
  run_step ivf50m python scripts/bench_ivf_r4.py
echo "ivf50m rc=$? $(date -u +%FT%TZ)" >> $P
echo "pipeline6 END $(date -u +%FT%TZ)" >> $P
