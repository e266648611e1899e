#!/bin/bash
# Round-4 phase 4 (supersedes the stopped pipeline2 tail + pipeline3):
# IVF benches on the chunked gather + fixed thread-pool harness, filtered
# slope, 50M reruns.
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
P=$LOG/pipeline4.log
echo "pipeline4 start $(date -u +%FT%TZ) commit $(git rev-parse --short HEAD)" > $P
FT_NV=1000000 FT_NLIST=1024,4096 FT_STORAGE=bf16,int8 FT_DATA=mix,gauss \
  run_step ivf1m_v2 python scripts/bench_ivf_r4.py
echo "ivf1m_v2 rc=$? $(date -u +%FT%TZ)" >> $P
run_step r4b python scripts/tune_r4b.py
echo "r4b rc=$? $(date -u +%FT%TZ)" >> $P
FT_NV=10000000 FT_NLIST=4096 FT_STORAGE=bf16,int8 FT_DATA=mix \
  run_step ivf10m python scripts/bench_ivf_r4.py
echo "ivf10m rc=$? $(date -u +%FT%TZ)" >> $P
run_step r3q2 python scripts/tune_r3q_50m.py
echo "r3q2 rc=$? $(date -u +%FT%TZ)" >> $P
FT_NV=50000000 FT_NLIST=8192 FT_STORAGE=int8 FT_DATA=mix FT_BATCHES=50 \
  run_step ivf50m python scripts/bench_ivf_r4.py
echo "ivf50m rc=$? $(date -u +%FT%TZ)" >> $P
echo "pipeline4 END $(date -u +%FT%TZ)" >> $P
