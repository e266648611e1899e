#!/bin/bash
# Round-4 phase 2: verify drive, smoke re-run (fixed assertion), r4a tile
# experiments, driver bench sanity (interleaved rounds), IVF benches.
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
P=$LOG/pipeline2.log
echo "pipeline2 start $(date -u +%FT%TZ) commit $(git rev-parse --short HEAD)" > $P
run_step verify_drive env PYTHONPATH=/root/repo:/root/.axon_site python scripts/verify_drive.py
echo "verify_drive rc=$? $(date -u +%FT%TZ)" >> $P
run_step smoke2 env FAISS_TPU_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_smoke.py -v
echo "smoke2 rc=$? $(date -u +%FT%TZ)" >> $P
run_step r4a python scripts/tune_r4a.py
echo "r4a rc=$? $(date -u +%FT%TZ)" >> $P
run_step bench_sanity python bench.py
echo "bench_sanity rc=$? $(date -u +%FT%TZ)" >> $P
FT_NV=1000000 FT_NLIST=1024 FT_STORAGE=bf16,f32,int8 FT_DATA=mix,gauss \
  run_step ivf1m python scripts/bench_ivf_r4.py
echo "ivf1m rc=$? $(date -u +%FT%TZ)" >> $P
FT_NV=10000000 FT_NLIST=4096 FT_STORAGE=bf16,int8 FT_DATA=mix \
  run_step ivf10m python scripts/bench_ivf_r4.py
echo "ivf10m rc=$? $(date -u +%FT%TZ)" >> $P
echo "pipeline2 END $(date -u +%FT%TZ)" >> $P
