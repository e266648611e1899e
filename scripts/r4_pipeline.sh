#!/bin/bash
# Round-4 hardware backlog (VERDICT r3 task 2): sequential, one device
# claim per process, outage-retry per step (CLAUDE.md: UNAVAILABLE after
# ~25 min claim block during outages — retry and keep going).
cd /root/repo
LOG=measurements_r4
run_step() {
  name=$1; shift
  for attempt in 1 2 3; do
    echo "=== $name attempt $attempt $(date -u +%FT%TZ) ===" >> $LOG/$name.log
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
echo "pipeline start $(date -u +%FT%TZ) commit $(git rev-parse --short HEAD)" > $LOG/pipeline.log
run_step smoke env FAISS_TPU_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_smoke.py -v
echo "smoke done rc=$? $(date -u +%FT%TZ)" >> $LOG/pipeline.log
run_step r3m python scripts/tune_r3m.py
echo "r3m done rc=$? $(date -u +%FT%TZ)" >> $LOG/pipeline.log
run_step r3o python scripts/tune_r3o.py
echo "r3o done rc=$? $(date -u +%FT%TZ)" >> $LOG/pipeline.log
run_step r3n python scripts/tune_r3n.py
echo "r3n done rc=$? $(date -u +%FT%TZ)" >> $LOG/pipeline.log
run_step r3q python scripts/tune_r3q_50m.py
echo "r3q done rc=$? $(date -u +%FT%TZ)" >> $LOG/pipeline.log
echo "pipeline END $(date -u +%FT%TZ)" >> $LOG/pipeline.log
