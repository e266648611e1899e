#!/bin/bash
# Round-5 phase 5b: remaining phase-5 steps, reordered to fit the round
# clock (r5i rank-depth A/B promoted above the 50M QPS grid; pipeline5's
# bash was stopped after r4d_10m — r5e keeps running detached, gated on
# here by process-exit).
cd /root/repo
LOG=measurements_r5
while pgrep -f "tune_r5e.py" > /dev/null 2>&1; do sleep 30; done
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
P=$LOG/pipeline5b.log
echo "pipeline5b start $(date -u +%FT%TZ) commit $(git rev-parse --short HEAD)" > $P
run_step r5f python scripts/tune_r5f.py
echo "r5f rc=$? $(date -u +%FT%TZ)" >> $P
run_step smoke env FAISS_TPU_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_smoke.py -q
echo "smoke rc=$? $(date -u +%FT%TZ)" >> $P
run_step r5i python scripts/tune_r5i.py
echo "r5i rc=$? $(date -u +%FT%TZ)" >> $P
run_step r5g python scripts/tune_r5g.py
echo "r5g rc=$? $(date -u +%FT%TZ)" >> $P
run_step r5h python scripts/tune_r5h.py
echo "r5h rc=$? $(date -u +%FT%TZ)" >> $P
FT_NV=50000000 FT_NLIST=8192 FT_STORAGE=int8 FT_DATA=mix FT_BATCHES=30 FT_SKIP_FLAT=1 \
  run_step ivf50m python scripts/bench_ivf_r4.py
echo "ivf50m rc=$? $(date -u +%FT%TZ)" >> $P
echo "pipeline5b END $(date -u +%FT%TZ)" >> $P
