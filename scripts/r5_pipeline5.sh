#!/bin/bash
# Round-5 phase 5: dense-fused slope re-measure (r4d4 — the first r4d3
# DENSE row bypassed the library dispatch), sharded-IVF P=1 overhead,
# 50M int8 IVF, and the hardware smoke suite at the round-5 head.
cd /root/repo
LOG=measurements_r5
mkdir -p $LOG
until grep -q "pipeline4 END" $LOG/pipeline4.log 2>/dev/null; do sleep 60; done
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
P=$LOG/pipeline5.log
echo "pipeline5 start $(date -u +%FT%TZ) commit $(git rev-parse --short HEAD)" > $P
FT_NV=10000000 FT_NLIST=4096 FT_STORAGE=bf16,int8 FT_DATA=mix FT_BATCHES=50 FT_SKIP_FLAT=1 \
  run_step ivf10m_v4 python scripts/bench_ivf_r4.py
echo "ivf10m_v4 rc=$? $(date -u +%FT%TZ)" >> $P
run_step r5c2 python scripts/tune_r5c.py
echo "r5c2 rc=$? $(date -u +%FT%TZ)" >> $P
run_step r4d4 python scripts/tune_r4d.py
echo "r4d4 rc=$? $(date -u +%FT%TZ)" >> $P
FT_NV=10000000 FT_NLIST=4096 FT_NLIST2=0 \
  run_step r4d_10m python scripts/tune_r4d.py
echo "r4d_10m rc=$? $(date -u +%FT%TZ)" >> $P
run_step r5e python scripts/tune_r5e.py
echo "r5e rc=$? $(date -u +%FT%TZ)" >> $P
run_step r5f python scripts/tune_r5f.py
echo "r5f rc=$? $(date -u +%FT%TZ)" >> $P
run_step smoke env FAISS_TPU_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_smoke.py -q
echo "smoke rc=$? $(date -u +%FT%TZ)" >> $P
run_step r5g python scripts/tune_r5g.py
echo "r5g rc=$? $(date -u +%FT%TZ)" >> $P
run_step r5h python scripts/tune_r5h.py
echo "r5h rc=$? $(date -u +%FT%TZ)" >> $P
FT_NV=50000000 FT_NLIST=8192 FT_STORAGE=int8 FT_DATA=mix FT_BATCHES=30 FT_SKIP_FLAT=1 \
  run_step ivf50m python scripts/bench_ivf_r4.py
echo "ivf50m rc=$? $(date -u +%FT%TZ)" >> $P
echo "pipeline5 END $(date -u +%FT%TZ)" >> $P
