#!/bin/bash
# Round-5 phase 4: the 10M IVF proof on balanced training, add-phase
# profile, large-k blocked-final-select re-measure, 50M pipelined-collapse
# diagnosis. Gates on pipeline3 finishing (one process claims the chip).
cd /root/repo
LOG=measurements_r5
mkdir -p $LOG
until grep -q "pipeline3 END" $LOG/pipeline3.log 2>/dev/null; do sleep 60; done
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
P=$LOG/pipeline4.log
echo "pipeline4 start $(date -u +%FT%TZ) commit $(git rev-parse --short HEAD)" > $P
run_step r4d3 python scripts/tune_r4d.py
echo "r4d3 rc=$? $(date -u +%FT%TZ)" >> $P
FT_NV=1000000 FT_NLIST=1024 FT_STORAGE=bf16,int8 FT_DATA=mix FT_BATCHES=50 \
  run_step ivf1m_v5 python scripts/bench_ivf_r4.py
echo "ivf1m_v5 rc=$? $(date -u +%FT%TZ)" >> $P
run_step r5c python scripts/tune_r5c.py
echo "r5c rc=$? $(date -u +%FT%TZ)" >> $P
FT_NV=10000000 FT_NLIST=4096 FT_STORAGE=bf16,int8 FT_DATA=mix FT_BATCHES=50 \
  run_step ivf10m_v3 python scripts/bench_ivf_r4.py
echo "ivf10m_v3 rc=$? $(date -u +%FT%TZ)" >> $P
run_step r3n2 python scripts/tune_r3n.py
echo "r3n2 rc=$? $(date -u +%FT%TZ)" >> $P
run_step r5d python scripts/tune_r5d.py
echo "r5d rc=$? $(date -u +%FT%TZ)" >> $P
FT_NV=1000000 FT_NLIST=1024 FT_STORAGE=bf16 FT_DATA=gauss FT_BATCHES=50 \
  run_step ivf1m_gauss python scripts/bench_ivf_r4.py
echo "ivf1m_gauss rc=$? $(date -u +%FT%TZ)" >> $P
echo "pipeline4 END $(date -u +%FT%TZ)" >> $P
