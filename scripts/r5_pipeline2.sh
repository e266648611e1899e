#!/bin/bash
# Round-5 phase 2: the IVF proof + filtered re-measure + 50M diagnosis
# (VERDICT r4 tasks 1-5), outage-hardened: every attempt is gated on a
# cheap device probe that waits out tunnel outages (the 09:37Z outage ate
# pipeline1's first step; r4 saw a 6+ h outage), so a long outage stalls
# the pipeline instead of burning its retries.
cd /root/repo
LOG=measurements_r5
mkdir -p $LOG
probe() {
  # one claim attempt; an outage blocks ~25 min then fails — loop until up
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
P=$LOG/pipeline2.log
echo "pipeline2 start $(date -u +%FT%TZ) commit $(git rev-parse --short HEAD)" > $P
run_step verify_drive python scripts/verify_drive.py
echo "verify_drive rc=$? $(date -u +%FT%TZ)" >> $P
run_step r4d python scripts/tune_r4d.py
echo "r4d rc=$? $(date -u +%FT%TZ)" >> $P
run_step r4b2 python scripts/tune_r4b.py
echo "r4b2 rc=$? $(date -u +%FT%TZ)" >> $P
run_step r5b python scripts/tune_r5b.py
echo "r5b rc=$? $(date -u +%FT%TZ)" >> $P
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
run_step r3n2 python scripts/tune_r3n.py
echo "r3n2 rc=$? $(date -u +%FT%TZ)" >> $P
echo "pipeline2 END $(date -u +%FT%TZ)" >> $P
