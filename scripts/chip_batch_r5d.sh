#!/usr/bin/env bash
# Round-5 follow-up: re-capture the bench.py headline AFTER the rbg
# default flip (train arms now generate dropout masks on the hardware
# RngBitGenerator — the +10.4% train_ab win, bench_results.txt r5 job6).
# Scoring fields should be unchanged (inference path has no dropout);
# train flat worst-case + envelope should move ~+10%.
cd /root/repo
L=bench_results.txt
mkdir -p output
mark(){ echo "=== $1 $(date -u +%H:%M:%S)" >> "$L"; }

mark "chip batch r5d start"

# liveness-probe gate (the r5 ve-demo wedge lesson): don't burn the
# bench budget on a wedged attach window
ok=0
for i in $(seq 1 12); do   # cover a full ~35-min wedge window
  if timeout 300 python scripts/chip_probe.py >> output/chip_probe.log 2>&1; then
    mark "probe ok (attempt $i)"; ok=1; break
  fi
  mark "probe wedged (attempt $i), sleeping 120"
  sleep 120
done
if [ "$ok" != 1 ]; then
  mark "chip batch r5d ABORT: probe never came back"
  exit 1
fi

timeout 3600 python bench.py > output/bench_r5_rbg.json 2> output/bench_r5_rbg.log
mark "r5d bench rc=$?"
if [ -s output/bench_r5_rbg.json ]; then
  echo "BENCH r5d (post-rbg-flip): $(cat output/bench_r5_rbg.json)" >> "$L"
fi

mark "chip batch r5d done"
