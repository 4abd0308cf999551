#!/usr/bin/env bash
# Round-5 closeout: re-attribute the train step under the SHIPPED
# default (rbg dropout PRNG). The round-5 6-arm table (BASELINE.md)
# was measured pre-flip (threefry, full=173.8 ms); this re-run under
# rbg documents where the remaining ~25%-of-calibration gap lives in
# the production config, closing the attribution story the round's
# kernel decisions were made from. Per-arm process isolation (tunnel
# EOF lesson, VERDICT r4 #2).
cd /root/repo
L=bench_results.txt
mkdir -p output
mark(){ echo "=== $1 $(date -u +%H:%M:%S)" >> "$L"; }

mark "chip batch r5l start"

ok=0
for i in $(seq 1 12); do
  if timeout 300 python scripts/chip_probe.py >> output/chip_probe.log 2>&1; then
    mark "probe ok (attempt $i)"; ok=1; break
  fi
  mark "probe wedged (attempt $i), sleeping 120"
  sleep 120
done
if [ "$ok" != 1 ]; then
  mark "chip batch r5l ABORT: probe never came back"
  exit 1
fi

timeout 4800 python scripts/tpu_measure.py --log "$L" grad_profile \
  --batch 128 --rng_impl rbg --per_arm_proc --arm_timeout 2400 \
  > output/gp_r5l_rbg.log 2>&1
mark "r5l grad_profile(rbg) rc=$?"

mark "chip batch r5l done"
