#!/usr/bin/env bash
# Round-5 follow-up #2: re-capture the bench.py headline after (a) the rbg
# default flip and (b) the orchestrator split. r5d's single-process run
# lost its train fields to RESOURCE_EXHAUSTED (same class as
# output/tab_r4.log: several compiled train programs + buffers in one
# process exhaust the chip); bench.py now runs scoring / each grad bucket
# / apply in isolated subprocesses with per-bucket threefry fallback, so
# this run both lands the +10.4% rbg train headline and tells us WHICH
# bucket (if any) genuinely cannot run rbg.
cd /root/repo
L=bench_results.txt
mkdir -p output
mark(){ echo "=== $1 $(date -u +%H:%M:%S)" >> "$L"; }

mark "chip batch r5e start"

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
  mark "chip batch r5e ABORT: probe never came back"
  exit 1
fi

timeout 4000 python bench.py > output/bench_r5e.json 2> output/bench_r5e.log
mark "r5e bench rc=$?"
if [ -s output/bench_r5e.json ]; then
  echo "BENCH r5e (rbg + orchestrator): $(tail -1 output/bench_r5e.json)" >> "$L"
fi

# the two grad_profile arms the r5 batch lost to remote_compile HTTP 413:
# the frozen embedding table was a closed-over jit constant (~768 MB in
# the HLO body); it now rides as a runtime argument, so these should
# compile. Completes the 6-arm attribution table (VERDICT r4 #2).
mark "r5e grad_profile frozenemb+encoder start"
timeout 3600 python scripts/tpu_measure.py --log "$L" grad_profile \
  --per_arm_proc --arms frozenemb,encoder --batch 128 --iters 8 \
  --trials 3 > output/gp_r5e.log 2>&1
mark "r5e grad_profile rc=$?"

mark "chip batch r5e done"
