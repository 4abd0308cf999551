#!/usr/bin/env bash
# Round-5 follow-up #3: re-probe the FUSED train step (grad + AdamW in
# one jitted program) — VERDICT r4 #8. Round 1 declared it a remote-
# compiler hang (>60 min, killed) and every measurement since has used
# the split grad/apply derivation. The r5e HTTP-413 root cause (closure
# constants ballooning the remote_compile request) is a plausible
# alternate explanation for that hang, and the probe costs one bounded
# timeout to find out. A green result supersedes the derived split-step
# rate (and retires the quirk-log entry); rc=124 re-confirms the hang
# with a 45-min spend instead of an hour.
cd /root/repo
L=bench_results.txt
mkdir -p output
mark(){ echo "=== $1 $(date -u +%H:%M:%S)" >> "$L"; }

mark "chip batch r5f start"

# liveness-probe gate (the r5 ve-demo wedge lesson)
ok=0
for i in $(seq 1 12); do
  if timeout 300 python scripts/chip_probe.py >> output/chip_probe.log 2>&1; then
    mark "probe ok (attempt $i)"; ok=1; break
  fi
  mark "probe wedged (attempt $i), sleeping 120"
  sleep 120
done
if [ "$ok" != 1 ]; then
  mark "chip batch r5f ABORT: probe never came back"
  exit 1
fi

# production shape: flat worst-case bucket (B=128, L=162), rbg (driver
# default). Split-step comparison point: 5.89 steps/s (BENCH r5e).
timeout 2700 python scripts/tpu_measure.py --log "$L" fused \
  --batch 128 --iters 8 --trials 3 > output/fused_r5f.log 2>&1
mark "r5f fused rc=$?"

mark "chip batch r5f done"
