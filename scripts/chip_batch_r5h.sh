#!/usr/bin/env bash
# Round-5 follow-up #5: the donate arm of the fused-step race, re-run
# with the aliasing fix (the chain now RETURNS the updated state so the
# donated params+m+v buffers have outputs to alias into, and the trials
# thread state call-to-call, production-style — one state copy total).
# r5g's first donate attempt was invalid twice over: donation was
# silently unusable (scalar-only outputs) AND the per-trial fresh-state
# re-init doubled the fp32 state while the setup copy was still live,
# which RESOURCE_EXHAUSTED'd the chip before one step ran.
# Comparison points @ B=128 L=162 mlm rbg: split-derived 5.89 steps/s,
# fused un-donated 4.80.
cd /root/repo
L=bench_results.txt
mkdir -p output
mark(){ echo "=== $1 $(date -u +%H:%M:%S)" >> "$L"; }

mark "chip batch r5h start"

ok=0
for i in $(seq 1 12); do
  if timeout 300 python scripts/chip_probe.py >> output/chip_probe.log 2>&1; then
    mark "probe ok (attempt $i)"; ok=1; break
  fi
  mark "probe wedged (attempt $i), sleeping 120"
  sleep 120
done
if [ "$ok" != 1 ]; then
  mark "chip batch r5h ABORT: probe never came back"
  exit 1
fi

timeout 2700 python scripts/tpu_measure.py --log "$L" fused \
  --batch 128 --iters 8 --trials 3 --donate > output/fused_r5h_donate.log 2>&1
mark "r5h fused donate(rbg) rc=$?"

mark "chip batch r5h done"
