#!/usr/bin/env bash
# Round-5n: extend the raised-VMEM batch-block race upward. r5m showed a
# rising trend (BB=1 6.39, BB=2 6.42, BB=4 6.49 steps/s) and retired the
# native layout with data (5.31, -17%). BB=8 models 82.6 MiB — inside
# the 100 MiB clamp (above ~100 MiB the double-buffered operand blocks
# no longer fit beside the scratch on a 128 MiB v5e core). Re-run BB=4
# as the anchor against r5m.
cd /root/repo
L=bench_results.txt
mkdir -p output
mark(){ echo "=== $1 $(date -u +%H:%M:%S)" >> "$L"; }

mark "chip batch r5n start"

ok=0
for i in $(seq 1 12); do
  if timeout 300 python scripts/chip_probe.py >> output/chip_probe.log 2>&1; then
    mark "probe ok (attempt $i)"; ok=1; break
  fi
  mark "probe wedged (attempt $i), sleeping 120"
  sleep 120
done
if [ "$ok" != 1 ]; then
  mark "chip batch r5n ABORT: probe never came back"
  exit 1
fi

timeout 3000 python scripts/tpu_measure.py --log "$L" train_ab \
  --batch 128 --iters 8 --trials 3 \
  --arms pallas-train+rbg+vmem64@bb4,pallas-train+rbg+vmem100@bb8 \
  > output/tab_r5n_vmem.log 2>&1
mark "r5n vmem bb8 race rc=$?"

mark "chip batch r5n done"
