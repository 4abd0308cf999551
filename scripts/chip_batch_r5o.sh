#!/usr/bin/env bash
# Round-5o: per-bucket confirmation of the vmem64@bb4 win before any
# default flip. r5m/r5n raced only the worst-case bucket (L=162/B=128:
# BB=1 6.39 → BB=4 6.49 → BB=8 6.35, peak at 4). The headline is the
# bucket ENVELOPE, so the other two token-budget buckets must confirm:
# L=98/B=208 (default heuristic already picks BB=2 there) and
# L=128/B=160. A win everywhere flips the shipped default to
# vmem64 + BB-target-4; a mixed result keeps it per-bucket.
cd /root/repo
L=bench_results.txt
mkdir -p output
mark(){ echo "=== $1 $(date -u +%H:%M:%S)" >> "$L"; }

mark "chip batch r5o start"

ok=0
for i in $(seq 1 12); do
  if timeout 300 python scripts/chip_probe.py >> output/chip_probe.log 2>&1; then
    mark "probe ok (attempt $i)"; ok=1; break
  fi
  mark "probe wedged (attempt $i), sleeping 120"
  sleep 120
done
if [ "$ok" != 1 ]; then
  mark "chip batch r5o ABORT: probe never came back"
  exit 1
fi

timeout 3000 python scripts/tpu_measure.py --log "$L" train_ab \
  --batch 208 --num_bb 36 --iters 8 --trials 3 \
  --arms pallas-train+rbg,pallas-train+rbg+vmem64@bb4 \
  > output/tab_r5o_b208.log 2>&1
mark "r5o bucket L=98 B=208 rc=$?"

timeout 3000 python scripts/tpu_measure.py --log "$L" train_ab \
  --batch 160 --num_bb 66 --iters 8 --trials 3 \
  --arms pallas-train+rbg,pallas-train+rbg+vmem64@bb4 \
  > output/tab_r5o_b160.log 2>&1
mark "r5o bucket L=128 B=160 rc=$?"

mark "chip batch r5o done"
