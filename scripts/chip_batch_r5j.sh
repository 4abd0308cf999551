#!/usr/bin/env bash
# Round-5 follow-up #7: remat race on the train grad program at B=128.
# Motivation: the fused-vs-split race showed HBM pressure costs real
# schedule quality at this batch (donation alone was worth +16%); remat
# shrinks the activation live set at a recompute tax. dots_saveable
# keeps matmul outputs (cheap VPU recompute; note the Pallas attention
# custom-call is NOT a dot, so its forward replays in the backward);
# full saves only layer inputs. Run under rbg, the production default.
cd /root/repo
L=bench_results.txt
mkdir -p output
mark(){ echo "=== $1 $(date -u +%H:%M:%S)" >> "$L"; }

mark "chip batch r5j start"

ok=0
for i in $(seq 1 12); do
  if timeout 300 python scripts/chip_probe.py >> output/chip_probe.log 2>&1; then
    mark "probe ok (attempt $i)"; ok=1; break
  fi
  mark "probe wedged (attempt $i), sleeping 120"
  sleep 120
done
if [ "$ok" != 1 ]; then
  mark "chip batch r5j ABORT: probe never came back"
  exit 1
fi

timeout 3000 python scripts/tpu_measure.py --log "$L" train_ab \
  --batch 128 --iters 8 --trials 3 \
  --arms pallas-train+rbg,pallas-train+rbg+rematdots,pallas-train+rbg+rematfull \
  > output/tab_r5j_remat.log 2>&1
mark "r5j remat race rc=$?"

mark "chip batch r5j done"
