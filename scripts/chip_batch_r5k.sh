#!/usr/bin/env bash
# Round-5 follow-up #8: batch-size sweep under the rbg production
# default. Round 4's sweep (threefry dropout) peaked at B=128
# (733 ex/s grad-only; B=160/192 fell to ~680-688); rbg removed ~half
# the dropout cost (+10.4% at B=128 -> 816 ex/s grad-only), so the
# peak may have moved. If B=160/192 now beat 816 ex/s, the token
# budget (20480 -> bucket batch sizes) should grow and the envelope
# rises; if not, B=128 stands confirmed under the new default.
# rematdots raced alongside at each point (r5j: wash at B=128 -> its
# freed activation memory could matter more at larger B).
cd /root/repo
L=bench_results.txt
mkdir -p output
mark(){ echo "=== $1 $(date -u +%H:%M:%S)" >> "$L"; }

mark "chip batch r5k start"

ok=0
for i in $(seq 1 12); do
  if timeout 300 python scripts/chip_probe.py >> output/chip_probe.log 2>&1; then
    mark "probe ok (attempt $i)"; ok=1; break
  fi
  mark "probe wedged (attempt $i), sleeping 120"
  sleep 120
done
if [ "$ok" != 1 ]; then
  mark "chip batch r5k ABORT: probe never came back"
  exit 1
fi

for B in 160 192; do
  timeout 3000 python scripts/tpu_measure.py --log "$L" train_ab \
    --batch "$B" --iters 8 --trials 3 \
    --arms pallas-train+rbg,pallas-train+rbg+rematdots \
    > "output/tab_r5k_b${B}.log" 2>&1
  mark "r5k B=$B rbg sweep rc=$?"
done

mark "chip batch r5k done"
