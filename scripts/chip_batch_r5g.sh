#!/usr/bin/env bash
# Round-5 follow-up #4: explain the fused-step gap. r5f answered
# VERDICT r4 #8's first half — the fused grad+AdamW program no longer
# hangs the remote compiler (48.3s compile) — but measured 4.80 steps/s
# vs the split-step derivation's 5.89. Suspect: the probe chain kept the
# un-donated input copy of params+m+v (~3.3 GB fp32) alive, pure HBM
# pressure the production fused step (make_train_step, donated at the
# call site) doesn't pay. Arms:
#   1. fused B=128 rbg --donate   — production memory profile
#   2. fused B=64 rbg             — pressure scaling control
#   3. fused B=128 threefry --donate — PRNG interaction control
cd /root/repo
L=bench_results.txt
mkdir -p output
mark(){ echo "=== $1 $(date -u +%H:%M:%S)" >> "$L"; }

mark "chip batch r5g start"

ok=0
for i in $(seq 1 12); do
  if timeout 300 python scripts/chip_probe.py >> output/chip_probe.log 2>&1; then
    mark "probe ok (attempt $i)"; ok=1; break
  fi
  mark "probe wedged (attempt $i), sleeping 120"
  sleep 120
done
if [ "$ok" != 1 ]; then
  mark "chip batch r5g ABORT: probe never came back"
  exit 1
fi

timeout 2700 python scripts/tpu_measure.py --log "$L" fused \
  --batch 128 --iters 8 --trials 3 --donate > output/fused_r5g_donate.log 2>&1
mark "r5g fused donate rc=$?"

timeout 2700 python scripts/tpu_measure.py --log "$L" fused \
  --batch 64 --iters 8 --trials 3 > output/fused_r5g_b64.log 2>&1
mark "r5g fused b64 rc=$?"

timeout 2700 python scripts/tpu_measure.py --log "$L" fused \
  --batch 128 --iters 8 --trials 3 --donate --rng_impl threefry2x32 \
  > output/fused_r5g_tf.log 2>&1
mark "r5g fused threefry rc=$?"

mark "chip batch r5g done"
