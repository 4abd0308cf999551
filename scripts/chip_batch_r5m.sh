#!/usr/bin/env bash
# Round-5m: raised-scoped-VMEM race on the train grad program at B=128.
# Round 4 lost the BB=2 and native-layout races to Mosaic's 16 MiB
# scoped-VMEM default (21.49M / 24.10M observed OOMs). The limit is
# compiler accounting, not hardware (v5e: 128 MiB VMEM/core) —
# UC2_ATTN_TRAIN_VMEM_MB now raises it per-kernel via
# pltpu.CompilerParams(vmem_limit_bytes), so the blocked geometries are
# finally raceable: bigger batch blocks amortize the k/v reload across
# the batch grid, and the native layout deletes the host-side HBM
# transposes around the custom call. Baseline arm = the shipped default.
cd /root/repo
L=bench_results.txt
mkdir -p output
mark(){ echo "=== $1 $(date -u +%H:%M:%S)" >> "$L"; }

mark "chip batch r5m start"

ok=0
for i in $(seq 1 12); do
  if timeout 300 python scripts/chip_probe.py >> output/chip_probe.log 2>&1; then
    mark "probe ok (attempt $i)"; ok=1; break
  fi
  mark "probe wedged (attempt $i), sleeping 120"
  sleep 120
done
if [ "$ok" != 1 ]; then
  mark "chip batch r5m ABORT: probe never came back"
  exit 1
fi

timeout 5400 python scripts/tpu_measure.py --log "$L" train_ab \
  --batch 128 --iters 8 --trials 3 \
  --arms pallas-train+rbg,pallas-train+rbg+vmem32@bb2,pallas-train+rbg+vmem64@bb4,pallas-train+rbg+native+vmem32,pallas-train+rbg+native+vmem64 \
  > output/tab_r5m_vmem.log 2>&1
mark "r5m vmem race rc=$?"

mark "chip batch r5m done"
