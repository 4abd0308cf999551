#!/usr/bin/env bash
# Round-5 follow-up batch: the races the head-split grid (commit 4a791a4)
# makes feasible. Run AFTER chip_batch_r5.sh completes (one chip client at
# a time — concurrent clients contend for the tile lease).
#
#   raceA  native-layout arm at its resolved geometry (BB=1, HB=6 at
#          L=162) vs the standard arm — the ~10 ms/step host-transpose
#          question from TODO.md, now measurable instead of auto-retired
#   raceB  head-block sweep on the standard layout (HB=12 is the proven
#          default; HB=6/4 halve/third the per-cell footprint and change
#          Mosaic's pipelining — end-to-end arms, per DESIGN.md's
#          isolated-races-don't-predict rule)
cd /root/repo
L=bench_results.txt
mkdir -p output
mark(){ echo "=== $1 $(date -u +%H:%M:%S)" >> "$L"; }

mark "chip batch r5b start"

# raceA: standard vs native at B=128 (the two arms compile+measure in
# isolation; the native arm now head-splits instead of SKIPping)
mark "r5b raceA standard-vs-native start"
timeout 5400 python scripts/tpu_measure.py train_ab --batch 128 \
  --arms pallas-train,pallas-train+native > output/tab_r5b_native.log 2>&1
mark "r5b raceA done rc=$?"

# raceB: HB sweep, standard layout (env knob; BB stays heuristic=1)
for HB in 6 4; do
  mark "r5b raceB HB=$HB start"
  UC2_ATTN_TRAIN_HB=$HB timeout 5400 python scripts/tpu_measure.py \
    train_ab --batch 128 --arms pallas-train \
    > output/tab_r5b_hb$HB.log 2>&1
  mark "r5b raceB HB=$HB done rc=$?"
done

# raceC: the BB=2 arm round 4 actually wanted, now VMEM-legal when paired
# with HB=6 (modeled 14.3M: 2 batch rows x 6 heads = the same 12 [L,L]
# slices as the proven BB=1 x HB=12 cell, half the grid length)
mark "r5b raceC BB=2 HB=6 start"
UC2_ATTN_TRAIN_HB=6 timeout 5400 \
  python scripts/tpu_measure.py train_ab --batch 128 \
  --attn_bb_list 2 > output/tab_r5b_bb2hb6.log 2>&1
mark "r5b raceC done rc=$?"

mark "chip batch r5b done"
