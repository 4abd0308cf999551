#!/usr/bin/env bash
# Round-5 follow-up #6: one on-chip demo drive under the NEW production
# default (rbg dropout PRNG, flipped this round). The r5/r5c demo drives
# that proved all five drivers on hardware ran pre-flip (threefry); the
# rbg kernels themselves are chip-proven by train_ab/bench, but this
# closes the loop on the full driver path (loader -> step -> ckpt -> val)
# under the shipped default.
cd /root/repo
L=bench_results.txt
mkdir -p output
mark(){ echo "=== $1 $(date -u +%H:%M:%S)" >> "$L"; }

mark "chip batch r5i start"

ok=0
for i in $(seq 1 12); do
  if timeout 300 python scripts/chip_probe.py >> output/chip_probe.log 2>&1; then
    mark "probe ok (attempt $i)"; ok=1; break
  fi
  mark "probe wedged (attempt $i), sleeping 120"
  sleep 120
done
if [ "$ok" != 1 ]; then
  mark "chip batch r5i ABORT: probe never came back"
  exit 1
fi

CKPT_DIR=output/demo_pretrain/ckpt
if ! ls "$CKPT_DIR"/model_step* >/dev/null 2>&1; then
  mark "r5i: no demo checkpoint on disk, aborting"
  exit 1
fi
timeout 1800 python vqa.py --checkpoint "$CKPT_DIR" \
  --train_txt_db data/demo/en/txt_db --train_img_db data/demo/en/img_db \
  --val_txt_db data/demo/en/txt_db --val_img_db data/demo/en/img_db \
  --num_answer 16 --output_dir output/demo_vqa_rbg \
  --train_batch_size 16 --num_train_steps 10 --warmup_steps 2 \
  --valid_steps 10 --val_batches 2 --save_steps 10 --log_steps 5 \
  > output/demo_vqa_rbg.log 2>&1
mark "r5i vqa demo (rbg default) rc=$?"

mark "chip batch r5i done"
