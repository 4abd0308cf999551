#!/usr/bin/env bash
# Round-5 chained follow-up: runs AFTER chip_batch_r5.sh completes.
#   job1  nlvr2 demo re-run with the MATCHING model config (the 11:52
#         failure was a config mismatch: nlvr2's uniter-base default has
#         512 bert positions, the demo checkpoint is uc2-base with 514
#         XLM-R positions — vqa/itm default to uc2-base and passed)
#   job2  exec chip_batch_r5b.sh (head-split races A/B/C)
cd /root/repo
L=bench_results.txt
mkdir -p output
mark(){ echo "=== $1 $(date -u +%H:%M:%S)" >> "$L"; }

mark "chip batch r5c start"

# wedge gate: retry a 300s-bounded trivial-compute probe before each real
# job so a wedged tile lease (the ve failure mode) costs probe attempts,
# not a real job's budget. Cap at 8 attempts (~45 min) then press on —
# the real job may still succeed and its own timeout bounds the damage.
probe(){
  for i in 1 2 3 4 5 6 7 8; do
    if timeout 300 python scripts/chip_probe.py >> output/chip_probe.log 2>&1; then
      mark "probe ok (attempt $i)"; return 0; fi
    mark "probe attempt $i failed/hung — sleeping 60"
    sleep 60
  done
  mark "probe gave up after 8 attempts — running the job anyway"
}

CKPT_DIR=output/demo_pretrain/ckpt
if ls "$CKPT_DIR"/model_step* >/dev/null 2>&1; then
  probe
  mark "r5c nlvr2 demo retry start"
  timeout 1800 python nlvr2.py --checkpoint "$CKPT_DIR" \
    --model_config config/uc2-base.json \
    --train_txt_db data/demo/en/txt_db --train_img_db data/demo/en/img_db \
    --fmt triplet --pred_csv output/demo_nlvr2/preds.csv \
    --output_dir output/demo_nlvr2 \
    --train_batch_size 8 --num_train_steps 10 --warmup_steps 2 \
    --valid_steps 10 --save_steps 10 --log_steps 5 \
    > output/demo_nlvr2_r5c.log 2>&1
  mark "r5c nlvr2 rc=$?"
  # ve retry: the r5 ve job hung at device attach (zero log output for
  # its whole 1800 s budget, right after nlvr2's crash-teardown — the
  # known ~30 min wedged-lease window) and was timeout-killed
  probe
  mark "r5c ve demo retry start"
  timeout 1800 python ve.py --checkpoint "$CKPT_DIR" \
    --train_txt_db data/demo/en/txt_db --train_img_db data/demo/en/img_db \
    --val_txt_db data/demo/en/txt_db --val_img_db data/demo/en/img_db \
    --output_dir output/demo_ve \
    --train_batch_size 16 --num_train_steps 10 --warmup_steps 2 \
    --valid_steps 10 --val_batches 2 --save_steps 10 --log_steps 5 \
    > output/demo_ve_r5c.log 2>&1
  mark "r5c ve rc=$?"
else
  mark "r5c no checkpoint — nlvr2/ve retries skipped"
fi

probe
bash scripts/chip_batch_r5b.sh

mark "chip batch r5c done"
