#!/usr/bin/env bash
# Reconstructed round-4 chip batch (original /tmp copy lost to the VM restart).
# Sequential; each job bounded; markers + RESULT lines land in bench_results.txt.
cd /root/repo
L=bench_results.txt
mkdir -p output
mark(){ echo "=== $1 $(date -u +%H:%M:%S)" >> "$L"; }

mark "chip batch r4 (post-f32-fix re-measure) start"

# demo data (CPU-side, needed by bench + demo drives)
[ -d data/demo ] || python scripts/make_demo_data.py > output/make_demo.log 2>&1

# job1: bench verify (headline + measured train fields, post-f32-fix)
mark "job1 bench verify start"
timeout 3000 python bench.py > output/bench_r4_post_f32.json 2> output/bench_r4_post_f32.log
mark "job1 done rc=$?"
tail -1 output/bench_r4_post_f32.json >> "$L"

# job2: grad_profile 6-arm ablation at B=128 (attributes the 67-69% gap)
mark "job2 grad_profile B=128 start"
timeout 3000 python scripts/tpu_measure.py grad_profile --batch 128 > output/gp_r4.log 2>&1
mark "job2 done rc=$?"

# job3: train_ab all arms at B=128 (xla / pallas-train / +rbg / +native, post-fix)
mark "job3 train_ab all-arms B=128 start"
timeout 3000 python scripts/tpu_measure.py train_ab --batch 128 > output/tab_r4.log 2>&1
mark "job3 done rc=$?"

# job4: attention-train BB tile sweep (end-to-end arms; heuristic=BB1 at L=162)
mark "job4 attn-BB sweep start"
# (--arms dropped: a BB sweep names its own arms, and tpu_measure now
# hard-errors when both flags are passed — ADVICE r4 low #3)
timeout 3000 python scripts/tpu_measure.py train_ab --batch 128 \
  --attn_bb_list 0,2,4,8 > output/bb_r4.log 2>&1
mark "job4 done rc=$?"

# job5: scoring fused-attn-block snap race (gcd vs div) at the two L>=128 buckets
mark "job5 score_snap Nb=100 start"
timeout 1800 python scripts/tpu_measure.py score_snap --batch 64 --num_bb 100 > output/snap100_r4.log 2>&1
mark "job5 done rc=$?"
mark "job6 score_snap Nb=66 start"
timeout 1800 python scripts/tpu_measure.py score_snap --batch 64 --num_bb 66 > output/snap66_r4.log 2>&1
mark "job6 done rc=$?"

# job7: on-chip demo drives of the remaining finetune families (vqa/nlvr2/ve)
mark "job7 demo drives start"
timeout 1200 python pretrain.py --config config/demo_pretrain.json > output/demo_pretrain.log 2>&1
echo "pretrain rc=$?" >> "$L"
# Guard the glob (ADVICE r4 low #2): an empty milestone dir must skip the
# demo drives loudly instead of handing each a bare directory path.
# (pretrain.py's loader now also resolves directories to their newest
# milestone, but the guard keeps the failure mode local and legible.)
CKPT=$(ls output/demo_pretrain/ckpt/model_step* 2>/dev/null | sort -V | tail -1)
if [ -z "$CKPT" ] || [ ! -f "$CKPT" ]; then
  echo "no demo checkpoint on disk, skipping vqa/nlvr2/ve drives" >> "$L"
  mark "job7 SKIPPED (no ckpt)"
  mark "chip batch r4 done"
  exit 0
fi
timeout 900 python vqa.py --checkpoint "$CKPT" \
  --train_txt_db data/demo/en/txt_db --train_img_db data/demo/en/img_db \
  --val_txt_db data/demo/en/txt_db --val_img_db data/demo/en/img_db \
  --num_answer 16 --output_dir output/demo_vqa \
  --train_batch_size 16 --num_train_steps 10 --warmup_steps 2 \
  --valid_steps 10 --val_batches 2 --save_steps 10 --log_steps 5 > output/demo_vqa.log 2>&1
echo "vqa rc=$?" >> "$L"
timeout 900 python nlvr2.py --checkpoint "$CKPT" \
  --train_txt_db data/demo/en/txt_db --train_img_db data/demo/en/img_db \
  --fmt triplet --pred_csv output/demo_nlvr2/preds.csv \
  --output_dir output/demo_nlvr2 \
  --train_batch_size 8 --num_train_steps 10 --warmup_steps 2 \
  --valid_steps 10 --save_steps 10 --log_steps 5 > output/demo_nlvr2.log 2>&1
echo "nlvr2 rc=$?" >> "$L"
timeout 900 python ve.py --checkpoint "$CKPT" \
  --train_txt_db data/demo/en/txt_db --train_img_db data/demo/en/img_db \
  --val_txt_db data/demo/en/txt_db --val_img_db data/demo/en/img_db \
  --output_dir output/demo_ve \
  --train_batch_size 16 --num_train_steps 10 --warmup_steps 2 \
  --valid_steps 10 --val_batches 2 --save_steps 10 --log_steps 5 > output/demo_ve.log 2>&1
echo "ve rc=$?" >> "$L"
mark "job7 done"
mark "chip batch r4 done"
