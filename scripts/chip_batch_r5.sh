#!/usr/bin/env bash
# Round-5 chip batch — ordered by VERDICT r4 "Next round" priority:
#   1. prove vqa/nlvr2/ve end-to-end on chip (the round-4 deliverable that
#      fell to the ckpt-dir bug; resolver + guards now fixed, 8833b5e)
#   2. grad_profile per-arm attribution of the 67%-of-calibration gap
#      (--per_arm_proc: one bounded subprocess per arm, tunnel-EOF-proof)
#   3. the three queued kernel races (rbg dropout / native layout inside
#      train_ab's 4 arms; attn-BB sweep), now VMEM-pre-gated
# Sequential; each job bounded generously (timeouts are compile-aware:
# demo pretrain spent ~9 min compiling its 5-task × split-step programs in
# round 4); markers + RESULT lines land in bench_results.txt.
cd /root/repo
L=bench_results.txt
mkdir -p output
mark(){ echo "=== $1 $(date -u +%H:%M:%S)" >> "$L"; }

mark "chip batch r5 start"

# demo data (CPU-side, needed by the demo drives)
[ -d data/demo ] || python scripts/make_demo_data.py > output/make_demo.log 2>&1

# job1: demo pretrain — milestone lands EARLY (--save_steps 5) so a
# timeout can no longer leave an empty ckpt dir; budget covers the ~9 min
# of multi-task compiles plus the 50 steps with slack
mark "job1 demo pretrain start"
timeout 3600 python pretrain.py --config config/demo_pretrain.json \
  --save_steps 5 > output/demo_pretrain_r5.log 2>&1
mark "job1 done rc=$?"

# fail fast on a missing/empty checkpoint dir (ADVICE r4: unguarded CKPT
# collapse silently poisoned all three downstream drives). The drivers'
# resolver accepts the directory itself and picks the newest milestone.
CKPT_DIR=output/demo_pretrain/ckpt
if ! ls "$CKPT_DIR"/model_step* >/dev/null 2>&1; then
  mark "job1 produced NO checkpoint — skipping vqa/nlvr2/ve demo drives"
else
# job2-4: on-chip demo drives of the remaining finetune families
mark "job2 vqa demo start"
timeout 1800 python vqa.py --checkpoint "$CKPT_DIR" \
  --train_txt_db data/demo/en/txt_db --train_img_db data/demo/en/img_db \
  --val_txt_db data/demo/en/txt_db --val_img_db data/demo/en/img_db \
  --num_answer 16 --output_dir output/demo_vqa \
  --train_batch_size 16 --num_train_steps 10 --warmup_steps 2 \
  --valid_steps 10 --val_batches 2 --save_steps 10 --log_steps 5 \
  > output/demo_vqa.log 2>&1
mark "job2 vqa rc=$?"
mark "job3 nlvr2 demo start"
# nlvr2 defaults to uniter-base (512 bert-style positions, mirroring the
# reference's UNITER lineage) but the demo checkpoint is uc2-base (514
# XLM-R positions) — pass the matching config or merge_params rejects the
# position table (the 11:52 r5 failure)
timeout 1800 python nlvr2.py --checkpoint "$CKPT_DIR" \
  --model_config config/uc2-base.json \
  --train_txt_db data/demo/en/txt_db --train_img_db data/demo/en/img_db \
  --fmt triplet --pred_csv output/demo_nlvr2/preds.csv \
  --output_dir output/demo_nlvr2 \
  --train_batch_size 8 --num_train_steps 10 --warmup_steps 2 \
  --valid_steps 10 --save_steps 10 --log_steps 5 \
  > output/demo_nlvr2.log 2>&1
mark "job3 nlvr2 rc=$?"
mark "job4 ve demo start"
timeout 1800 python ve.py --checkpoint "$CKPT_DIR" \
  --train_txt_db data/demo/en/txt_db --train_img_db data/demo/en/img_db \
  --val_txt_db data/demo/en/txt_db --val_img_db data/demo/en/img_db \
  --output_dir output/demo_ve \
  --train_batch_size 16 --num_train_steps 10 --warmup_steps 2 \
  --valid_steps 10 --val_batches 2 --save_steps 10 --log_steps 5 \
  > output/demo_ve.log 2>&1
mark "job4 ve rc=$?"
fi

# job5: grad_profile per-arm attribution at B=128 (the round's central
# open perf question). One subprocess per arm, 1800 s each + one retry,
# results persisted incrementally — a tunnel EOF costs one arm, not all.
mark "job5 grad_profile per-arm start"
timeout 14400 python scripts/tpu_measure.py grad_profile --batch 128 \
  --per_arm_proc --arm_timeout 1800 > output/gp_r5.log 2>&1
mark "job5 done rc=$?"

# job6: train_ab 4 arms at B=128 — answers the rbg-dropout and
# native-layout races (arms are VMEM-pre-gated since 8833b5e, so the
# round-4 Mosaic OOMs become clamped-BB arms instead of dead jobs)
mark "job6 train_ab all-arms start"
timeout 5400 python scripts/tpu_measure.py train_ab --batch 128 \
  > output/tab_r5.log 2>&1
mark "job6 done rc=$?"

# NOTE: the attn-BB sweep is deliberately NOT here. tiles.max_train_bb
# says only BB=1 fits the 16 MiB scoped-VMEM budget at the train shape
# (L=162) and the native layout fits at no BB — sweeping would measure
# clamped duplicates. The sweep runs in a follow-up batch only if the
# backward kernel's footprint is reduced (dQ/dKV pass split) first.

mark "chip batch r5 done"
