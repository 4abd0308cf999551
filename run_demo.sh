#!/usr/bin/env bash
# End-to-end demo on synthetic data (the reference's launch_container.sh
# equivalent for a local environment): build a corpus, pretrain a few steps,
# finetune retrieval, run the benchmark.
set -euo pipefail
cd "$(dirname "$0")"

python scripts/make_demo_data.py
python pretrain.py --config config/demo_pretrain.json
CKPT=output/demo_pretrain/ckpt/$(ls output/demo_pretrain/ckpt | grep model_step | sort -V | tail -1)
python itm.py \
    --checkpoint "$CKPT" \
    --train_txt_db data/demo/en/txt_db --train_img_db data/demo/en/img_db \
    --val_txt_db data/demo/en/txt_db --val_img_db data/demo/en/img_db \
    --output_dir output/demo_itm \
    --num_train_steps 20 --warmup_steps 5 --valid_steps 20 \
    --eval_txt_limit 16 --log_steps 5
# the remaining finetune families (VE = VQA with 3 answers, ve.py)
python vqa.py \
    --checkpoint "$CKPT" \
    --train_txt_db data/demo/en/txt_db --train_img_db data/demo/en/img_db \
    --val_txt_db data/demo/en/txt_db --val_img_db data/demo/en/img_db \
    --num_answer 16 --output_dir output/demo_vqa \
    --train_batch_size 16 --num_train_steps 10 --warmup_steps 2 \
    --valid_steps 10 --val_batches 2 --save_steps 10 --log_steps 5
python nlvr2.py \
    --checkpoint "$CKPT" \
    --train_txt_db data/demo/en/txt_db --train_img_db data/demo/en/img_db \
    --fmt triplet --pred_csv output/demo_nlvr2/preds.csv \
    --output_dir output/demo_nlvr2 \
    --train_batch_size 8 --num_train_steps 10 --warmup_steps 2 \
    --valid_steps 10 --save_steps 10 --log_steps 5
python bench.py
