"""UC2-TPU VQA finetuning driver.

Reference capability: VLXLMRForVisualQuestionAnswering (model/vqa.py:14-50)
with soft-score BCE targets (data/vqa.py) and the multilingual answer maps
(misc/ans2label*.json) — the reference ships model+data but no dedicated
driver; this provides one with the same config conventions as pretrain.py /
itm.py. Supports the MCAN 'vqa' LR staircase (optim/sched.py:20-31).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from uc2_tpu.config import UC2Config, parse_with_config
from uc2_tpu.utils.logger import LOGGER, TB_LOGGER, RunningMeter, add_log_to_file


def main(opts):
    import jax
    import jax.numpy as jnp
    import optax
    from uc2_tpu.data.collate import BucketSpec
    from uc2_tpu.data.db import DetectFeatDb, TxtTokDb
    from uc2_tpu.data.loader import TaskLoader
    from uc2_tpu.data import datasets as D
    from uc2_tpu.models.finetune import UC2ForVqa
    from uc2_tpu.models import convert
    from uc2_tpu.parallel import mesh as M
    from uc2_tpu.training import optim as O
    from uc2_tpu.training.checkpoint import (ModelSaver, TrainingRestorer,
                                             save_training_meta)
    from uc2_tpu.training.step import TrainState, create_train_state
    from uc2_tpu.utils.vqa_answers import load_ans2label

    from uc2_tpu.parallel import multihost as MH
    MH.maybe_initialize(opts.coordinator_address, opts.num_processes,
                        opts.process_id)
    multi = MH.process_count() > 1

    np.random.seed(opts.seed)
    os.makedirs(opts.output_dir, exist_ok=True)
    save_training_meta(opts.output_dir, vars(opts))
    TB_LOGGER.create(os.path.join(opts.output_dir, "log"))
    add_log_to_file(os.path.join(opts.output_dir, "log", "log.txt"))

    if opts.num_answer is None:
        opts.num_answer = len(load_ans2label(opts.ans2label))
    cfg = UC2Config.from_json_file(opts.model_config).replace(
        dtype=opts.dtype)
    model = UC2ForVqa(cfg, num_answer=opts.num_answer)
    params = jax.tree_util.tree_map(
        np.asarray, model.init_params(jax.random.PRNGKey(opts.seed)))
    if opts.checkpoint:
        from pretrain import load_any_checkpoint
        params = convert.merge_params(params,
                                      load_any_checkpoint(opts.checkpoint,
                                                          opts))

    txt_db = TxtTokDb(opts.train_txt_db, max_txt_len=opts.max_txt_len,
                      shard=(MH.process_index(), MH.process_count())
                      if multi else None)
    img_db = DetectFeatDb(opts.train_img_db, opts.conf_th, opts.max_bb,
                          opts.min_bb, opts.num_bb)
    dataset = D.VqaDataset(txt_db, img_db, num_answers=opts.num_answer)
    n_data = len(jax.devices()) // opts.n_model
    bsz = max(n_data, opts.train_batch_size // n_data * n_data)
    bucket = BucketSpec(opts.max_txt_len + 2, opts.max_bb, bsz, 0)
    loader = TaskLoader("vqa", dataset, [bucket], seed=opts.seed)

    if opts.decay == "vqa":
        lr_fn = O.vqa_schedule(opts.learning_rate, opts.warm_int,
                               opts.decay_int, opts.decay_st,
                               opts.decay_rate)
    else:
        lr_fn = O.get_lr_schedule(opts.decay, opts.learning_rate,
                                  opts.warmup_steps, opts.num_train_steps)
    tx = O.build_optimizer(params, lr_fn, opts.weight_decay,
                           tuple(opts.betas), grad_norm=opts.grad_norm)
    mesh = M.make_mesh(n_model=opts.n_model)
    sharded = M.shard_params(mesh, params)
    del params

    def loss_fn(p, batch, rng):
        loss = model.loss(p, batch, deterministic=False,
                          rngs={"dropout": rng})
        return jnp.mean(jnp.sum(loss, axis=-1)), loss

    def train_step(state, batch, rng):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return TrainState(state.step + 1,
                          optax.apply_updates(state.params, updates),
                          opt_state), loss

    with mesh:
        state = jax.jit(lambda p: create_train_state(p, tx))(sharded)
        restorer = TrainingRestorer(opts.output_dir,
                                    {"lr": opts.learning_rate,
                                     "seed": opts.seed},
                                    save_steps=opts.save_steps,
                                    write=MH.process_index() == 0)
        if restorer.restore_pending:
            state = restorer.restore(state)
        saver = ModelSaver(opts.output_dir)
        jit_step = jax.jit(train_step)
        logits_fn = jax.jit(
            lambda p, b: model.logits(p, b, deterministic=True))

        meter = RunningMeter("vqa_loss")
        from uc2_tpu.config import base_prng_key
        rng_key = base_prng_key(opts.seed + 1, getattr(opts, 'rng_impl', 'rbg'))
        global_step = int(state.step)
        while global_step < opts.num_train_steps:
            batch = loader.next_batch()
            batch.pop("_bucket", None)
            batch = M.shard_batch(mesh, batch)
            rng_key, sub = jax.random.split(rng_key)
            state, loss = jit_step(state, batch, sub)
            global_step = int(state.step)
            meter(float(loss))
            if global_step % opts.log_steps == 0:
                LOGGER.info("step %d | %s", global_step, meter)
                TB_LOGGER.add_scalar("loss/vqa", meter.val, global_step)
            if opts.valid_steps and global_step % opts.valid_steps == 0:
                score = validate(model, state, opts, logits_fn, mesh)
                saver.save(jax.tree_util.tree_map(np.asarray, state.params),
                           global_step)
            restorer.step(global_step, state)
        return state


def validate(model, state, opts, logits_fn, mesh):
    """VQA soft-score validation: Σ target[argmax] / n (the VQA metric)."""
    import jax
    from uc2_tpu.data.collate import BucketSpec
    from uc2_tpu.data.db import DetectFeatDb, TxtTokDb
    from uc2_tpu.data.loader import TaskLoader
    from uc2_tpu.data import datasets as D
    from uc2_tpu.parallel import mesh as M
    if not opts.val_txt_db:
        return None
    txt_db = TxtTokDb(opts.val_txt_db, max_txt_len=opts.max_txt_len)
    img_db = DetectFeatDb(opts.val_img_db, opts.conf_th, opts.max_bb,
                          opts.min_bb, opts.num_bb)
    ds = D.VqaDataset(txt_db, img_db, num_answers=opts.num_answer)
    bucket = BucketSpec(opts.max_txt_len + 2, opts.max_bb, 32, 0)
    tl = TaskLoader("vqa-val", ds, [bucket], seed=0, shuffle=False,
                    drop_last=False)
    score = n = 0.0
    for _ in range(opts.val_batches):
        batch = tl.next_batch()
        batch.pop("_bucket", None)
        # val DB is unsharded → host-identical, ragged replication is safe
        logits = np.asarray(logits_fn(
            state.params, M.shard_batch(mesh, batch, ragged="replicate")))
        pred = logits.argmax(-1)
        tgt = np.asarray(batch["soft_targets"])
        live = np.asarray(batch["attn_mask"]).sum(-1) > 0
        score += float(tgt[np.arange(len(pred)), pred][live].sum())
        n += float(live.sum())
    acc = score / max(n, 1)
    LOGGER.info("VQA val soft-acc: %.4f over %d", acc, int(n))
    TB_LOGGER.add_scalar("valid/vqa_score", acc)
    return acc


def build_parser():
    p = argparse.ArgumentParser(description="UC2-TPU VQA finetune")
    p.add_argument("--config")
    p.add_argument("--model_config", default="config/uc2-base.json")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--load_embedding_only", action="store_true")
    p.add_argument("--load_layer", type=int, default=None)
    p.add_argument("--output_dir", default="output/vqa")
    p.add_argument("--train_txt_db")
    p.add_argument("--train_img_db")
    p.add_argument("--val_txt_db", default=None)
    p.add_argument("--val_img_db", default=None)
    p.add_argument("--ans2label", default="ans2label.json",
                   help="asset name (e.g. ans2label_ja.json)")
    p.add_argument("--num_answer", type=int, default=None)
    p.add_argument("--max_txt_len", type=int, default=60)
    p.add_argument("--conf_th", type=float, default=0.2)
    p.add_argument("--max_bb", type=int, default=100)
    p.add_argument("--min_bb", type=int, default=10)
    p.add_argument("--num_bb", type=int, default=36)
    p.add_argument("--train_batch_size", type=int, default=64)
    p.add_argument("--learning_rate", type=float, default=8e-5)
    p.add_argument("--betas", type=float, nargs=2, default=[0.9, 0.98])
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--grad_norm", type=float, default=2.0)
    p.add_argument("--decay", default="linear")
    p.add_argument("--warmup_steps", type=int, default=600)
    p.add_argument("--warm_int", type=int, default=2000)
    p.add_argument("--decay_int", type=int, default=2000)
    p.add_argument("--decay_st", type=int, default=9000)
    p.add_argument("--decay_rate", type=float, default=0.2)
    p.add_argument("--num_train_steps", type=int, default=6000)
    p.add_argument("--valid_steps", type=int, default=500)
    p.add_argument("--val_batches", type=int, default=8)
    p.add_argument("--save_steps", type=int, default=200)
    p.add_argument("--log_steps", type=int, default=100)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--rng_impl",
                   choices=["threefry2x32", "rbg"],
                   default="rbg",
                   help="dropout PRNG: rbg = TPU hardware "
                        "RngBitGenerator (cheaper masks, "
                        "different streams)")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--n_model", type=int, default=1)
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 — enables "
                        "jax.distributed.initialize")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p


if __name__ == "__main__":
    opts = parse_with_config(build_parser())
    main(opts)
