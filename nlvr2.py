"""NLVR2 finetuning driver (triplet / paired / paired-attn formats).

Reference capability: model/nlvr2.py's three model variants with
init_type_embedding (token-type table grown to 3 rows) — the reference
ships models+datasets but drives NLVR2 from external scripts; this provides
the driver with the same config conventions as the other CLIs. Final
predictions are written as the official CSV for scripts/eval_nlvr2.py.
"""

from __future__ import annotations

import argparse
import csv
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
    from uc2_tpu.models.finetune import UC2ForNlvr2, expand_type_embeddings
    from uc2_tpu.models import convert
    from uc2_tpu.parallel import mesh as M
    from uc2_tpu.training import optim as O
    from uc2_tpu.training.checkpoint import (ModelSaver, TrainingRestorer,
                                             save_training_meta)
    from uc2_tpu.training.step import TrainState, create_train_state

    from uc2_tpu.parallel import multihost as MH
    MH.maybe_initialize(opts.coordinator_address, opts.num_processes,
                        opts.process_id)
    multi = MH.process_count() > 1

    np.random.seed(opts.seed)
    os.makedirs(opts.output_dir, exist_ok=True)
    save_training_meta(opts.output_dir, vars(opts))
    TB_LOGGER.create(os.path.join(opts.output_dir, "log"))
    add_log_to_file(os.path.join(opts.output_dir, "log", "log.txt"))

    cfg = UC2Config.from_json_file(opts.model_config).replace(
        dtype=opts.dtype)
    model = UC2ForNlvr2(cfg, fmt=opts.fmt)
    params = jax.tree_util.tree_map(
        np.asarray, model.init_params(jax.random.PRNGKey(opts.seed)))
    if opts.checkpoint:
        from pretrain import load_any_checkpoint
        loaded = load_any_checkpoint(opts.checkpoint, opts)
        # grow the 2-row type table to 3 before merging
        loaded = expand_type_embeddings(loaded)
        params = convert.merge_params(params, loaded)

    txt_db = TxtTokDb(opts.train_txt_db, max_txt_len=opts.max_txt_len,
                      shard=(MH.process_index(), MH.process_count())
                      if multi else None)
    img_db = DetectFeatDb(opts.train_img_db, opts.conf_th, opts.max_bb,
                          opts.min_bb, opts.num_bb)
    if opts.fmt == "triplet":
        dataset = D.Nlvr2PairedDataset(txt_db, img_db,
                                       use_img_type=opts.use_img_type)
        nb_eff = 2 * opts.max_bb
        rows_per_ex = 1
    else:
        dataset = D.Nlvr2TwoRowDataset(txt_db, img_db,
                                       use_img_type=opts.use_img_type)
        nb_eff = opts.max_bb
        rows_per_ex = 2
    n_data = max(1, len(jax.devices()) // opts.n_model)
    groups = max(1, opts.train_batch_size)
    while (groups * rows_per_ex) % n_data:
        groups += 1
    bucket = BucketSpec(opts.max_txt_len + 2, nb_eff, groups * rows_per_ex
                        if rows_per_ex == 1 else groups, 0)
    loader = TaskLoader("nlvr2", dataset, [bucket], seed=opts.seed)

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
        return jnp.mean(loss), loss

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

        meter = RunningMeter("nlvr2_loss")
        from uc2_tpu.config import base_prng_key
        rng_key = base_prng_key(opts.seed + 1, getattr(opts, 'rng_impl', 'rbg'))
        global_step = int(state.step)
        while global_step < opts.num_train_steps:
            batch = loader.next_batch()
            batch.pop("_bucket", None)
            batch.pop("sample_size", None)
            batch = M.shard_batch(mesh, batch)
            rng_key, sub = jax.random.split(rng_key)
            state, loss = jit_step(state, batch, sub)
            global_step = int(state.step)
            meter(float(loss))
            if global_step % opts.log_steps == 0:
                LOGGER.info("step %d | %s", global_step, meter)
                TB_LOGGER.add_scalar("loss/nlvr2", meter.val, global_step)
            if opts.valid_steps and global_step % opts.valid_steps == 0:
                saver.save(jax.tree_util.tree_map(np.asarray, state.params),
                           global_step)
            restorer.step(global_step, state)

        # final predictions CSV for the official scorer
        if opts.pred_csv:
            # predictions must sweep the FULL dataset, host-identically:
            # the train txt_db is shard-striped when multi, so rebuild the
            # prediction dataset over an UNSHARDED TxtTokDb — replicating
            # per-host-distinct batches is exactly the inconsistency
            # batch_shardings' ragged guard exists to stop (ADVICE r3 low)
            if multi:
                pred_ds = type(dataset)(
                    TxtTokDb(opts.train_txt_db,
                             max_txt_len=opts.max_txt_len),
                    img_db, use_img_type=opts.use_img_type)
            else:
                pred_ds = dataset
            tl = TaskLoader("nlvr2-eval", pred_ds, [bucket], seed=0,
                            shuffle=False, drop_last=False)
            preds = {}
            ids = list(pred_ds.ids)
            # one_epoch yields every batch exactly once INCLUDING the
            # ragged tail (a floor(len/bs)-count loop silently dropped the
            # tail examples from the official CSV). Multi-host: the batch
            # is host-identical, so every leaf replicates ("replicate_all"
            # — data-sharding divisible leaves would concatenate the
            # hosts' identical copies and leave logits spanning
            # non-addressable devices); each device computes the full
            # batch redundantly, which is fine for one final sweep.
            for b in tl.one_epoch():
                b.pop("_bucket", None)
                b.pop("sample_size", None)
                logits = np.asarray(logits_fn(
                    state.params,
                    M.shard_batch(mesh, b, ragged="replicate_all"
                                  if multi else "replicate")))
                for j, p_ in enumerate(logits.argmax(-1)):
                    if len(preds) < len(ids):
                        preds[ids[len(preds)]] = \
                            "true" if p_ == 1 else "false"
            if MH.process_index() == 0:  # hosts hold identical preds —
                # one writer avoids interleaved writes on a shared fs
                with open(opts.pred_csv, "w", newline="") as f:
                    w = csv.writer(f)
                    for k, v in preds.items():
                        w.writerow([k, v])
                LOGGER.info("wrote %d predictions to %s", len(preds),
                            opts.pred_csv)
        return state


def build_parser():
    p = argparse.ArgumentParser(description="UC2-TPU NLVR2 finetune")
    p.add_argument("--config")
    p.add_argument("--model_config", default="config/uniter-base.json")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--load_embedding_only", action="store_true")
    p.add_argument("--load_layer", type=int, default=None)
    p.add_argument("--output_dir", default="output/nlvr2")
    p.add_argument("--train_txt_db")
    p.add_argument("--train_img_db")
    p.add_argument("--fmt", default="triplet",
                   choices=["triplet", "paired", "paired-attn"])
    p.add_argument("--use_img_type", action="store_true", default=True)
    p.add_argument("--pred_csv", default=None)
    p.add_argument("--max_txt_len", type=int, default=60)
    p.add_argument("--conf_th", type=float, default=0.2)
    p.add_argument("--max_bb", type=int, default=100)
    p.add_argument("--min_bb", type=int, default=10)
    p.add_argument("--num_bb", type=int, default=36)
    p.add_argument("--train_batch_size", type=int, default=32)
    p.add_argument("--learning_rate", type=float, default=3e-5)
    p.add_argument("--betas", type=float, nargs=2, default=[0.9, 0.98])
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--grad_norm", type=float, default=2.0)
    p.add_argument("--decay", default="linear")
    p.add_argument("--warmup_steps", type=int, default=500)
    p.add_argument("--num_train_steps", type=int, default=8000)
    p.add_argument("--valid_steps", type=int, default=500)
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
