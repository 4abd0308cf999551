"""UC2-TPU image-text retrieval finetuning + evaluation driver.

Reference entry point: itm.py (rank-loss finetune, hard-negative mining,
full multilingual retrieval eval, itm.py:77-538). Same CLI/JSON-config
surface; TPU-native internals (one mesh, jitted rank-loss step, static-shape
pair scoring for eval — see uc2_tpu/evalu/retrieval.py).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict

import numpy as np

from uc2_tpu.config import UC2Config, parse_with_config
from uc2_tpu.utils.logger import LOGGER, TB_LOGGER, RunningMeter, add_log_to_file


def main(opts):
    import jax
    import jax.numpy as jnp
    from uc2_tpu.data.collate import BucketSpec
    from uc2_tpu.data.db import DetectFeatDb, RoutingImageDb, TxtTokDb
    from uc2_tpu.data.loader import TaskLoader
    from uc2_tpu.data import datasets as D
    from uc2_tpu.evalu.retrieval import (full_retrieval_eval,
                                         mine_hard_negatives, quick_validate)
    from uc2_tpu.models.finetune import UC2ForImageTextRetrieval
    from uc2_tpu.models import convert
    from uc2_tpu.parallel import mesh as M
    from uc2_tpu.training import optim as O
    from uc2_tpu.training.checkpoint import (ModelSaver, TrainingRestorer,
                                             save_training_meta)
    from uc2_tpu.training.step import TrainState, create_train_state

    from uc2_tpu.parallel import multihost as MH
    MH.maybe_initialize(opts.coordinator_address, opts.num_processes,
                        opts.process_id)
    is_main = MH.process_index() == 0
    multi = MH.process_count() > 1

    np.random.seed(opts.seed)
    os.makedirs(opts.output_dir, exist_ok=True)
    if is_main:
        save_training_meta(opts.output_dir, vars(opts))
        TB_LOGGER.create(os.path.join(opts.output_dir, "log"))
        add_log_to_file(os.path.join(opts.output_dir, "log", "log.txt"))

    cfg = UC2Config.from_json_file(opts.model_config).replace(
        dtype=opts.dtype)
    if opts.dropout is not None:
        # reference set_dropout retunes EVERY nn.Dropout (utils/misc.py:54-60)
        cfg = cfg.replace(hidden_dropout_prob=opts.dropout,
                          attention_probs_dropout_prob=opts.dropout)
    model = UC2ForImageTextRetrieval(cfg, margin=opts.margin)
    # --quant int8: serving quantization for eval/validation scoring only
    # (reference serves fp16 scoring, itm.py:516-538; training stays in
    # opts.dtype — same param tree, the quantized path re-quantizes the
    # fp32 kernels on the fly)
    eval_model = (UC2ForImageTextRetrieval(cfg.replace(quant=opts.quant),
                                           margin=opts.margin)
                  if opts.quant != "none" else model)
    params = model.init_params(jax.random.PRNGKey(opts.seed))
    params = jax.tree_util.tree_map(np.asarray, params)
    if opts.checkpoint:
        from pretrain import load_any_checkpoint
        params = convert.merge_params(params,
                                      load_any_checkpoint(opts.checkpoint,
                                                          opts))
        # rank head from pretrained ITM head (reference model/itm.py:23-26)
        params = convert.init_rank_from_itm(params)

    def open_img_db(spec):
        """One path → DetectFeatDb; JSON 2-list '["train_db","val_db"]' →
        split-spanning RoutingImageDb (the reference's COCO-CN case: text
        dbs reference images in either train2014 or val2014 feature dbs,
        itm.py:140-147 + data/itm.py:363-506)."""
        if isinstance(spec, str) and spec.lstrip().startswith("["):
            spec = json.loads(spec)
        if isinstance(spec, (list, tuple)):
            assert len(spec) == 2, "routing expects [train_db, val_db]"
            mk = lambda p: DetectFeatDb(p, opts.conf_th, opts.max_bb,  # noqa: E731
                                        opts.min_bb, opts.num_bb)
            return RoutingImageDb({"train2014": mk(spec[0]),
                                   "val2014": mk(spec[1])})
        return DetectFeatDb(spec, opts.conf_th, opts.max_bb,
                            opts.min_bb, opts.num_bb)

    # ---- data: train texts shard per host (reference data/data.py:201-203).
    # Multi-db: --train_txt_db may be a JSON list (the reference's
    # train_txt_dbs, config/uc2_mscoco_itm.json:41-57 — the multilingual
    # COCO recipe concatenates en/ja/zh pairs); --train_img_db then lists
    # one spec per txt db, each itself a path or a 2-list routing spec
    # (the COCO-CN split-spanning case).
    txt_specs = opts.train_txt_db
    if isinstance(txt_specs, str) and txt_specs.lstrip().startswith("["):
        txt_specs = json.loads(txt_specs)
    if not isinstance(txt_specs, (list, tuple)):
        txt_specs = [txt_specs]
    if len(txt_specs) > 1:
        img_specs = opts.train_img_db
        if isinstance(img_specs, str):
            img_specs = json.loads(img_specs)
        assert isinstance(img_specs, (list, tuple)) \
            and len(img_specs) == len(txt_specs), \
            "--train_img_db must list one spec per train txt db"
    else:
        # single-db: a list-valued img spec is the ROUTING form
        img_specs = [opts.train_img_db]
    shard = ((MH.process_index(), MH.process_count()) if multi else None)
    pairs = [(TxtTokDb(t, max_txt_len=opts.max_txt_len, shard=shard),
              open_img_db(im))
             for t, im in zip(txt_specs, img_specs)]
    if opts.hard_neg_size > 0:
        subs = [D.ItmRankHardNegDataset(t, im, opts.negative_size,
                                        opts.hard_neg_size)
                for t, im in pairs]
    else:
        subs = [D.ItmRankDataset(t, im, opts.negative_size)
                for t, im in pairs]
    dataset = subs[0] if len(subs) == 1 else D.ConcatDataset(subs)
    sample_size = subs[0].sample_size
    group_count = max(1, opts.train_batch_size // sample_size)
    # flattened rows (groups × sample_size) should divide the data axis
    n_data = len(__import__("jax").devices()) // opts.n_model
    while (group_count * sample_size) % n_data and group_count > 1:
        group_count += 1
    bucket = BucketSpec(opts.max_txt_len + 2, opts.max_bb,
                        group_count, 0)
    loader = TaskLoader("itm-rank", dataset, [bucket], seed=opts.seed)

    val_txt_db = TxtTokDb(opts.val_txt_db, max_txt_len=opts.max_txt_len) \
        if opts.val_txt_db else None
    val_img_db = open_img_db(opts.val_img_db) if opts.val_img_db else None

    # ---- optimizer: optionally separate XLM-R lr (itm.py:216-219)
    lr_fn = O.get_lr_schedule(opts.decay, opts.learning_rate,
                              opts.warmup_steps, opts.num_train_steps)
    if opts.separate_lr:
        xlmr_fn = O.get_lr_schedule(opts.decay, opts.xlmr_lr,
                                    opts.warmup_steps, opts.num_train_steps)
        tx = O.build_xlmr_optimizer(params, lr_fn, xlmr_fn,
                                    opts.weight_decay, tuple(opts.betas),
                                    grad_norm=opts.grad_norm,
                                    load_layer=opts.load_layer,
                                    optim=opts.optim)
    else:
        tx = O.build_optimizer(params, lr_fn, opts.weight_decay,
                               tuple(opts.betas), grad_norm=opts.grad_norm,
                               optim=opts.optim)

    mesh = M.make_mesh(n_model=opts.n_model)
    sharded = M.shard_params(mesh, params)
    del params

    def loss_fn(p, batch, rng):
        loss = model.rank_loss(p, batch, sample_size, deterministic=False,
                               rngs={"dropout": rng})
        return jnp.mean(loss), loss

    import optax

    def train_step(state, batch, rng):
        # leading [accum] micro-batch axis → lax.scan grad accumulation
        # (reference finetune default gradient_accumulation_steps=8,
        # config/uc2_mscoco_itm.json:17)
        if batch["input_ids"].ndim == 3:
            A = batch["input_ids"].shape[0]
            rngs = jax.random.split(rng, A)

            def body(carry, xs):
                g_acc, l_acc = carry
                mb, r = xs
                (loss, _), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params, mb, r)
                return (jax.tree_util.tree_map(jnp.add, g_acc, g),
                        l_acc + loss), None

            zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (grads, loss), _ = jax.lax.scan(
                body, (zero_g, jnp.float32(0.0)), (batch, rngs))
            grads = jax.tree_util.tree_map(lambda g: g / A, grads)
            loss = loss / A
        else:
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, new_params, opt_state), loss

    def host_params(state):
        # eval runs per-host on host-local replicas (multi-process: global
        # arrays can't mix with locally-placed eval batches in one jit)
        return jax.device_get(state.params) if multi else state.params

    with mesh:
        state = jax.jit(lambda p: create_train_state(p, tx))(sharded)
        z1_out = None
        if opts.zero1:
            # ZeRO-1 optimizer-state sharding over the data axis; the
            # out_shardings pin below keeps params replicated (without it
            # GSPMD drifts them data-sharded — silent ZeRO-3;
            # step.py:zero1_out_shardings)
            from uc2_tpu.training.step import zero1_out_shardings
            state = state._replace(
                opt_state=M.shard_opt_state(mesh, state.opt_state))
            z1_out = zero1_out_shardings(mesh, state.params,
                                         state.opt_state)["fused"]
        restorer = TrainingRestorer(
            opts.output_dir, {"lr": opts.learning_rate, "seed": opts.seed},
            save_steps=opts.save_steps, write=is_main)
        if multi:
            assert MH.broadcast_object(restorer.restore_pending) \
                == restorer.restore_pending, \
                "restore.pt visible on some hosts only — multi-host " \
                "resume needs output_dir on a shared filesystem"
        if restorer.restore_pending:
            state = restorer.restore(state)
            LOGGER.info("resumed at step %d", int(state.step))
        if opts.async_ckpt:
            from uc2_tpu.training.checkpoint import OrbaxCheckpointer
            ockpt = OrbaxCheckpointer(os.path.join(opts.output_dir,
                                                   "orbax"))

            def save_milestone(st, step):
                ockpt.save(step, st.params)
        else:
            saver = ModelSaver(opts.output_dir)

            def save_milestone(st, step):
                saver.save(jax.tree_util.tree_map(
                    np.asarray, jax.device_get(st.params)), step)
        jit_step = jax.jit(train_step, out_shardings=z1_out)

        meter = RunningMeter("rank_loss")
        from uc2_tpu.config import base_prng_key
        rng_key = base_prng_key(opts.seed + 1, getattr(opts, 'rng_impl', 'rbg'))
        global_step = int(state.step)

        def _mine_path(step, db_idx=0):
            # per-HOST artifact under multi-host: txt_db is shard-striped,
            # so each host mines a host-distinct pool — one shared filename
            # would race concurrent writers on the shared output_dir
            tag = f"hard_negs_{step}"
            if len(pairs) > 1:
                tag += f".db{db_idx}"
            if multi:
                tag += f".host{MH.process_index()}"
            return os.path.join(opts.output_dir, tag + ".json")

        def mine_all(step):
            # pools are per (txt_db, img_db) pair: negatives must come from
            # the SAME language/db an anchor trains against (the reference
            # mines per train dataloader, itm.py:385-445)
            for k, ((tdb_k, idb_k), sub) in enumerate(zip(pairs, subs)):
                sub.reload_hard_negs(mine_hard_negatives(
                    model, host_params(state), tdb_k, idb_k,
                    opts.max_txt_len + 2, opts.max_bb,
                    hard_neg_size=opts.hard_neg_pool_size,
                    batch_size=opts.eval_batch_size,
                    out_path=_mine_path(step, k)))

        if opts.hard_neg_size > 0:
            # reference mines once BEFORE training starts (itm.py:233-235)
            # so hard slots never run on the random fallback — gated on
            # hard_neg_size alone: the dataset selects hard slots on it, so
            # leaving --hard_neg_steps at 0 must still seed the pools
            LOGGER.info("initial hard-negative mining")
            mine_all(0)
            if not opts.hard_neg_steps:
                LOGGER.warning("--hard_neg_steps=0: pools mined once at "
                               "start, periodic re-mining disabled")
        start = time.time()
        n_ex = 0
        accum = max(1, opts.gradient_accumulation_steps)
        while global_step < opts.num_train_steps:
            batch = (loader.next_stacked(accum) if accum > 1
                     else loader.next_batch())
            batch.pop("_bucket", None)
            batch.pop("sample_size", None)
            batch.pop("targets", None)
            bs = batch["input_ids"].shape
            n_ex += bs[0] * bs[1] if accum > 1 else bs[0]
            batch = M.shard_batch(mesh, batch, stacked=accum > 1)
            rng_key, sub = jax.random.split(rng_key)
            state, loss = jit_step(state, batch, sub)
            global_step = int(state.step)
            meter(float(loss))

            if global_step % opts.log_steps == 0:
                LOGGER.info("step %d | %.0f ex/s | %s", global_step,
                            n_ex / max(time.time() - start, 1e-9), meter)
                TB_LOGGER.add_scalar("loss/rank", meter.val, global_step)
                TB_LOGGER.add_scalar("lr", float(lr_fn(global_step)),
                                     global_step)

            if opts.valid_steps and global_step % opts.valid_steps == 0 \
                    and val_txt_db is not None:
                if opts.full_val:
                    # all-pairs matrix (reference evaluate(), itm.py:492-538)
                    log = full_retrieval_eval(
                        eval_model, host_params(state), val_txt_db,
                        val_img_db,
                        opts.max_txt_len + 2, opts.max_bb,
                        batch_size=opts.eval_batch_size,
                        txt_ids=val_txt_db.ids[:opts.eval_txt_limit]
                        if opts.eval_txt_limit else None)
                else:
                    # rank GT among a 400-image pool (reference validate(),
                    # itm.py:448-489)
                    log = quick_validate(
                        eval_model, host_params(state), val_txt_db,
                        val_img_db,
                        opts.max_txt_len + 2, opts.max_bb,
                        n_txts=opts.eval_txt_limit or None,
                        batch_size=opts.eval_batch_size)
                LOGGER.info("validation R@K: %s",
                            {k: round(v, 4) for k, v in log.items()})
                TB_LOGGER.log_scalar_dict(log, prefix="val")
                if is_main or opts.async_ckpt:
                    save_milestone(state, global_step)

            if (opts.hard_neg_size > 0 and opts.hard_neg_steps
                    and global_step % opts.hard_neg_steps == 0):
                LOGGER.info("mining hard negatives at step %d", global_step)
                mine_all(global_step)
            # all hosts (collective gather under zero1; write=is_main)
            restorer.step(global_step, state)

        # final full evaluation on every test db pair (itm.py:367-381)
        results = {}
        for spec in opts.test_datasets or []:
            tdb = TxtTokDb(spec["db"], max_txt_len=opts.max_txt_len)
            idb = open_img_db(spec["img"])
            log = full_retrieval_eval(eval_model, host_params(state), tdb,
                                      idb, opts.max_txt_len + 2, opts.max_bb,
                                      batch_size=opts.eval_batch_size)
            LOGGER.info("test [%s]: %s", spec.get("name", spec["db"]),
                        {k: round(v, 4) for k, v in log.items()})
            results[spec.get("name", spec["db"])] = log
        if results:
            with open(os.path.join(opts.output_dir, "test_results.json"),
                      "w") as f:
                json.dump(results, f, indent=2)
        if opts.async_ckpt:
            ockpt.wait()          # finalize in-flight async saves
        return state, results


def build_parser():
    p = argparse.ArgumentParser(description="UC2-TPU retrieval finetune")
    p.add_argument("--config")
    p.add_argument("--model_config", default="config/uc2-base.json")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--load_embedding_only", action="store_true")
    p.add_argument("--load_layer", type=int, default=None)
    p.add_argument("--output_dir", default="output/itm")
    p.add_argument("--train_txt_db", type=str, default=None)
    p.add_argument("--train_img_db", type=str, default=None)
    p.add_argument("--val_txt_db", type=str, default=None)
    p.add_argument("--val_img_db", type=str, default=None)
    p.add_argument("--test_datasets", type=json.loads, default=None)
    p.add_argument("--max_txt_len", type=int, default=60)
    p.add_argument("--conf_th", type=float, default=0.2)
    p.add_argument("--max_bb", type=int, default=100)
    p.add_argument("--min_bb", type=int, default=10)
    p.add_argument("--num_bb", type=int, default=36)
    p.add_argument("--margin", type=float, default=0.2)
    p.add_argument("--negative_size", type=int, default=1)
    p.add_argument("--hard_neg_size", type=int, default=0,
                   help="hard negatives per positive (reference "
                        "--hard_neg_size, itm.py:578)")
    p.add_argument("--hard_neg_pool_size", type=int, default=20,
                   help="mined pool size each hard slot samples from "
                        "(reference itm.py:583, mining at :233-235)")
    p.add_argument("--hard_neg_steps", type=int, default=0,
                   help="mine every N steps (reference --steps_per_hard_neg)")
    p.add_argument("--train_batch_size", type=int, default=40,
                   help="examples (groups × sample_size) per step")
    p.add_argument("--eval_batch_size", type=int, default=64)
    p.add_argument("--quant", choices=["none", "int8"], default="none",
                   help="serving quantization for eval/validation scoring")
    p.add_argument("--eval_txt_limit", type=int, default=0)
    p.add_argument("--full_val", action="store_true",
                   help="full score-matrix validation instead of the "
                        "400-image quick val")
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--separate_lr", action="store_true")
    p.add_argument("--xlmr_lr", type=float, default=1e-7)
    p.add_argument("--betas", type=float, nargs=2, default=[0.9, 0.98])
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--optim", type=str, default="adamw",
                   choices=["adam", "adamax", "adamw"],
                   help="reference optim/misc.py:21-29")
    p.add_argument("--dropout", type=float, default=None,
                   help="override every dropout prob (reference "
                        "set_dropout, utils/misc.py:54-60)")
    p.add_argument("--grad_norm", type=float, default=2.0)
    p.add_argument("--decay", default="linear")
    p.add_argument("--warmup_steps", type=int, default=5000)
    p.add_argument("--num_train_steps", type=int, default=50000)
    p.add_argument("--valid_steps", type=int, default=5000)
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
    p.add_argument("--gradient_accumulation_steps", type=int, default=1,
                   help="micro-batches per optimizer step, scan-accumulated "
                        "in-step (reference default 8, "
                        "config/uc2_mscoco_itm.json:17)")
    p.add_argument("--n_model", type=int, default=1)
    p.add_argument("--zero1", action="store_true",
                   help="shard optimizer state over the data axis "
                        "(ZeRO-1); identical math, 1/N apply traffic")
    p.add_argument("--async_ckpt", action="store_true",
                   help="milestone checkpoints via orbax")
    # multi-host (reference: horovodrun -np N, README.md:32-42)
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 — enables "
                        "jax.distributed.initialize")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p


def apply_reference_config_compat(opts, parser=None, argv=None):
    """Map the reference's own itm config keys onto this driver's flags so
    an existing ``uc2_mscoco_itm.json`` works after path conversion
    (reference key inventory: /root/reference/config/uc2_mscoco_itm.json;
    its loader semantics — CLI wins over JSON — are utils/misc.py:23-33,
    so a mapped key only fills a flag still at its parser default).

    Same-named keys (margin, learning_rate, betas, …) need no mapping —
    ``parse_with_config`` already set them. This handles the renames:
    plural db lists, 1-element val lists, test_txt_db/test_img_db →
    ``--test_datasets``, steps_per_hard_neg → ``--hard_neg_steps``,
    inf_minibatch_size → ``--eval_batch_size``.
    """
    import sys
    src = argv if argv is not None else sys.argv[1:]
    overridden = {a[2:].split("=")[0] for a in src if a.startswith("--")}

    def fill(name, value):
        # CLI wins even when the passed value equals the parser default
        if name in overridden:
            return
        default = parser.get_default(name) if parser is not None else None
        if getattr(opts, name, None) == default:
            setattr(opts, name, value)

    if getattr(opts, "train_txt_dbs", None) is not None:
        fill("train_txt_db", opts.train_txt_dbs)
    if getattr(opts, "train_img_dbs", None) is not None:
        fill("train_img_db", opts.train_img_dbs)
    # reference val_txt_db/val_img_db are (1-element) LISTS; ours are
    # single paths. Only a list-valued val_txt_db marks the reference
    # form — a list-valued val_img_db alone is OUR routing spec.
    vt = getattr(opts, "val_txt_db", None)
    if isinstance(vt, (list, tuple)):
        if len(vt) > 1:
            LOGGER.warning("val_txt_db lists %d dbs; validating on the "
                           "first (put the rest in --test_datasets)",
                           len(vt))
        opts.val_txt_db = vt[0] if vt else None
        vi = getattr(opts, "val_img_db", None)
        if isinstance(vi, (list, tuple)):
            opts.val_img_db = vi[0] if vi else None
    tt = getattr(opts, "test_txt_db", None)
    if tt and getattr(opts, "test_datasets", None) is None:
        ti = getattr(opts, "test_img_db", None)
        if isinstance(tt, str):
            tt = [tt]
        if isinstance(ti, str) or ti is None:
            ti = [ti] * len(tt)
        opts.test_datasets = [
            {"db": d, "img": im,
             "name": os.path.basename(str(d).rstrip("/"))}
            for d, im in zip(tt, ti)]
    sp = getattr(opts, "steps_per_hard_neg", None)
    if sp is not None and sp > 0:
        fill("hard_neg_steps", sp)
    imb = getattr(opts, "inf_minibatch_size", None)
    if imb:
        fill("eval_batch_size", imb)
    tl = getattr(opts, "train_loss", None)
    if tl not in (None, "rank"):
        raise SystemExit(f"train_loss={tl!r}: only the reference's "
                         "shipping 'rank' objective is supported")
    return opts


if __name__ == "__main__":
    parser = build_parser()
    opts = parse_with_config(parser)
    apply_reference_config_compat(opts, parser)
    main(opts)
