"""UC2-TPU multi-task pretraining driver.

Reference entry point: pretrain.py (``horovodrun -np N python pretrain.py
--config config/uc2_pretrain.json``, README.md:32-42). Same CLI surface
(argparse + JSON config where CLI wins, utils/misc.py:23-33), same
data-driven task mix (``train_datasets[].{name,db,img,tasks,mix_ratio}``,
config/uc2_pretrain.json:45-208), TPU-native internals:

  * one process drives a jax.sharding Mesh('data','model'); Horovod
    broadcast/allreduce (pretrain.py:457, 560-566) disappear into GSPMD.
  * each (task, bucket-shape) pair is one jitted train step; the task
    schedule is a pure function of the step index (no per-step collective,
    reference pretrain.py:517 all_gather_list sanity check included as a
    free invariant).
  * bf16 activations / fp32 params+Adam state replace apex amp O2 and its
    per-task loss scalers (pretrain.py:463-465).
  * gradient accumulation happens inside the step via lax.scan over a
    leading micro-batch axis.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import time
from collections import defaultdict
from typing import Any, Dict, List, Optional

import numpy as np

from uc2_tpu.config import UC2Config, parse_with_config
from uc2_tpu.utils.logger import LOGGER, TB_LOGGER, RunningMeter, add_log_to_file


def build_datasets(opts, which: str = "train", shard=None):
    """Instantiate task datasets from the config's dataset specs
    (mirrors pretrain.py:277-381 create_dataloaders).

    ``shard=(rank, world)`` stripes each text DB's ids across hosts —
    the reference's in-dataset DP sharding (data/data.py:201-203)."""
    from uc2_tpu.data.db import ImageDbGroup, SoftLabelDb, TxtTokDb
    from uc2_tpu.data.labels import LabelVocab, hash_tokenize
    from uc2_tpu.data import datasets as D

    specs = getattr(opts, f"{which}_datasets")
    img_group = ImageDbGroup(opts.conf_th, opts.max_bb, opts.min_bb,
                             opts.num_bb)
    label_vocab = None
    out: Dict[str, Any] = {}
    for spec in specs:
        name = spec["name"]
        lang = spec.get("language", name.split("_")[-1]
                        if "_" in name else "en")
        txt_dbs = spec["db"] if isinstance(spec["db"], list) else [spec["db"]]
        img_dbs = spec["img"] if isinstance(spec["img"], list) \
            else [spec["img"]]
        sl_dbs = spec.get("img_token_soft_label")
        for i, (tpath, ipath) in enumerate(zip(txt_dbs, img_dbs)):
            txt_db = TxtTokDb(tpath, max_txt_len=opts.max_txt_len,
                              shard=shard)
            img_db = img_group[ipath]
            for task, ratio in zip(spec["tasks"], spec["mix_ratio"]):
                key = f"{task}_{name}" + (f"_{i}" if len(txt_dbs) > 1 else "")
                if task in ("vmlm", "mmxlm", "vmlm-soft", "mmxlm-soft") \
                        and label_vocab is None:
                    n_cls = getattr(opts, "label_classes", 1601)
                    if n_cls != 1601:
                        # reduced detector vocabulary (tests / custom data)
                        label_vocab = LabelVocab(
                            words={"en": [f"class{i}"
                                          for i in range(n_cls - 1)]})
                    else:
                        label_vocab = LabelVocab()
                    if label_vocab.source == "hash":
                        LOGGER.warning(
                            "LabelVocab using hash-fallback token ids (no "
                            "XLM-R tokenizer/assets in this environment)")
                # --no_multilingual_vmlm: reference only builds the
                # per-language list when the flag is on (pretrain.py:301-311)
                vm_lang = lang if opts.multilingual_vmlm else "en"
                if task == "mlm":
                    ds = D.MlmDataset(txt_db, img_db, opts.mlm_prob)
                elif task in ("tlm", "tlm-ni") and not opts.co_masking:
                    # reference build_tlm_dataset without co_masking falls
                    # back to plain MLM over the bilingual record — for
                    # tlm-ni too, the train branch ignores text_only
                    # (pretrain.py:142-144)
                    ds = D.MlmDataset(txt_db, img_db, opts.mlm_prob)
                elif task == "tlm":
                    ds = D.TlmDataset(txt_db, img_db, opts.comasking_mode,
                                      mask_prob=opts.mlm_prob)
                elif task == "tlm-ni":
                    ds = D.TlmDataset(txt_db, img_db, opts.comasking_mode,
                                      text_only=True,
                                      mask_prob=opts.mlm_prob)
                elif task == "vmlm":
                    ds = D.VmlmDataset(txt_db, img_db, opts.mrm_prob,
                                       label_vocab, vm_lang)
                elif task == "mmxlm":
                    ds = D.MmxlmDataset(txt_db, img_db, opts.mrm_prob,
                                        label_vocab, vm_lang)
                elif task in ("vmlm-soft", "mmxlm-soft"):
                    sl = SoftLabelDb(sl_dbs[i]) if sl_dbs else None
                    cls_ = (D.VmlmSoftDataset if task == "vmlm-soft"
                            else D.MmxlmSoftDataset)
                    ds = cls_(txt_db, img_db, opts.mrm_prob, label_vocab,
                              soft_label_db=sl)
                elif task == "mrfr":
                    ds = D.MrfrDataset(txt_db, img_db, opts.mrm_prob)
                elif task == "mrm-nce":
                    ds = D.MrmNceDataset(txt_db, img_db, opts.mrm_prob,
                                         neg_size=opts.nce_neg_size)
                elif task.startswith("mrc"):
                    ds = D.MrcDataset(txt_db, img_db, opts.mrm_prob)
                elif task.startswith("itm"):
                    cls_ = (D.ItmHardNegDataset if opts.itm_hard_neg
                            else D.ItmDataset)
                    ds = cls_(txt_db, img_db, opts.itm_neg_prob)
                else:
                    raise ValueError(f"undefined task {task}")
                out[key] = {"dataset": ds, "ratio": ratio, "task": task}
    return out, label_vocab


def main(opts):
    import jax
    from uc2_tpu.data.collate import default_buckets
    from uc2_tpu.data.loader import MetaLoader, TaskLoader
    from uc2_tpu.models.pretraining import UC2ForPretraining
    from uc2_tpu.models import convert
    from uc2_tpu.parallel import mesh as M
    from uc2_tpu.training import optim as O
    from uc2_tpu.training.checkpoint import (ModelSaver, TrainingRestorer,
                                             save_training_meta)
    from uc2_tpu.training.step import (create_train_state, make_eval_step,
                                       make_train_step)

    from uc2_tpu.parallel import multihost as MH
    MH.maybe_initialize(opts.coordinator_address, opts.num_processes,
                        opts.process_id)
    is_main = MH.process_index() == 0
    multi = MH.process_count() > 1

    np.random.seed(opts.seed)
    os.makedirs(opts.output_dir, exist_ok=True)
    if is_main:
        # rank0-only writers (reference NoOp swap, pretrain.py:401-410)
        save_training_meta(opts.output_dir, vars(opts))
        TB_LOGGER.create(os.path.join(opts.output_dir, "log"))
        add_log_to_file(os.path.join(opts.output_dir, "log", "log.txt"))

    # ---- model
    cfg = UC2Config.from_json_file(opts.model_config).replace(
        dtype=opts.dtype)
    if opts.dropout is not None:
        # reference set_dropout retunes EVERY nn.Dropout (utils/misc.py:54-60,
        # applied at pretrain.py:458)
        cfg = cfg.replace(hidden_dropout_prob=opts.dropout,
                          attention_probs_dropout_prob=opts.dropout)
    model = UC2ForPretraining(cfg, ot_pos_only=opts.ot_pos_only,
                              nce_temp=opts.nce_temp,
                              lm_ce_chunks=opts.lm_ce_chunks)
    params = model.init_params(jax.random.PRNGKey(opts.seed))
    if opts.checkpoint:
        LOGGER.info("loading checkpoint %s", opts.checkpoint)
        params = convert.merge_params(
            jax.tree_util.tree_map(np.asarray, params),
            load_any_checkpoint(opts.checkpoint, opts))
    if opts.early_adaptation_checkpoint:
        params = convert.splice_early_adaptation(
            params, load_raw_checkpoint(opts.early_adaptation_checkpoint))

    # ---- data: train DBs shard per host (reference data/data.py:201-203);
    # val stays replicated so every host computes identical metrics in
    # lockstep without a gather
    train, label_vocab = build_datasets(
        opts, "train",
        shard=(MH.process_index(), MH.process_count()) if multi else None)
    val, _ = (build_datasets(opts, "val") if opts.val_datasets
              else ({}, None))
    buckets = default_buckets(opts.max_txt_len, opts.max_bb,
                              opts.train_batch_size)
    loaders = {k: TaskLoader(k, v["dataset"], buckets, seed=opts.seed)
               for k, v in train.items()}
    ratios = {k: v["ratio"] for k, v in train.items()}
    accum = max(1, opts.gradient_accumulation_steps)
    # default accumulation path: same-bucket micro-batches stacked on a
    # leading axis, scan-accumulated inside the jitted step (zero host
    # syncs per window); --host_accum falls back to summing grads across
    # separately-dispatched grad programs (allows mixed-bucket windows)
    stack = accum > 1 and not opts.host_accum
    meta = MetaLoader(loaders, ratios, accum_steps=accum, seed=opts.seed,
                      stack_microbatches=stack, sync_buckets=multi)

    # ---- mesh + optimizer + state
    mesh = M.make_mesh(n_model=opts.n_model)

    pre_sharded = not opts.no_prefetch
    lr_fn = O.get_lr_schedule(opts.decay, opts.learning_rate,
                              opts.warmup_steps, opts.num_train_steps)
    tx = O.build_optimizer(params, lr_fn, opts.weight_decay,
                           tuple(opts.betas), grad_norm=opts.grad_norm,
                           optim=opts.optim)
    sharded_params = M.shard_params(mesh, params)
    del params
    valid_ids = label_vocab.valid_ids if label_vocab is not None else None

    with mesh:
        state = jax.jit(lambda p: create_train_state(p, tx))(sharded_params)
        z1_out = {"split": None, "fused": None}
        if opts.zero1:
            # ZeRO-1: Adam moments shard over the data axis — the apply is
            # HBM-bound (measured 13.3 ms for replicated uc2-base state,
            # BASELINE.md), so sharding divides its traffic/memory by the
            # data-axis size; XLA inserts the collectives. z1_out pins the
            # step OUTPUT layout — without it GSPMD propagates the moment
            # sharding onto the params (silent ZeRO-3;
            # step.py:zero1_out_shardings)
            from uc2_tpu.training.step import zero1_out_shardings
            state = state._replace(
                opt_state=M.shard_opt_state(mesh, state.opt_state))
            z1_out = zero1_out_shardings(mesh, state.params,
                                         state.opt_state)
        # hps-equality guard on resume (reference utils/save.py:168-171);
        # num_train_steps is deliberately excluded so runs can be extended
        restorer = TrainingRestorer(
            opts.output_dir,
            {k: vars(opts)[k] for k in ("learning_rate", "seed",
                                        "train_batch_size")},
            save_steps=opts.save_steps, write=is_main)
        if multi:
            # resume must be all-or-none across hosts (params would diverge)
            assert MH.broadcast_object(restorer.restore_pending) \
                == restorer.restore_pending, \
                "restore.pt visible on some hosts only — multi-host resume " \
                "needs output_dir on a shared filesystem"
        if restorer.restore_pending:
            state = restorer.restore(state)
            LOGGER.info("restored training at step %d", int(state.step))
            # deterministic resume — the resumed run is bit-identical to
            # one that never stopped (step-keyed rng in the loop below +
            # exact stream state). Beyond the reference, whose restorer
            # restarts the dataloader stream (utils/save.py:164-213
            # restores model/optimizer only). Preferred path: O(1)
            # restore of the per-host stream state saved alongside the
            # checkpoint (works multi-host too — each host restores its
            # own host-local state and the bucket-sync broadcasts
            # continue identically). Fallback: single-host replay of the
            # task/bucket stream (pre-stream-state checkpoints).
            sd = restorer.restore_stream(int(state.step))
            if multi and not all(MH.all_gather_object(sd is not None)):
                # all-or-none: a preemption mid-save can leave SOME hosts
                # with a paired stream file; mixed restore/restart would
                # feed hosts from inconsistent epoch positions
                sd = None
            if sd is not None:
                meta.load_state_dict(sd)
                LOGGER.info("restored input-stream state (meta step %d)",
                            meta.step)
            elif not multi:
                meta.fast_forward(int(state.step))
            else:
                LOGGER.warning(
                    "no paired stream state for step %d — multi-host "
                    "resume restarts the input stream", int(state.step))

        # background thread assembles the next batches AND places them on
        # device while the current step runs (reference PrefetchLoader's
        # H2D side stream, data/loader.py:85-140): batch assembly, the
        # `_bucket` bookkeeping pops and the shard_batch H2D all leave the
        # hot loop. Safe off-thread: device_put/make_array_from_process_
        # local_data are local buffer placements, not device collectives,
        # and the per-window bucket sync rides the coordination-service KV
        # store — so the prefetch thread cannot desynchronize the main
        # thread's mesh-program order across hosts. Wrapped only AFTER
        # restore/fast_forward so the worker can't consume stream state
        # the fast-forward needs to replay. meta_src stays the raw
        # MetaLoader: checkpoint code reads per-step stream snapshots
        # from it (snapshot_for), which stay correct even though the
        # prefetch worker runs ahead of the optimizer step being saved.
        meta_src = meta
        if pre_sharded:
            from uc2_tpu.data.loader import PrefetchLoader

            def _assemble(item):
                name, batch = item
                batch.pop("_bucket", None)
                batch.pop("sample_size", None)
                return name, M.shard_batch(mesh, batch, stacked=stack)
            meta = PrefetchLoader(meta, depth=2, device_put=_assemble)
        if opts.async_ckpt:
            # orbax sharded/async milestone checkpoints (reference two-tier
            # cadence, utils/save.py:58-213; restorer keeps the rotation)
            from uc2_tpu.training.checkpoint import OrbaxCheckpointer
            ockpt = OrbaxCheckpointer(os.path.join(opts.output_dir,
                                                   "orbax"))

            def save_milestone(st, step):
                ockpt.save(step, st.params)
        else:
            saver = ModelSaver(opts.output_dir)

            def save_milestone(st, step):
                saver.save(jax.tree_util.tree_map(np.asarray, st.params),
                           step)

        steps = {}

        def get_step_fn(task):
            base = task.split("_")[0]
            if base not in steps:
                if opts.split_step:
                    # two smaller programs (see make_split_train_step)
                    from uc2_tpu.training.step import (TrainState,
                                                       make_split_train_step)
                    g, a = make_split_train_step(
                        model, base, tx, valid_ids=valid_ids,
                        itm_ot_lambda=opts.itm_ot_lambda,
                        ot_pos_only=opts.ot_pos_only)
                    gj = jax.jit(g)
                    aj = jax.jit(a, donate_argnums=(0, 1, 2),
                                 out_shardings=z1_out["split"])

                    def split(state, batch, rng, gj=gj, aj=aj):
                        grads, metrics = gj(state.params, batch, rng)
                        params, opt_state = aj(grads, state.opt_state,
                                               state.params)
                        return TrainState(state.step + 1, params,
                                          opt_state), metrics
                    steps[base] = split
                else:
                    steps[base] = jax.jit(make_train_step(
                        model, base, tx, valid_ids=valid_ids,
                        itm_ot_lambda=opts.itm_ot_lambda,
                        ot_pos_only=opts.ot_pos_only),
                        out_shardings=z1_out["fused"])
            return steps[base]

        task2loss = defaultdict(
            lambda: RunningMeter("loss"))
        n_examples = defaultdict(int)
        # per-step keys are a PURE FUNCTION of the step index (fold_in),
        # not a sequentially split chain — so a resumed run replays the
        # exact dropout/mask randomness of an uninterrupted one
        from uc2_tpu.config import base_prng_key
        rng_base = base_prng_key(opts.seed + 1, opts.rng_impl)
        start = time.time()
        global_step = int(state.step)
        LOGGER.info("start training at step %d over %d tasks",
                    global_step, len(loaders))

        # Async-dispatch pipelining: the loop below never blocks on the
        # device inside a window. global_step is a HOST counter (int(state.
        # step) per step would force a device→host sync every window) and
        # per-step losses stay device scalars in `pending`, converted K
        # steps late — so the host keeps ~runahead windows enqueued while
        # the device executes, hiding dispatch latency + input assembly.
        # The late conversion also BOUNDS in-flight batches (each float()
        # blocks until that step's program finished), capping HBM held by
        # queued batches at ~runahead × batch bytes. Reference equivalent:
        # the CUDA stream runahead its PrefetchLoader relies on
        # (data/loader.py:85-140) — here made explicit because a jitted
        # scalar pull is the only sync primitive.
        from collections import deque
        pending = deque()        # (task_name, device loss scalar)

        def drain(k=0):
            while len(pending) > k:
                nm, lv = pending.popleft()
                task2loss[nm](float(lv))

        sus_step = sus_t = sus_ex = None
        sustained = {}
        start_step = global_step

        grad_fns = {}

        def get_grad_apply(task):
            # host-side gradient accumulation (reference
            # gradient_accumulation_steps with delay_unscale,
            # pretrain.py:556-566): grads from `accum` consecutive batches
            # of the same task (MetaLoader guarantees the task) are averaged
            # before one optimizer step. Batches may come from different
            # shape buckets, so grads are summed across separately-compiled
            # grad programs rather than stacked.
            base = task.split("_")[0]
            if base not in grad_fns:
                from uc2_tpu.training.step import make_split_train_step
                g, a = make_split_train_step(
                    model, base, tx, valid_ids=valid_ids,
                    itm_ot_lambda=opts.itm_ot_lambda,
                    ot_pos_only=opts.ot_pos_only)
                grad_fns[base] = (jax.jit(g),
                                  jax.jit(a, donate_argnums=(0, 1, 2),
                                          out_shardings=z1_out["split"]))
            return grad_fns[base]

        while global_step < opts.num_train_steps:
            if accum == 1 or stack:
                name, batch = next(meta)
                if not pre_sharded:       # prefetch thread already did both
                    batch.pop("_bucket", None)
                    batch.pop("sample_size", None)
                    batch = M.shard_batch(mesh, batch, stacked=stack)
                # NOTE: shard_batch returns GLOBAL-shaped arrays, so under
                # multi-host this counts examples across ALL hosts (matching
                # the reference's all-reduced n_examples, pretrain.py:625) —
                # identical in the prefetch and --no_prefetch paths. The
                # logged ex/s is therefore cluster-wide, not per chip.
                bs = batch["input_ids"].shape
                n_examples[name] += (bs[0] * bs[1] if stack else bs[0])
                sub = jax.random.fold_in(rng_base, global_step)
                state, metrics = get_step_fn(name)(state, batch, sub)
            else:
                # host-side accumulation: grads summed on device across
                # separately-compiled grad programs; no per-micro-batch
                # host sync — metrics stay device arrays until the window
                # ends (reference pretrain.py:556-566)
                from uc2_tpu.training.step import TrainState
                grads_sum = None
                metrics_sum = None
                for k_micro in range(accum):
                    name, batch = next(meta)
                    if not pre_sharded:
                        batch.pop("_bucket", None)
                        batch.pop("sample_size", None)
                        batch = M.shard_batch(mesh, batch)
                    n_examples[name] += batch["input_ids"].shape[0]
                    sub = jax.random.fold_in(
                        rng_base, global_step * accum + k_micro)
                    gj, aj = get_grad_apply(name)
                    g, m = gj(state.params, batch, sub)
                    if grads_sum is None:
                        grads_sum, metrics_sum = g, m
                    else:
                        grads_sum = jax.tree_util.tree_map(
                            jax.numpy.add, grads_sum, g)
                        metrics_sum = jax.tree_util.tree_map(
                            jax.numpy.add, metrics_sum, m)
                grads_sum = jax.tree_util.tree_map(
                    lambda x: x / accum, grads_sum)
                params_new, opt_state = aj(grads_sum, state.opt_state,
                                           state.params)
                state = TrainState(state.step + 1, params_new, opt_state)
                metrics = {k: v / accum for k, v in metrics_sum.items()}
            global_step += 1
            pending.append((name, metrics["loss"]))
            drain(opts.runahead)

            if global_step % opts.log_steps == 0:
                drain()          # full sync: timing below is honest
                TB_LOGGER.add_scalar("lr", float(lr_fn(global_step)),
                                     global_step)
                for t, m in task2loss.items():
                    if m.val is not None:
                        TB_LOGGER.add_scalar(f"loss/{t}", m.val, global_step)
                elapsed = time.time() - start
                tot = sum(n_examples.values())
                now = time.time()
                LOGGER.info("step %d | %.0f ex/s | %s", global_step,
                            tot / max(elapsed, 1e-9),
                            {t: round(m.val, 4) for t, m in task2loss.items()
                             if m.val is not None})
                TB_LOGGER.add_scalar("perf/ex_per_s",
                                     tot / max(elapsed, 1e-9), global_step)
                # sustained rate: between full-sync log boundaries after
                # the warmup window (excludes per-program compiles) — the
                # reference's every-100-step throughput log
                # (pretrain.py:617-641) without its cold start
                if sus_step is None:
                    if global_step >= start_step + opts.perf_warmup_steps:
                        sus_step, sus_t, sus_ex = global_step, now, tot
                elif global_step > sus_step:
                    sustained = {
                        "ex_per_s": (tot - sus_ex) / (now - sus_t),
                        "steps_per_s": (global_step - sus_step)
                        / (now - sus_t),
                        "window": (sus_step, global_step)}
                    LOGGER.info(
                        "sustained %.1f ex/s | %.2f steps/s (steps %d-%d)",
                        sustained["ex_per_s"], sustained["steps_per_s"],
                        sus_step, global_step)
                    TB_LOGGER.add_scalar("perf/sustained_ex_per_s",
                                         sustained["ex_per_s"], global_step)

            if opts.valid_steps and global_step % opts.valid_steps == 0:
                validate(model, state, val, buckets, valid_ids, opts, mesh)
                if is_main or opts.async_ckpt:
                    save_milestone(state, global_step)
            # all hosts: the save gathers process-sharded leaves (zero1)
            # collectively; only write=is_main touches disk (the stream
            # state is host-local and written by every host)
            restorer.step(global_step, state,
                          stream=meta_src.snapshot_for(
                              global_step * meta_src.accum_steps))

            if opts.stop_after_steps and global_step >= opts.stop_after_steps:
                # simulated preemption (tests / controlled drains): leave
                # the loop with the schedule still targeting
                # num_train_steps, exactly like a real kill + resume
                LOGGER.info("stop_after_steps=%d reached — stopping early",
                            opts.stop_after_steps)
                break

        drain()
        if pre_sharded:
            # stop the prefetch worker and drop its buffered device batches
            # (the meta iterator is infinite — without this every finished
            # in-process run leaks a thread + depth+1 device-resident
            # batches)
            meta.close()
        if opts.valid_steps and global_step % opts.valid_steps != 0:
            validate(model, state, val, buckets, valid_ids, opts, mesh)
            if is_main or opts.async_ckpt:
                save_milestone(state, global_step)
        if opts.async_ckpt:
            ockpt.wait()          # finalize in-flight async saves
        if sustained:
            LOGGER.info("FINAL sustained %.1f ex/s | %.2f steps/s "
                        "(steps %d-%d)", sustained["ex_per_s"],
                        sustained["steps_per_s"], *sustained["window"])
        LOGGER.info("training done at step %d", global_step)
        return state


def validate(model, state, val, buckets, valid_ids, opts, mesh):
    """Per-task validation over the FULL val DB — one complete epoch per
    task, every example counted once (reference pretrain.py:658-1051
    sweeps each val loader to exhaustion). ``--val_batches`` > 0 caps the
    sweep for smoke runs."""
    import jax
    from uc2_tpu.data.loader import TaskLoader
    from uc2_tpu.parallel import mesh as M
    from uc2_tpu.training.step import make_eval_step

    for key, v in val.items():
        task = v["task"]
        ev = jax.jit(make_eval_step(model, task, valid_ids=valid_ids))
        tl = TaskLoader(key, v["dataset"], buckets, seed=0, shuffle=False,
                        drop_last=False)
        agg = defaultdict(float)
        t0 = time.time()
        for n_b, batch in enumerate(tl.one_epoch()):
            if opts.val_batches and n_b >= opts.val_batches:
                break
            batch.pop("_bucket", None)
            batch.pop("sample_size", None)
            # val data is replicated (host-identical, built without shard=)
            # so ragged trailing batches may replicate safely
            out = ev(state.params,
                     M.shard_batch(mesh, batch, ragged="replicate"))
            for k, x in out.items():
                agg[k] += float(x)
        log = {}
        if "n_word" in agg and agg["n_word"]:
            log["loss"] = agg["loss"] / agg["n_word"]
            log["acc"] = agg.get("n_correct", 0) / agg["n_word"]
        elif "n_feat" in agg and agg["n_feat"]:
            log["loss"] = agg["loss"] / agg["n_feat"]
            if "n_correct" in agg:
                log["acc"] = agg["n_correct"] / agg["n_feat"]
        elif "n_ex" in agg and agg["n_ex"]:
            log["loss"] = agg["loss"] / agg["n_ex"]
            log["acc"] = agg.get("n_correct", 0) / agg["n_ex"]
        # mrm-nce feature-space diagnostics (reference pretrain.py:901-943
        # logs mean L2 distance + cosine similarity pred↔gold feature)
        if agg.get("n_feat") and "l2_sum" in agg:
            log["l2"] = agg["l2_sum"] / agg["n_feat"]
            log["cos"] = agg["cos_sum"] / agg["n_feat"]
        # OT alignment diagnostics (reference pretrain.py:1003-1051 logs
        # mean OT distance over positive / negative ITM pairs)
        if agg.get("n_pos"):
            log["ot_pos"] = agg["ot_pos"] / agg["n_pos"]
        if agg.get("n_neg"):
            log["ot_neg"] = agg["ot_neg"] / agg["n_neg"]
        LOGGER.info("validate %s: %s (%.1fs)", key,
                    {k: round(x, 4) for k, x in log.items()},
                    time.time() - t0)
        TB_LOGGER.log_scalar_dict(log, prefix=f"valid_{key}")


def resolve_checkpoint_path(path: str) -> str:
    """Resolve a checkpoint argument to a concrete file.

    Accepts a file path as-is. A *directory* (an output_dir or its ckpt/
    subdir) resolves to the newest ``model_step_{N}.msgpack`` milestone
    inside it; an empty/absent milestone set is a hard error with a
    useful message — round 4's chip batch silently collapsed an empty
    glob to the bare directory and all three finetune demo drives died
    on IsADirectoryError before one train step.
    """
    if not os.path.isdir(path):
        return path
    ckpt_dir = path
    sub = os.path.join(path, "ckpt")
    if os.path.isdir(sub):
        ckpt_dir = sub
    steps = []
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"model_step_(\d+)\.msgpack", name)
        if m:
            steps.append((int(m.group(1)), name))
    if not steps:
        raise FileNotFoundError(
            f"--checkpoint {path!r} is a directory with no "
            f"model_step_*.msgpack milestones in {ckpt_dir!r} "
            f"(contents: {sorted(os.listdir(ckpt_dir))[:8]}); pass a "
            f"checkpoint file or a directory that has completed a save")
    steps.sort()
    resolved = os.path.join(ckpt_dir, steps[-1][1])
    LOGGER.info("checkpoint dir %s -> newest milestone %s", path, resolved)
    return resolved


def load_raw_checkpoint(path: str):
    """torch .pt state dict or our msgpack tree → flat dict of numpy."""
    path = resolve_checkpoint_path(path)
    if path.endswith((".pt", ".bin", ".pth")):
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        return sd
    from flax import serialization
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_any_checkpoint(path: str, opts):
    from uc2_tpu.models import convert
    sd = load_raw_checkpoint(path)
    # our own trees are already nested param dicts
    if isinstance(sd, dict) and "roberta" in sd and isinstance(
            sd.get("roberta"), dict):
        return sd
    return convert.torch_to_params(
        sd, load_embedding_only=opts.load_embedding_only,
        load_layer=opts.load_layer)


def build_parser():
    p = argparse.ArgumentParser(description="UC2-TPU pretraining")
    p.add_argument("--config", help="JSON config (CLI flags win)")
    p.add_argument("--model_config", type=str,
                   default="config/uc2-base.json")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--early_adaptation_checkpoint", type=str, default=None)
    p.add_argument("--load_embedding_only", action="store_true")
    p.add_argument("--load_layer", type=int, default=None)
    p.add_argument("--output_dir", type=str, required=False,
                   default="output/pretrain")
    p.add_argument("--train_datasets", type=json.loads, default=None)
    p.add_argument("--val_datasets", type=json.loads, default=None)
    # data knobs (reference defaults, pretrain.py:1054-1158)
    p.add_argument("--max_txt_len", type=int, default=60)
    p.add_argument("--conf_th", type=float, default=0.2)
    p.add_argument("--max_bb", type=int, default=100)
    p.add_argument("--min_bb", type=int, default=10)
    p.add_argument("--num_bb", type=int, default=36)
    p.add_argument("--mlm_prob", type=float, default=0.15)
    p.add_argument("--mrm_prob", type=float, default=0.15)
    p.add_argument("--itm_neg_prob", type=float, default=0.5)
    p.add_argument("--nce_neg_size", type=int, default=128)
    p.add_argument("--nce_temp", type=float, default=1.0,
                   help="mrm-nce softmax temperature "
                        "(reference pretrain.py:1076)")
    p.add_argument("--label_classes", type=int, default=1601,
                   help="detector label vocabulary size (tests may reduce)")
    p.add_argument("--itm_ot_lambda", type=float, default=0.0)
    p.add_argument("--ot_pos_only", action="store_true")
    p.add_argument("--comasking_mode", type=str, default="random",
                   choices=["random", "full", "mix"],
                   help="tlm co-masking mode (reference --co_masking_mode; "
                        "published config uses 'mix', uc2_pretrain.json:40)")
    p.add_argument("--co_masking", dest="co_masking", action="store_true",
                   default=True,
                   help="co-mask aligned words for tlm (reference "
                        "--co_masking; its published config sets true)")
    p.add_argument("--no_co_masking", dest="co_masking",
                   action="store_false",
                   help="tlm/tlm-ni fall back to plain MLM masking "
                        "(reference build_tlm_dataset else-branch)")
    p.add_argument("--itm_hard_neg", action="store_true",
                   help="cross-lingual hard-negative ITM sampling "
                        "(reference pretrain.py:261-272)")
    p.add_argument("--multilingual_vmlm", dest="multilingual_vmlm",
                   action="store_true", default=True,
                   help="vmlm targets use the dataset language's label "
                        "list (reference pretrain.py:301-311; published "
                        "config sets true)")
    p.add_argument("--no_multilingual_vmlm", dest="multilingual_vmlm",
                   action="store_false",
                   help="vmlm targets always use the EN label list")
    # training
    p.add_argument("--train_batch_size", type=int, default=10240,
                   help="token budget per bucket batch")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=4e-5)
    p.add_argument("--betas", type=float, nargs=2, default=[0.9, 0.98])
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--optim", type=str, default="adamw",
                   choices=["adam", "adamax", "adamw"],
                   help="reference optim/misc.py:21-29")
    p.add_argument("--dropout", type=float, default=None,
                   help="override every dropout prob (reference "
                        "set_dropout, utils/misc.py:54-60)")
    p.add_argument("--grad_norm", type=float, default=5.0)
    p.add_argument("--decay", type=str, default="linear")
    p.add_argument("--warmup_steps", type=int, default=10000)
    p.add_argument("--num_train_steps", type=int, default=200000)
    p.add_argument("--valid_steps", type=int, default=5000)
    p.add_argument("--val_batches", type=int, default=0,
                   help="cap validation to N batches per task "
                        "(0 = sweep the full val DB, the reference behavior)")
    p.add_argument("--host_accum", action="store_true",
                   help="accumulate gradients on the host across separate "
                        "grad dispatches instead of the in-step lax.scan "
                        "(allows mixed-bucket windows)")
    p.add_argument("--no_prefetch", action="store_true",
                   help="disable the input-prefetch thread (A/B baseline; "
                        "prefetch is on by default, single- and multi-host)")
    p.add_argument("--save_steps", type=int, default=200)
    p.add_argument("--log_steps", type=int, default=100)
    p.add_argument("--stop_after_steps", type=int, default=0,
                   help="stop the loop after this many steps WITHOUT "
                        "changing the lr schedule's num_train_steps — "
                        "simulates preemption for resume tests / "
                        "controlled drains (0 = run to num_train_steps)")
    p.add_argument("--runahead", type=int, default=8,
                   help="max windows the host may enqueue ahead of the "
                        "device (bounds in-flight batch HBM; per-step "
                        "losses convert to host this many steps late)")
    p.add_argument("--perf_warmup_steps", type=int, default=10,
                   help="steps excluded from the sustained-throughput "
                        "window (program compiles land here)")
    p.add_argument("--seed", type=int, default=42)
    # TPU
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--rng_impl", choices=["threefry2x32", "rbg"],
                   default="rbg",
                   help="dropout PRNG: rbg = TPU hardware RngBitGenerator "
                        "(cheaper mask generation, different streams; "
                        "exact resume stays deterministic either way)")
    p.add_argument("--n_model", type=int, default=1,
                   help="tensor-parallel width of the mesh")
    p.add_argument("--zero1", action="store_true",
                   help="shard optimizer state over the data axis "
                        "(ZeRO-1); identical math, 1/N apply traffic")
    p.add_argument("--lm_ce_chunks", type=int, default=0,
                   help="stream the 250k-vocab MLM CE in N chunks "
                        "(identical math, O(1/N) logits memory)")
    p.add_argument("--async_ckpt", action="store_true",
                   help="milestone checkpoints via orbax (sharded, "
                        "multi-host collective save) instead of the "
                        "single-host msgpack ModelSaver")
    p.add_argument("--split_step", action="store_true",
                   help="jit grad and optimizer-apply as separate programs "
                        "(smaller compiles, donated buffers)")
    # multi-host (reference: horovodrun -np N, README.md:32-42)
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 — enables "
                        "jax.distributed.initialize (or set "
                        "JAX_COORDINATOR_ADDRESS et al.)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p


def apply_reference_config_compat(opts, argv=None):
    """Accept the reference's own pretrain config keys where ours are
    renamed (reference config/uc2_pretrain.json — note that file ships
    with a trailing comma and is not even valid JSON; fix the comma and
    it loads here). The dataset-spec shape
    (train_datasets[].{name,db,img,tasks,mix_ratio,img_token_soft_label})
    is identical and needs no mapping. CLI wins over a mapped key."""
    import sys
    src = argv if argv is not None else sys.argv[1:]
    overridden = {a[2:].split("=")[0] for a in src if a.startswith("--")}
    for ref_key, our_key in (("co_masking_mode", "comasking_mode"),
                             ("neg_size", "nce_neg_size")):
        v = getattr(opts, ref_key, None)
        if v is not None and our_key not in overridden:
            setattr(opts, our_key, v)
    return opts


if __name__ == "__main__":
    opts = parse_with_config(build_parser())
    apply_reference_config_compat(opts)
    main(opts)
