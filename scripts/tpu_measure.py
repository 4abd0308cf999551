#!/usr/bin/env python
"""Parameterized TPU measurement tool (consolidates the round-1 one-off
tpu_measure*.py scripts; numbers recorded in BASELINE.md).

Subcommands:
  score   chained ITM scoring throughput at a given (B, Lt, Nb)
  ab      in-process A/B of scoring with xla vs pallas attention
  train   split-program train-step throughput for any pretrain task
  eval    score_matrix throughput over a synthetic gallery

Measurement method (see bench.py docstring): through this image's axon
tunnel `block_until_ready()` does not block, so every measurement chains
its iterations inside ONE jitted lax.scan (inputs perturbed per iteration
to prevent hoisting) and syncs via a device→host scalar. Run detached;
killing a client mid-RPC wedges the tile lease ~30min.
"""

import argparse
import dataclasses
import math
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = None


def log(*a):
    print(*a, flush=True)
    if LOG:
        print(*a, file=LOG, flush=True)


# single source of truth for the FLOPs model + roofline constants
# (shared with bench.py's MFU fields — they must not drift)
from uc2_tpu.utils.flops import (CHIP_CALIB_TFLOPS, CHIP_PEAK_TFLOPS,  # noqa: E402
                                 grad_flops_per_example)


def _implied_tfs(rate_steps_s, B, Lt, Nb, M):
    tf = rate_steps_s * B * grad_flops_per_example(Lt, Nb, M) / 1e12
    return (f"[implied {tf:.0f} TF/s = {100 * tf / CHIP_CALIB_TFLOPS:.0f}% "
            f"of {CHIP_CALIB_TFLOPS:.0f} TF/s calib"
            + (" ROOFLINE-VIOLATION" if tf > CHIP_PEAK_TFLOPS else
               " ABOVE-CALIBRATION" if tf > CHIP_CALIB_TFLOPS else "")
            + "]")


def _rate(x):
    """Validate a measured rate before it reaches a RESULT line. Round 4's
    job4 wrote three ``trial0:  steps/s`` rows with BLANK values into
    bench_results.txt (an empty arm set measured nothing and the printer
    interpolated anyway) — a poisoned measurement must raise, not record
    (VERDICT r4 weak #4)."""
    x = float(x)
    if not np.isfinite(x) or x <= 0.0:
        raise AssertionError(
            f"refusing to write a RESULT line with non-finite/non-positive "
            f"rate {x!r} — measurement is poisoned")
    return x


def _mk_key(i, impl="threefry2x32"):
    """Per-trial PRNG key under the selected impl (``rbg`` = the TPU's
    hardware RngBitGenerator — dropout masks near-free vs software
    threefry; raced as a train_ab arm)."""
    import jax
    if impl == "threefry2x32":
        return jax.random.PRNGKey(i)
    return jax.random.key(i, impl=impl)


def _scoring_batch(rng, B, Lt, Nb, vocab=250002, img_dim=2048):
    import jax.numpy as jnp
    ids = rng.integers(4, vocab, (B, Lt)).astype(np.int32)
    ids[:, 0] = 0
    return {
        "input_ids": jnp.asarray(ids),
        "img_feat": jnp.asarray(
            rng.standard_normal((B, Nb, img_dim)).astype(np.float32)),
        "img_pos_feat": jnp.asarray(rng.random((B, Nb, 7)).astype(np.float32)),
        "attn_mask": jnp.ones((B, Lt + Nb), jnp.int32),
    }


def _score_chain(model, params, batch, n_iters):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(params, batch):
        def body(c, _):
            b = dict(batch)
            b["img_feat"] = batch["img_feat"] + c * 1e-30
            s = model.scores(params, b, deterministic=True)
            return jnp.mean(s), None
        last, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_iters)
        return last

    float(chain(params, batch))          # compile + warm
    return chain


def cmd_score(args):
    import jax
    from uc2_tpu.config import UC2Config
    from uc2_tpu.models.finetune import UC2ForImageTextRetrieval
    cfg = UC2Config(dtype=args.dtype,
                    use_pallas_attention=args.attention == "pallas",
                    quant=args.quant)
    model = UC2ForImageTextRetrieval(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = _scoring_batch(rng, args.batch, args.txt_len, args.num_bb)
    chain = _score_chain(model, params, batch, args.iters)
    for trial in range(args.trials):
        t0 = time.perf_counter()
        float(chain(params, batch))
        dt = time.perf_counter() - t0
        log(f"RESULT score B={args.batch} Lt={args.txt_len} Nb={args.num_bb} "
            f"attn={args.attention} quant={args.quant} trial{trial}: "
            f"{_rate(args.batch * args.iters / dt):.0f} pairs/s")


def cmd_ab(args):
    import jax
    from uc2_tpu.config import UC2Config
    from uc2_tpu.models.finetune import UC2ForImageTextRetrieval
    rng = np.random.default_rng(0)
    batch = _scoring_batch(rng, args.batch, args.txt_len, args.num_bb)
    chains = {}
    params = None
    for impl in ("xla", "pallas"):
        cfg = UC2Config(dtype=args.dtype,
                        use_pallas_attention=impl == "pallas")
        model = UC2ForImageTextRetrieval(cfg)
        if params is None:
            params = model.init_params(jax.random.PRNGKey(0))
        chains[impl] = _score_chain(model, params, batch, args.iters)
    for trial in range(args.trials):
        row = []
        for impl, chain in chains.items():
            t0 = time.perf_counter()
            float(chain(params, batch))
            dt = time.perf_counter() - t0
            row.append(f"{impl}={_rate(args.batch * args.iters / dt):.0f}")
        log(f"RESULT A/B Lt={args.txt_len} Nb={args.num_bb} trial{trial}: "
            + " ".join(row) + " pairs/s")


def cmd_score_snap(args):
    """Race the batch-block snap modes (tiles.snap_bb: gcd vs div) on the
    production scoring path, one process, chained scans. The gcd default
    degenerates to BB=1 at every eval bucket (heuristic bb=3/5/9 coprime
    with B=64), serializing the fused-block grid; div picks the largest
    legal block under the same VMEM budget. Only buckets with L>=128
    (Nb=66/100) engage the fused blocks."""
    import jax
    from uc2_tpu.config import UC2Config
    from uc2_tpu.models.finetune import UC2ForImageTextRetrieval
    rng = np.random.default_rng(0)
    batch = _scoring_batch(rng, args.batch, args.txt_len, args.num_bb)
    chains = {}
    params = None
    for mode in ("gcd", "div"):
        # trace-time env (tiles.snap_bb reads it inside the traced build)
        os.environ["UC2_BB_SNAP"] = mode if mode == "div" else ""
        cfg = UC2Config(dtype=args.dtype, use_pallas_attention=True)
        model = UC2ForImageTextRetrieval(cfg)
        if params is None:
            params = model.init_params(jax.random.PRNGKey(0))
        t0 = time.time()
        chains[mode] = _score_chain(model, params, batch, args.iters)
        log(f"compile score_snap {mode}: {time.time() - t0:.1f}s")
    os.environ.pop("UC2_BB_SNAP", None)
    for trial in range(args.trials):
        row = []
        for mode, chain in chains.items():
            t0 = time.perf_counter()
            float(chain(params, batch))
            dt = time.perf_counter() - t0
            row.append(f"{mode}={_rate(args.batch * args.iters / dt):.0f}")
        log(f"RESULT score_snap B={args.batch} Lt={args.txt_len} "
            f"Nb={args.num_bb} trial{trial}: " + " ".join(row) + " pairs/s")


def cmd_train(args):
    import jax
    import jax.numpy as jnp
    from uc2_tpu.config import UC2Config
    from uc2_tpu.models.pretraining import UC2ForPretraining
    from uc2_tpu.training import optim as O
    from uc2_tpu.training.step import make_split_train_step
    rng = np.random.default_rng(0)
    attn = {"xla": False, "pallas": True}.get(args.attention,
                                              args.attention)
    cfg = UC2Config(dtype=args.dtype, remat=args.remat,
                    use_pallas_attention=attn)
    model = UC2ForPretraining(cfg, lm_ce_chunks=args.ce_chunks)
    params = model.init_params(jax.random.PRNGKey(0))
    tx = O.build_optimizer(params, O.constant(4e-5), grad_norm=5.0)
    g, a = make_split_train_step(model, args.task, tx)
    gj = jax.jit(g)
    aj = jax.jit(a, donate_argnums=(0, 1, 2))
    opt_state = jax.jit(tx.init)(params)
    B, Lt, Nb, M = args.batch, args.txt_len, args.num_bb, args.masked
    batch = _scoring_batch(rng, B, Lt, Nb, cfg.vocab_size)
    if M:
        batch["masked_pos"] = jnp.asarray(
            rng.integers(1, Lt, (B, M)).astype(np.int32))
        batch["masked_weight"] = jnp.ones((B, M), np.float32)
        batch["txt_labels"] = jnp.asarray(
            rng.integers(4, cfg.vocab_size, (B, M)).astype(np.int32))
    if args.task.startswith("itm"):
        batch["targets"] = jnp.asarray(
            rng.integers(0, 2, (B,)).astype(np.int32))
    if args.accum > 1:
        # leading micro-batch axis → in-grad lax.scan accumulation
        batch = {k: jnp.broadcast_to(v[None], (args.accum,) + v.shape)
                 for k, v in batch.items()}
    t0 = time.time()
    grads, m = gj(params, batch, _mk_key(0, args.rng_impl))
    float(m["loss"])
    params, opt_state = aj(grads, opt_state, params)
    log(f"compile {args.task} B={B}: {time.time() - t0:.1f}s")
    n = args.iters
    p, s = params, opt_state
    t0 = time.perf_counter()
    for i in range(n):
        grads, m = gj(p, batch, _mk_key(i, args.rng_impl))
        p, s = aj(grads, s, p)
    float(m["loss"])
    dt = time.perf_counter() - t0
    log(f"RESULT train {args.task} B={B} M={M} accum={args.accum}: "
        f"{_rate(n / dt):.2f} steps/s, "
        f"{_rate(B * args.accum * n / dt):.0f} ex/s "
        + _implied_tfs(n / dt, B * args.accum, Lt, Nb, M or 24))


def cmd_train_ab(args):
    """XLA vs pallas-train attention, grad program only, in ONE process
    with chained-scan timing — the only reliable methodology through this
    tunnel (per-dispatch timing doesn't sync: the round-3 artifact was
    xla=4.98 vs a chained 7.78, pure queue-bleed). The AdamW apply program
    is identical in both arms and excluded.

    DCE-proofing (round-4 fix, VERDICT r3 weak #1): EVERY gradient leaf is
    kept live by folding a sum over all leaves into the scan carry. The
    round-3 version kept only tree_leaves(grads)[0] (+ loss); the first
    leaf in tree order is a cls-head leaf whose gradient needs no encoder
    weight-gradient matmuls, so XLA could legally drop most of the
    backward-weight pass — the measured 26.5 grad-steps/s implied ~192
    TF/s, above the chip's own 125 TF/s calibration. Implied TF/s is now
    printed next to each rate so this class of bug self-flags.

    The ``+rbg`` arm swaps the dropout PRNG for the TPU's hardware
    RngBitGenerator (same model/attention as pallas-train; only mask-bit
    generation changes) — if the grad_profile full-nodrop delta is
    threefry-dominated, this arm collects it without giving up dropout."""
    import jax
    import jax.numpy as jnp
    from uc2_tpu.config import UC2Config
    from uc2_tpu.models.pretraining import UC2ForPretraining
    from uc2_tpu.training.step import make_loss_fn
    rng = np.random.default_rng(0)
    B, Lt, Nb, M = args.batch, args.txt_len, args.num_bb, args.masked
    batch = _scoring_batch(rng, B, Lt, Nb, 250002)
    batch["masked_pos"] = jnp.asarray(
        rng.integers(1, Lt, (B, M)).astype(np.int32))
    batch["masked_weight"] = jnp.ones((B, M), np.float32)
    batch["txt_labels"] = jnp.asarray(
        rng.integers(4, 250002, (B, M)).astype(np.int32))
    if args.arms and args.attn_bb_list:
        # the first on-chip sweep passed both, silently measured an empty
        # arm set, and wrote blank RESULT rows (ADVICE r4) — hard error
        raise SystemExit("--arms and --attn_bb_list are mutually "
                         "exclusive: a BB sweep names its own arms")
    if args.attn_bb_list:
        # attention-train batch-block tile sweep: one pallas-train arm per
        # BB (UC2_ATTN_TRAIN_BB is read at trace time, flash_attention.py
        # _train_bb; 0 = the default VMEM-budget heuristic)
        all_arms = tuple((f"pallas-train@bb{bb}", 0)
                         for bb in args.attn_bb_list.split(","))
    else:
        all_arms = (("xla", 0), ("pallas-train", 0),
                    ("pallas-train+ce8", 8), ("pallas-train+ffnt", 0),
                    ("pallas-train+rbg", 0), ("pallas-train+native", 0),
                    # remat arms (round 5): the fused-vs-split race showed
                    # HBM pressure costs real schedule quality at B=128 —
                    # maybe shrinking the activation live set beats the
                    # recompute tax. Run under rbg (production default).
                    ("pallas-train+rbg+rematdots", 0),
                    ("pallas-train+rbg+rematfull", 0),
                    # raised-scoped-VMEM arms (round 5m): Mosaic's 16 MiB
                    # limit is compiler accounting, not hardware — a
                    # per-kernel CompilerParams(vmem_limit_bytes) raise
                    # unlocks the BB=2/BB=4 batch blocks and the native
                    # layout that OOM'd in round 4 (tiles.train_vmem_limit)
                    ("pallas-train+rbg+vmem32@bb2", 0),
                    ("pallas-train+rbg+vmem64@bb4", 0),
                    ("pallas-train+rbg+vmem100@bb8", 0),
                    ("pallas-train+rbg+native+vmem32", 0),
                    ("pallas-train+rbg+native+vmem64", 0))
    want = set(args.arms.split(",")) if args.arms else None
    selected = [a for a in all_arms if want is None or a[0] in want]
    if not selected:
        raise SystemExit(f"--arms {args.arms!r} selected no arms out of "
                         f"{[a[0] for a in all_arms]}")
    # pre-gate arms against the modeled bwd scoped-VMEM footprint so an
    # infeasible tile/layout is skipped HERE, loudly, instead of OOM'ing
    # the Mosaic compile 50 minutes into a chip job (round 4 lost the
    # native + BB=2 races that way; tiles.py model, test-pinned)
    from uc2_tpu.ops.tiles import max_train_bb, max_train_hb

    def _arm_vmem(impl):
        # "+vmemNN" token: raised Mosaic scoped-VMEM limit (MiB) for the
        # train kernels; must be in env BEFORE the tiles gate functions
        # run (they read it at call time, the kernels at trace time)
        m = re.search(r"\+vmem(\d+)", impl)
        return m.group(1) if m else ""

    n_heads, d_head, Lj = 12, 64, Lt + Nb
    gated = []
    for impl, ce in selected:
        native = "+native" in impl
        vm = _arm_vmem(impl)
        if vm:
            os.environ["UC2_ATTN_TRAIN_VMEM_MB"] = vm
        else:
            os.environ.pop("UC2_ATTN_TRAIN_VMEM_MB", None)
        # the kernel's layout resolver head-splits the grid when the
        # full-head cell would OOM (flash_attention._train_layout), so an
        # arm is infeasible only when even (BB=1, HB=1) does not fit;
        # a UC2_ATTN_TRAIN_HB sweep env must be gated the way the
        # resolver will actually apply it (gcd-snap, then budget clamp)
        hb = max_train_hb(1, n_heads, Lj, d_head, native=native, rate=0.1)
        env_hb = int(os.environ.get("UC2_ATTN_TRAIN_HB", "0"))
        if env_hb > 0:
            hb = min(math.gcd(env_hb, n_heads), hb)
        cap = max_train_bb(B, n_heads, Lj, d_head, native=native, rate=0.1,
                           hb=hb)
        req = int(impl.split("@bb")[1]) if "@bb" in impl else 0
        if native and hb == 0:
            log(f"SKIP arm {impl}: native-layout bwd does not fit scoped "
                f"VMEM even at BB=1, HB=1 for B={B} L={Lj} (modeled; the "
                f"kernel would fall back to the standard layout, "
                f"duplicating the plain pallas-train arm)")
            continue
        if req > cap:
            log(f"SKIP arm {impl}: requested BB={req} exceeds the modeled "
                f"scoped-VMEM cap BB<={cap} at B={B} L={Lj} HB={hb}")
            continue
        gated.append((impl, ce))
    if not gated:
        raise SystemExit("all selected arms were VMEM-gated out at "
                         f"B={B} L={Lj}")
    params = None
    results = {}
    for impl, ce in gated:
        # trace-time env gates (encoder.py / flash_attention.py)
        os.environ["UC2_FFN_TRAIN"] = "1" if "+ffnt" in impl else "0"
        os.environ["UC2_ATTN_TRAIN_BB"] = (impl.split("@bb")[1]
                                           if "@bb" in impl else "0")
        vm = _arm_vmem(impl)
        if vm:
            os.environ["UC2_ATTN_TRAIN_VMEM_MB"] = vm
        else:
            os.environ.pop("UC2_ATTN_TRAIN_VMEM_MB", None)
        # +native: q/k/v head-axis move happens in VMEM inside the train
        # kernel instead of host-side HBM transposes around the custom
        # call (bitwise-identical program, test_flash_train pin)
        os.environ["UC2_ATTN_TRAIN_LAYOUT"] = ("native"
                                               if "+native" in impl
                                               else "")
        remat = (impl.split("+remat")[1] if "+remat" in impl else "none")
        cfg = UC2Config(dtype=args.dtype, remat=remat,
                        use_pallas_attention=(False if impl == "xla"
                                              else "pallas-train"),
                        num_hidden_layers=args.layers)
        model = UC2ForPretraining(cfg, lm_ce_chunks=ce)
        if params is None:
            # ONE resident params copy shared by every arm (identical
            # trees — the impl gates are trace-time only). Per-arm copies
            # at ~1.1 GB fp32 each OOM'd the 6-arm B=128 run on chip
            # (RESOURCE_EXHAUSTED at the 5th compile, 2026-08-19).
            params = model.init_params(jax.random.PRNGKey(0))
        loss_fn = make_loss_fn(model, args.task)

        @jax.jit
        def chain(params, batch, key):
            def body(c, _):
                b = dict(batch)
                b["img_feat"] = batch["img_feat"] + c * 1e-30
                (loss, _), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, b, key)
                # keep EVERY leaf live (per-leaf grad chains are
                # independent; summing one leaf lets XLA dead-code the
                # encoder backward-weight pass — r3 post-mortem above)
                tot = sum(jnp.sum(l.astype(jnp.float32))
                          for l in jax.tree_util.tree_leaves(grads))
                return loss + tot * 1e-30 + c * 0.0, None
            last, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                   length=args.iters)
            return last

        kimpl = "rbg" if "+rbg" in impl else "threefry2x32"
        # compile + measure THIS arm before touching the next: round 4
        # compiled all six arms up front, so the native arm's compile
        # failure nullified five already-compiled arms' measurements
        try:
            t0 = time.time()
            float(chain(params, batch, _mk_key(0, kimpl)))
            log(f"compile train_ab {impl}: {time.time() - t0:.1f}s")
            for trial in range(args.trials):
                t0 = time.perf_counter()
                float(chain(params, batch, _mk_key(trial, kimpl)))
                dt = time.perf_counter() - t0
                rate = _rate(args.iters / dt)
                results.setdefault(impl, []).append(rate)
                hb_note = (f"@hb{os.environ['UC2_ATTN_TRAIN_HB']}"
                           if os.environ.get("UC2_ATTN_TRAIN_HB")
                           else "")
                log(f"RESULT train_ab(grad-only,all-leaves-live) "
                    f"{args.task} B={B} M={M} arm={impl}{hb_note} "
                    f"trial{trial}: {rate:.2f} steps/s "
                    + _implied_tfs(rate, B, Lt, Nb, M))
        except Exception as e:  # noqa: BLE001 — record, keep other arms
            log(f"ARM-FAILED train_ab {impl}: {type(e).__name__}: "
                f"{str(e)[:300]}")
    for k in ("UC2_FFN_TRAIN", "UC2_ATTN_TRAIN_BB",
              "UC2_ATTN_TRAIN_LAYOUT", "UC2_ATTN_TRAIN_VMEM_MB"):
        os.environ.pop(k, None)
    if results:
        best = {impl: max(v) for impl, v in results.items()}
        log(f"SUMMARY train_ab {args.task} B={B} M={M} best-of-trials: "
            + " ".join(f"{impl}={r:.2f}" for impl, r in best.items())
            + " steps/s")


def cmd_grad_profile(args):
    """Ablation profile of the grad step — locates the gap between the
    measured grad rate (67-69% of the 125 TF/s calibration at bucket-native
    batches, BASELINE.md r4 table) and the chip's per-shape matmul ceiling
    (176 TF/s, kernel_lab ce). No xprof through this tunnel, so the
    breakdown is by ablation: each arm removes ONE cost and the deltas
    attribute step time. Same methodology as train_ab (one process,
    chained scan, every grad leaf folded into the carry, implied TF/s
    printed next to the full arm).

    Arms (all pallas-train attention unless noted):
      full        value_and_grad of the real mlm loss (== train_ab arm)
      fwd         forward+loss only -> bwd cost = full - fwd
      nodrop      dropout-0 config, rng key still passed (rate>0 is a
                  trace-time branch, so the train kernels skip mask
                  generation entirely while the grad path stays on the
                  SAME differentiable train kernels — guaranteed by the
                  dispatcher since the r4 ADVICE fix: pallas-train with
                  an rng routes to flash_attention_train even at rate 0,
                  where it previously fell to the inference kernel whose
                  vjp is the XLA reference backward, conflating dropout
                  cost with a ~31% backward-kernel swap. Passing
                  deterministic instead would route onto the inference
                  fused blocks, which have no custom_vjp and cannot be
                  grad'd; that exact mistake crashed the first on-chip
                  run 2026-08-19. Note a CPU test with --attention xla
                  cannot catch either regression — only the TPU dispatch
                  path takes these branches)
      nohead      grad of a surrogate loss on the gathered slots
                  (encoder fwd+bwd + embedding scatter, NO 250k LM head)
      frozenemb   word-embedding table non-diff (kills the input-side
                  scatter-add AND the tied-decoder dW matmul)
      encoder     nohead + frozenemb (pure encoder fwd+bwd)
    """
    if args.per_arm_proc:
        return _grad_profile_per_arm_proc(args)
    import jax
    import jax.numpy as jnp
    from uc2_tpu.config import UC2Config
    from uc2_tpu.models.pretraining import UC2ForPretraining, gather_slots
    from uc2_tpu.training.step import make_loss_fn
    rng = np.random.default_rng(0)
    B, Lt, Nb, M = args.batch, args.txt_len, args.num_bb, args.masked
    batch = _scoring_batch(rng, B, Lt, Nb, 250002)
    batch["masked_pos"] = jnp.asarray(
        rng.integers(1, Lt, (B, M)).astype(np.int32))
    batch["masked_weight"] = jnp.ones((B, M), np.float32)
    batch["txt_labels"] = jnp.asarray(
        rng.integers(4, 250002, (B, M)).astype(np.int32))

    attn = {"xla": False}.get(args.attention, args.attention)
    cfg = UC2Config(dtype=args.dtype, use_pallas_attention=attn,
                    num_hidden_layers=args.layers)
    model = UC2ForPretraining(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    loss_fn = make_loss_fn(model, args.task)
    # nodrop arm: dropout-0 twin (same param tree — dropout owns no
    # params), NOT deterministic=True (see docstring)
    cfg0 = dataclasses.replace(cfg, hidden_dropout_prob=0.0,
                               attention_probs_dropout_prob=0.0)
    loss_fn_nodrop = make_loss_fn(UC2ForPretraining(cfg0), args.task)

    def loss_nohead(params, batch, key):
        rngs = {"dropout": key} if key is not None else None
        seq, _ = model._encode(params, batch, key is None, rngs)
        h = gather_slots(seq, batch["masked_pos"])
        loss = jnp.sum(h.astype(jnp.float32)
                       * batch["masked_weight"][:, :, None]) * 1e-3
        return loss, {"loss": loss}

    # shallow-copy split/join of the word-embedding leaf so `frozenemb`
    # arms differentiate w.r.t. everything else only
    def _split_emb(p):
        p = dict(p); rb = dict(p["roberta"]); em = dict(rb["embeddings"])
        emb = em.pop("word_embeddings")
        rb["embeddings"] = em; p["roberta"] = rb
        return p, emb

    def _join_emb(p_wo, emb):
        p = dict(p_wo); rb = dict(p["roberta"]); em = dict(rb["embeddings"])
        em["word_embeddings"] = emb
        rb["embeddings"] = em; p["roberta"] = rb
        return p

    p_wo_emb, emb_leaf = _split_emb(params)

    def make_chain(fn, grad: bool, frozen_emb: bool, det: bool):
        # fn(params, batch, key) -> (loss, aux). The frozen word-embedding
        # table rides as a RUNTIME ARGUMENT (differentiation stops at
        # argnums=0), never a closure: jit bakes closed-over device arrays
        # into the HLO as literal constants, and a 250k×768 fp32 table is
        # ~768 MB of constant — past the axon tunnel's remote_compile
        # request-body cap (the r5 frozenemb/encoder HTTP 413 failures,
        # output/gp_r5.log).
        if frozen_emb:
            base = fn
            fn2 = lambda p, emb, b, k: base(_join_emb(p, emb), b, k)
            p0 = p_wo_emb
        else:
            base = fn
            fn2 = lambda p, emb, b, k: base(p, b, k)
            p0 = params

        @jax.jit
        def chain(p, emb, batch, key):
            def body(c, _):
                b = dict(batch)
                b["img_feat"] = batch["img_feat"] + c * 1e-30
                kk = None if det else key
                if grad:
                    (loss, _), grads = jax.value_and_grad(
                        fn2, has_aux=True)(p, emb, b, kk)
                    tot = sum(jnp.sum(l.astype(jnp.float32))
                              for l in jax.tree_util.tree_leaves(grads))
                    return loss + tot * 1e-30 + c * 0.0, None
                loss, _ = fn2(p, emb, b, kk)
                return loss + c * 0.0, None
            last, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                   length=args.iters)
            return last
        return chain, p0

    all_arms = {
        "full": (loss_fn, True, False, False),
        "fwd": (loss_fn, False, False, False),
        "nodrop": (loss_fn_nodrop, True, False, False),
        "nohead": (loss_nohead, True, False, False),
        "frozenemb": (loss_fn, True, True, False),
        "encoder": (loss_nohead, True, True, False),
    }
    want = set(args.arms.split(",")) if args.arms else None
    ms = {}
    for name, spec in all_arms.items():
        if want is not None and name not in want:
            continue
        # compile + measure per arm, isolated: the first on-chip run
        # compiled all six arms (618.8s for `full` alone) and one tunnel
        # EOF after the compiles erased everything (VERDICT r4 weak #2)
        try:
            chain, p0 = make_chain(*spec)
            t0 = time.time()
            last = float(chain(p0, emb_leaf, batch,
                                   _mk_key(0, args.rng_impl)))
            log(f"compile grad_profile {name}: {time.time() - t0:.1f}s")
            # loss sanity: full/nodrop/frozenemb share the real loss fn
            # (frozenemb must match full bit-for-bit — split/join pin)
            log(f"  loss {name}: {last:.6f}")
            for trial in range(args.trials):
                t0 = time.perf_counter()
                float(chain(p0, emb_leaf, batch,
                            _mk_key(trial, args.rng_impl)))
                dt = time.perf_counter() - t0
                arm_ms = 1e3 * dt / args.iters
                ms.setdefault(name, []).append(arm_ms)
                log(f"RESULT grad_profile {args.task} B={B} Lt={Lt} "
                    f"Nb={Nb} M={M} trial{trial}: "
                    f"{name}={_rate(arm_ms):.1f}ms")
        except Exception as e:  # noqa: BLE001 — keep the other arms
            log(f"ARM-FAILED grad_profile {name}: {type(e).__name__}: "
                f"{str(e)[:300]}")
    _gp_summary({k: min(v) for k, v in ms.items()}, args)


def _gp_summary(best, args):
    B, Lt, Nb, M = args.batch, args.txt_len, args.num_bb, args.masked
    if "full" in best:
        rate = 1e3 / best["full"]
        log(f"grad_profile full: {rate:.2f} steps/s "
            + _implied_tfs(rate, B, Lt, Nb, M))
        for name, v in best.items():
            if name != "full":
                log(f"grad_profile delta full-{name}: "
                    f"{best['full'] - v:+.1f} ms "
                    f"({100 * (best['full'] - v) / best['full']:.0f}% of step)")


GP_ARM_NAMES = ("full", "fwd", "nodrop", "nohead", "frozenemb", "encoder")


def _grad_profile_per_arm_proc(args):
    """Driver mode (VERDICT r4 #2): re-exec one subprocess per arm with a
    bounded timeout and one retry, persisting each arm's RESULT rows to
    the log as it lands — a tunnel EOF (or VMEM OOM, or harness bug) in
    one arm can no longer erase the others. The parent never initializes
    the tunnel backend; each child owns the chip for its lifetime.
    Cross-process ms are comparable: every arm is a self-timed chained
    scan (bench.py methodology)."""
    import re as _re
    import subprocess
    arm_names = args.arms.split(",") if args.arms else list(GP_ARM_NAMES)
    base = [sys.executable, os.path.abspath(__file__),
            "--log", args.log or "", "grad_profile",
            "--batch", str(args.batch), "--txt_len", str(args.txt_len),
            "--num_bb", str(args.num_bb), "--iters", str(args.iters),
            "--trials", str(args.trials), "--dtype", args.dtype,
            "--task", args.task, "--masked", str(args.masked),
            "--attention", str(args.attention),
            "--rng_impl", args.rng_impl, "--layers", str(args.layers)]
    best = {}
    for name in arm_names:
        for attempt in range(2):
            log(f"per-arm-proc {name} attempt{attempt} start",
                time.strftime("%H:%M:%S"))
            try:
                r = subprocess.run(base + ["--arms", name],
                                   capture_output=True, text=True,
                                   timeout=args.arm_timeout)
            except subprocess.TimeoutExpired:
                log(f"per-arm-proc {name} TIMEOUT after "
                    f"{args.arm_timeout}s")
                continue
            vals = [float(m) for m in _re.findall(
                _re.escape(name) + r"=([0-9.]+)ms", r.stdout)]
            if r.returncode == 0 and vals:
                best[name] = min(vals)
                break
            log(f"per-arm-proc {name} rc={r.returncode} "
                f"parsed={len(vals)}; tail: "
                + (r.stdout + r.stderr)[-500:].replace("\n", " | "))
        else:
            log(f"ARM-FAILED grad_profile {name} (per-arm-proc, "
                f"2 attempts)")
    if best:
        log("per-arm-proc collected: "
            + " ".join(f"{k}={v:.1f}ms" for k, v in best.items()))
        _gp_summary(best, args)
    else:
        raise SystemExit("per-arm-proc: no arm produced a measurement")


def cmd_apply(args):
    """Chained-scan timing of the AdamW apply program alone (the split
    step's second half; the grad half is measured by train_ab). The full
    split-step rate is 1/(1/grad + 1/apply). The two halves cannot be
    chained together — a single program containing grad+AdamW hangs this
    image's remote compiler (BASELINE.md quirk log)."""
    import jax
    import jax.numpy as jnp
    from uc2_tpu.config import UC2Config
    from uc2_tpu.models.pretraining import UC2ForPretraining
    from uc2_tpu.training import optim as O
    cfg = UC2Config(dtype=args.dtype)
    model = UC2ForPretraining(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    tx = O.build_optimizer(params, O.constant(4e-5), grad_norm=5.0)
    opt_state = jax.jit(tx.init)(params)
    import optax

    @jax.jit
    def chain(params, opt_state):
        def body(carry, _):
            p, s, c = carry
            grads = jax.tree_util.tree_map(
                lambda x: jnp.full_like(x, 1e-8) + c * 1e-30, p)
            updates, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            # keep EVERY leaf alive: per-leaf optimizer chains are
            # independent, so summing only one leaf lets XLA dead-code the
            # rest (observed: 500 applies/s, 5x over the HBM bound)
            tot = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(p))
            return (p, s, tot * 1e-30), None
        (p, s, c), _ = jax.lax.scan(
            body, (params, opt_state, jnp.float32(0.0)), None,
            length=args.iters)
        return c
    t0 = time.time()
    float(chain(params, opt_state))
    log(f"compile apply: {time.time() - t0:.1f}s")
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(params))
    # fp32 state traffic per apply: read p/m/v (+in-scan grad), write p/m/v
    traffic_gb = 7 * 4 * n_params / 1e9
    for trial in range(args.trials):
        t0 = time.perf_counter()
        float(chain(params, opt_state))
        dt = time.perf_counter() - t0
        rate = args.iters / dt
        log(f"RESULT apply(adamw chained) trial{trial}: "
            f"{_rate(rate):.2f} applies/s "
            f"[{rate * traffic_gb:.0f} GB/s of ~{traffic_gb:.1f} GB state "
            f"traffic/apply; v5e HBM ~820 GB/s]")


def cmd_fused(args):
    """Probe the FUSED train step — grad + AdamW in ONE jitted program,
    chained in a lax.scan (the program a real TPU host runs; reference
    equivalent: the single optimizer.step() loop, pretrain.py:617-641).

    Round 1 found this hangs the axon remote compiler (>60 min, killed —
    BASELINE.md quirk log) and split grad/apply became the measurement
    workaround (`--split_step`). Two things changed since then: the
    harnesses stopped closing device arrays over jit bodies (the r5e
    HTTP-413 root cause — closure constants become HLO literals and blow
    up the remote_compile request body), and this probe logs compile
    wall-time with a hard outer `timeout` so a hang costs minutes, not an
    hour. If it compiles, the measured chained rate SUPERSEDES the derived
    split-step 1/(1/grad + 1/apply) and quantifies what the two-dispatch
    split costs; if it still hangs, rc=124 documents the transport bug
    with a bounded spend."""
    import jax
    import jax.numpy as jnp
    import optax
    from uc2_tpu.config import UC2Config
    from uc2_tpu.models.pretraining import UC2ForPretraining
    from uc2_tpu.training import optim as O
    from uc2_tpu.training.step import make_loss_fn

    rng = np.random.default_rng(0)
    cfg = UC2Config(dtype=args.dtype,   # default attention (pallas-train)
                    num_hidden_layers=args.layers)
    model = UC2ForPretraining(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    loss_fn = make_loss_fn(model, args.task)
    tx = O.build_optimizer(params, O.constant(4e-5), grad_norm=5.0)
    opt_state = jax.jit(tx.init)(params)

    B, Lt, Nb, M = args.batch, args.txt_len, args.num_bb, args.masked
    batch = _scoring_batch(rng, B, Lt, Nb, cfg.vocab_size)
    batch["masked_pos"] = jnp.asarray(
        rng.integers(1, Lt, (B, M)).astype(np.int32))
    batch["masked_weight"] = jnp.ones((B, M), np.float32)
    batch["txt_labels"] = jnp.asarray(
        rng.integers(4, cfg.vocab_size, (B, M)).astype(np.int32))

    def chain_fn(params, opt_state, batch, key):
        def body(carry, i):
            p, s, c = carry
            b = dict(batch)
            b["img_feat"] = batch["img_feat"] + c * 1e-30
            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, b, jax.random.fold_in(key, i))
            updates, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            # every updated leaf folds into the carry — params feed the
            # next iteration anyway, but the LAST iteration's update must
            # also stay live (DCE discipline, DESIGN.md post-mortem #3)
            tot = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree_util.tree_leaves(p))
            return (p, s, tot * 1e-30 + loss * 0.0), loss
        (p, s, c), losses = jax.lax.scan(
            body, (params, opt_state, jnp.float32(0.0)),
            jnp.arange(args.iters))
        # return the updated state: outputs give donated inputs something
        # to alias into (donation of a buffer with no same-shaped output
        # is silently unusable — the r5g first-attempt mistake), and the
        # trials THREAD state through, production-style
        return p, s, c + jnp.sum(losses) * 1e-30, losses[-1]

    # --donate matches the production fused step (make_train_step jits
    # with donated state at the call site): without it the chain keeps a
    # second fp32 copy of params+m+v (~3.3 GB at uc2-base) live as the
    # preserved inputs, which is pure HBM pressure on a 16G chip. State
    # threads trial-to-trial (each call consumes the previous call's
    # output buffers) so exactly one state copy ever exists.
    chain = jax.jit(chain_fn,
                    donate_argnums=(0, 1) if args.donate else ())

    t0 = time.time()
    p0, s0, c, loss = chain(params, opt_state, batch,
                            _mk_key(0, args.rng_impl))
    float(c)
    log(f"compile fused({args.task} B={B} rng={args.rng_impl} "
        f"donate={args.donate}): {time.time() - t0:.1f}s  "
        f"loss={float(loss):.6f}")
    for trial in range(args.trials):
        t0 = time.perf_counter()
        p0, s0, c, _ = chain(p0, s0, batch, _mk_key(trial, args.rng_impl))
        float(c)
        dt = time.perf_counter() - t0
        rate = args.iters / dt
        log(f"RESULT fused {args.task} B={B} Lt={Lt} Nb={Nb} M={M} "
            f"rng={args.rng_impl} donate={int(args.donate)} "
            f"trial{trial}: {_rate(rate):.2f} steps/s, "
            f"{_rate(rate * B):.0f} ex/s " + _implied_tfs(rate, B, Lt, Nb, M))


def cmd_pretrain_loop(args):
    """Sustained END-TO-END pretrain rate (VERDICT r3 #2): runs the real
    ``pretrain.py`` driver — input pipeline, bucket routing, grad +
    donated AdamW apply, deferred metrics — over a synthetic corpus at
    uc2-base shapes (token-budget buckets, texts to max_txt_len, nbb in
    [10,100]) and reports the driver's own sustained-window rate (full
    host syncs at both window edges, compiles excluded). This is the
    number the reference logs as its headline (pretrain.py:617-641), as
    opposed to the derived split-step rate from train_ab + apply.
    ``--no_prefetch`` measures the round-2 #6 prefetch on/off delta."""
    import subprocess
    from uc2_tpu.data.synth import synth_corpus
    corpus_dir = "/tmp/tpu_measure_pretrain_corpus"
    corpus = synth_corpus(corpus_dir, n_imgs=256, txt_per_img=4,
                          min_bb=10, max_bb=100, max_words=60, seed=0)
    spec = [{"name": "en", "db": corpus["txt_db"], "img": corpus["img_db"],
             "tasks": [args.task], "mix_ratio": [1]}]
    out_dir = f"/tmp/tpu_measure_pretrain_out_{int(time.time())}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [sys.executable, os.path.join(repo, "pretrain.py"),
           "--train_datasets", __import__("json").dumps(spec),
           "--model_config", os.path.join(repo, "config", "uc2-base.json"),
           "--output_dir", out_dir,
           "--num_train_steps", str(args.steps),
           "--gradient_accumulation_steps", str(args.accum),
           "--valid_steps", "0", "--save_steps", "1000000",
           "--log_steps", str(args.log_steps),
           "--perf_warmup_steps", str(args.warmup),
           "--split_step",          # fused grad+adamw hangs this image's
                                    # remote compiler (BASELINE.md quirk)
           "--train_batch_size", str(args.budget),
           "--dtype", args.dtype]
    if args.no_prefetch:
        cmd.append("--no_prefetch")
    log("pretrain_loop cmd:", " ".join(cmd[1:3]), "... steps",
        args.steps, "prefetch", not args.no_prefetch)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=repo, capture_output=True, text=True)
    txt = r.stdout + r.stderr
    final = [ln for ln in txt.splitlines() if "FINAL sustained" in ln]
    sus = [ln for ln in txt.splitlines() if "sustained" in ln]
    for ln in sus[-6:]:
        log(" ", ln.strip())
    if r.returncode != 0 or not final:
        log("pretrain_loop FAILED rc=", r.returncode)
        log(txt[-3000:])
        return
    log(f"RESULT pretrain_loop {args.task} accum={args.accum} "
        f"prefetch={not args.no_prefetch} steps={args.steps}: "
        f"{final[-1].split('FINAL ')[-1].strip()} "
        f"(wall {time.time() - t0:.0f}s incl. compiles)")


def cmd_h2d(args):
    """Tunnel transport microbench: H2D bandwidth + per-dispatch
    round-trip latency. Attributes the sustained-pretrain-loop gap
    (BASELINE.md r4: 147 ex/s sustained vs 681 ex/s derived compute
    rate) to measured transport numbers instead of a hand-wave. Sync
    discipline: block_until_ready does NOT block through this tunnel, so
    every timing closes with a device->host scalar readback that DEPENDS
    on the transferred data (jnp.sum)."""
    import jax
    import jax.numpy as jnp

    # (a) dispatch round-trip: tiny jitted program + scalar readback
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))                                     # compile
    for trial in range(args.trials):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            x = f(x)
            float(x)                                # full round trip
        dt = time.perf_counter() - t0
        log(f"RESULT h2d dispatch-roundtrip trial{trial}: "
            f"{1e3 * dt / args.iters:.1f} ms/dispatch "
            f"({args.iters / dt:.1f} sync'd dispatches/s)")

    # (b) H2D bandwidth at pretrain-batch-like sizes (fp16 img_feat for
    # one bucket batch is ~13-52 MB)
    s = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    for mb in (8, 32, 64):
        arr = np.ones((mb * 1024 * 1024 // 2,), np.float16)
        float(s(jax.device_put(arr)))               # compile + warm
        for trial in range(args.trials):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                float(s(jax.device_put(arr)))       # readback depends on data
            dt = time.perf_counter() - t0
            per = dt / args.iters
            log(f"RESULT h2d {mb}MB trial{trial}: {per * 1e3:.0f} ms/xfer "
                f"= {mb / per:.0f} MB/s (incl. one dispatch+readback)")


def cmd_eval(args):
    import jax
    from uc2_tpu.config import UC2Config
    from uc2_tpu.data.db import DetectFeatDb, TxtTokDb
    from uc2_tpu.data.synth import synth_corpus
    from uc2_tpu.evalu.retrieval import score_matrix
    from uc2_tpu.models.finetune import UC2ForImageTextRetrieval
    out = "/tmp/tpu_measure_eval_corpus"
    corpus = synth_corpus(out, n_imgs=args.n_img,
                          txt_per_img=max(1, args.n_txt // args.n_img),
                          min_bb=10, max_bb=args.num_bb, seed=0)
    cfg = UC2Config(dtype=args.dtype)
    model = UC2ForImageTextRetrieval(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    tdb = TxtTokDb(corpus["txt_db"], max_txt_len=args.txt_len - 2)
    idb = DetectFeatDb(corpus["img_db"], 0.2, args.num_bb, 10, 36)
    tids = list(tdb.ids)[:args.n_txt]
    iids = sorted({tdb.txt2img[t] for t in tids},
                  key=lambda im: (idb.name2nbb[im], im))
    t0 = time.perf_counter()
    m = score_matrix(model, params, tdb, idb, tids, iids, args.txt_len,
                     args.num_bb, batch_size=args.batch)
    dt = time.perf_counter() - t0
    log(f"RESULT eval {len(tids)}x{len(iids)} (incl. compile): "
        f"{_rate(m.size / dt):.0f} pairs/s")
    t0 = time.perf_counter()
    score_matrix(model, params, tdb, idb, tids, iids, args.txt_len,
                 args.num_bb, batch_size=args.batch)
    dt = time.perf_counter() - t0
    log(f"RESULT eval {len(tids)}x{len(iids)} (warm): "
        f"{_rate(m.size / dt):.0f} pairs/s")


def main():
    global LOG
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--log", default="bench_results.txt",
                    help="append results here ('' to disable)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--batch", type=int, default=64)
        p.add_argument("--txt_len", type=int, default=62)
        p.add_argument("--num_bb", type=int, default=100)
        p.add_argument("--iters", type=int, default=20)
        p.add_argument("--trials", type=int, default=3)
        p.add_argument("--dtype", default="bfloat16")

    ps = sub.add_parser("score"); common(ps)
    ps.add_argument("--attention", choices=["xla", "pallas"], default="xla")
    ps.add_argument("--quant", choices=["none", "int8"], default="none")
    pa = sub.add_parser("ab"); common(pa)
    psn = sub.add_parser("score_snap"); common(psn)
    pt = sub.add_parser("train"); common(pt)
    pt.add_argument("--attention",
                    choices=["xla", "pallas", "pallas-train"],
                    default="pallas")
    pt.add_argument("--accum", type=int, default=1)
    pt.add_argument("--task", default="mlm")
    pt.add_argument("--masked", type=int, default=24)
    pt.add_argument("--remat", default=None)
    pt.add_argument("--ce_chunks", type=int, default=0)
    pt.add_argument("--rng_impl", choices=["threefry2x32", "rbg"],
                    default="threefry2x32")
    pt.set_defaults(iters=8)
    pab = sub.add_parser("train_ab"); common(pab)
    pab.add_argument("--task", default="mlm")
    pab.add_argument("--masked", type=int, default=24)
    pab.add_argument("--layers", type=int, default=12,
                     help="encoder depth (CPU tests shrink it)")
    pab.add_argument("--arms", default="",
                     help="comma list of arms to run (default: all 4), "
                          "e.g. 'pallas-train' for a batch-size sweep")
    pab.add_argument("--attn_bb_list", default="",
                     help="comma list of UC2_ATTN_TRAIN_BB values; turns "
                          "the A/B into a tile sweep (0 = heuristic)")
    pab.set_defaults(iters=8)
    pap = sub.add_parser("apply"); common(pap)
    pap.set_defaults(iters=16)
    pf = sub.add_parser("fused"); common(pf)
    pf.add_argument("--task", default="mlm")
    pf.add_argument("--masked", type=int, default=24)
    pf.add_argument("--rng_impl", choices=["threefry2x32", "rbg"],
                    default="rbg",
                    help="production default (rbg since round 5) — the "
                         "probe's point of comparison is the split-step "
                         "rate at the same PRNG")
    pf.add_argument("--layers", type=int, default=12,
                    help="encoder depth (shrink for CPU smoke tests)")
    pf.add_argument("--donate", action="store_true",
                    help="donate params+opt_state into the chain (the "
                         "production fused step's memory profile); each "
                         "trial re-inits state on device")
    pf.set_defaults(iters=8)
    pgp = sub.add_parser("grad_profile"); common(pgp)
    pgp.add_argument("--task", default="mlm")
    pgp.add_argument("--masked", type=int, default=24)
    pgp.add_argument("--attention", default="pallas-train",
                     help="xla | pallas-train (default)")
    pgp.add_argument("--arms", default="",
                     help="comma list (default: all 6)")
    pgp.add_argument("--rng_impl", choices=["threefry2x32", "rbg"],
                     default="threefry2x32",
                     help="dropout PRNG for all arms (full-nodrop delta "
                          "under rbg isolates mask-apply from mask-gen)")
    pgp.add_argument("--layers", type=int, default=12,
                     help="encoder depth (shrink for CPU smoke tests)")
    pgp.add_argument("--per_arm_proc", action="store_true",
                     help="driver mode: one subprocess per arm, bounded "
                          "timeout + one retry, incremental persistence "
                          "(tunnel-EOF-proof)")
    pgp.add_argument("--arm_timeout", type=int, default=2400,
                     help="per-arm subprocess timeout, seconds")
    pgp.set_defaults(iters=8)
    pl = sub.add_parser("pretrain_loop"); common(pl)
    pl.add_argument("--task", default="mlm")
    pl.add_argument("--steps", type=int, default=120)
    pl.add_argument("--accum", type=int, default=1)
    pl.add_argument("--log_steps", type=int, default=20)
    pl.add_argument("--warmup", type=int, default=20)
    pl.add_argument("--no_prefetch", action="store_true")
    pl.add_argument("--budget", type=int, default=10240,
                    help="token budget per bucket batch (reference "
                         "default 10240 -> B~63 at joint L=162; 20480 "
                         "lands on the measured B=128 grad sweet spot)")
    ph = sub.add_parser("h2d"); common(ph)
    ph.set_defaults(iters=10, trials=2)
    pe = sub.add_parser("eval"); common(pe)
    pe.add_argument("--n_txt", type=int, default=256)
    pe.add_argument("--n_img", type=int, default=128)

    args = ap.parse_args()
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the image's sitecustomize force-registers the axon backend and
        # overrides JAX_PLATFORMS; the config update wins over both
        # (tests/conftest.py) — needed for CPU smoke runs of this tool
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.log:
        LOG = open(args.log, "a")
    log(f"=== tpu_measure {args.cmd} start", time.strftime("%H:%M:%S"))
    if args.cmd != "pretrain_loop" and not getattr(args, "per_arm_proc",
                                                   False):
        # pretrain_loop and per-arm-proc run SUBPROCESSES which need the
        # chip — the parent must not initialize the tunnel backend
        import jax
        import jax.numpy as jnp
        t0 = time.time()
        float(jnp.sum(jnp.ones((8, 8))))
        log("device ready", round(time.time() - t0, 1))
    {"score": cmd_score, "ab": cmd_ab, "train": cmd_train,
     "score_snap": cmd_score_snap,
     "train_ab": cmd_train_ab, "apply": cmd_apply, "fused": cmd_fused,
     "grad_profile": cmd_grad_profile,
     "pretrain_loop": cmd_pretrain_loop, "eval": cmd_eval,
     "h2d": cmd_h2d}[args.cmd](args)
    log(f"=== tpu_measure {args.cmd} done", time.strftime("%H:%M:%S"))


if __name__ == "__main__":
    main()
