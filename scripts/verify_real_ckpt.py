#!/usr/bin/env python
"""Real-artifact parity runbook: one command from a released UC2 PyTorch
checkpoint + reference-format LMDB databases to R@K numbers and torch-logit
parity stats.

This is the proof this image cannot produce (no released checkpoint, no
egress): run it on ANY machine holding the artifacts. It exercises the full
interop chain —

  1. import the reference LMDB txt/img DBs into u2s stores
     (scripts/import_lmdb.py; works without the lmdb/lz4 wheels)
  2. load the .pt through the converter (models/convert.py reproduces the
     reference's from_pretrained rename rules, model/model.py:175-278),
     merging over randomly-initialized params; rank head from the
     pretrained ITM head when absent (reference model/itm.py:23-26)
  3. logit parity: one real batch through BOTH the JAX model (fp32) and an
     independent torch re-implementation loaded with the same state dict
     (tests/torch_oracle.py) — prints max/mean |Δ| of the rank scores and
     their Pearson correlation
  4. full retrieval eval (evalu/retrieval.py ≡ reference itm.py:492-538 +
     eval/itm.py:6) — prints R@1/5/10 both directions

Usage (reference artifacts):
  python scripts/verify_real_ckpt.py \
      --checkpoint /path/uc2_mscoco_itm.pt \
      --txt_db /path/coco_txt_db --img_db /path/coco_img_db \
      --workdir /tmp/uc2_verify

DB dirs are auto-detected: a directory containing txt.u2s/feat.u2s is used
as-is; one containing data.mdb is imported first. --txt_limit caps eval
size for a quick smoke. The dry-run test over synthetic oracle artifacts
is tests/test_verify_real_ckpt.py.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _is_u2s(path: str, fname: str) -> bool:
    return os.path.exists(os.path.join(path, fname))


def _import_if_lmdb(kind: str, src: str, workdir: str) -> str:
    """Return a u2s DB dir for ``src``, importing reference LMDB if needed."""
    fname = "txt.u2s" if kind == "txt" else "feat.u2s"
    if _is_u2s(src, fname):
        return src
    if not os.path.exists(os.path.join(src, "data.mdb")):
        raise FileNotFoundError(
            f"{src}: neither a u2s store ({fname}) nor an LMDB env (data.mdb)")
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "import_lmdb",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "import_lmdb.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    dst = os.path.join(workdir, f"{kind}_db")
    if kind == "txt":
        mod.import_txt(src, dst)
    else:
        mod.import_img(src, dst, npz=True)
    print(f"[verify] imported LMDB {src} -> {dst}")
    return dst


def _parity_batch(txt_db, img_db, cfg, max_txt_len, num_bb, B):
    """One real batch ([CLS] ids [SEP] | region feats), reference layout."""
    Lt = max_txt_len + 2
    ids_arr = np.full((B, Lt), cfg.pad_token_id, np.int64)
    feats = np.zeros((B, num_bb, cfg.img_dim), np.float32)
    pos7 = np.zeros((B, num_bb, 7), np.float32)
    mask = np.zeros((B, Lt + num_bb), np.int64)
    tids = list(txt_db.ids)[:B]
    for b, tid in enumerate(tids):
        rec = txt_db[tid]
        ids = np.asarray(txt_db.combine_inputs(rec["input_ids"]))[:Lt]
        ids_arr[b, :len(ids)] = ids
        mask[b, :len(ids)] = 1
        img_feats, img_bb7 = img_db[txt_db.txt2img[tid]]
        nb = min(img_feats.shape[0], num_bb)
        feats[b, :nb] = img_feats[:nb]
        pos7[b, :nb] = img_bb7[:nb]
        mask[b, Lt:Lt + nb] = 1
    return ids_arr, feats, pos7, mask


def _torch_parity(sd_norm, params, model, cfg, batch, num_answer=0):
    """Rank-score parity: JAX model vs the independent torch oracle loaded
    with the identical (normalized) state dict."""
    import jax
    import jax.numpy as jnp
    import torch
    from tests.torch_oracle import OracleUC2

    ids, feats, pos7, mask = batch
    oracle = OracleUC2(
        vocab=cfg.vocab_size, h=cfg.hidden_size,
        n_layers=cfg.num_hidden_layers, n_heads=cfg.num_attention_heads,
        ffn=cfg.intermediate_size, max_pos=cfg.max_position_embeddings,
        img_dim=cfg.img_dim, img_label_dim=cfg.img_label_dim,
        pad=cfg.pad_token_id, num_answer=max(1, num_answer))
    own = oracle.state_dict()
    want = {k: torch.tensor(np.asarray(v, np.float32))
            for k, v in sd_norm.items()
            if k in own and tuple(own[k].shape) == tuple(
                np.asarray(v).shape)}
    missing = sorted(set(own) - set(want))
    unexpected = sorted(set(sd_norm) - set(want))
    oracle.load_state_dict(want, strict=False)
    # rank head: mirror the JAX-side ITM→rank initialization when absent
    if any("rank_output" in m for m in missing):
        with torch.no_grad():
            oracle.rank_output.weight.copy_(
                torch.tensor(np.asarray(
                    params["rank_output"]["out"]["kernel"]).T))
            oracle.rank_output.bias.copy_(torch.tensor(np.asarray(
                params["rank_output"]["out"]["bias"])))
    with torch.no_grad():
        _, t_pool = oracle.encode(
            torch.tensor(ids), torch.tensor(feats), torch.tensor(pos7),
            torch.tensor(mask))
        t_scores = oracle.rank_output(t_pool)[:, 0].numpy()

    fp32 = {k: (jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32), v)) for k, v in params.items()}
    j_scores = np.asarray(model.scores(
        fp32, {"input_ids": jnp.asarray(ids, jnp.int32),
               "img_feat": jnp.asarray(feats),
               "img_pos_feat": jnp.asarray(pos7),
               "attn_mask": jnp.asarray(mask, jnp.int32)},
        deterministic=True), np.float32)
    d = np.abs(j_scores - t_scores)
    corr = float(np.corrcoef(j_scores, t_scores)[0, 1]) \
        if len(j_scores) > 1 else 1.0
    return {"logit_max_abs_diff": float(d.max()),
            "logit_mean_abs_diff": float(d.mean()),
            "logit_pearson": corr,
            "oracle_missing_keys": sorted(missing),
            "oracle_unexpected_keys": sorted(unexpected)[:20]}


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="UC2 real-checkpoint parity runbook")
    ap.add_argument("--checkpoint", required=True,
                    help=".pt/.bin (reference format) or .msgpack (ours)")
    ap.add_argument("--txt_db", required=True,
                    help="reference LMDB dir or imported u2s dir")
    ap.add_argument("--img_db", required=True)
    ap.add_argument("--model_config", default="config/uc2-base.json")
    ap.add_argument("--workdir", default="/tmp/uc2_verify")
    ap.add_argument("--max_txt_len", type=int, default=60)
    ap.add_argument("--conf_th", type=float, default=0.2)
    ap.add_argument("--max_bb", type=int, default=100)
    ap.add_argument("--min_bb", type=int, default=10)
    ap.add_argument("--num_bb", type=int, default=36)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--txt_limit", type=int, default=0,
                    help="cap eval texts for a quick smoke (0 = all)")
    ap.add_argument("--parity_batch", type=int, default=8)
    ap.add_argument("--skip_torch", action="store_true",
                    help="skip the torch-oracle logit parity stage")
    ap.add_argument("--dtype", default="float32",
                    help="eval dtype (float32 for parity, bfloat16 on TPU)")
    ap.add_argument("--quant", choices=["none", "int8"], default="none",
                    help="ALSO run the eval with int8 serving quantization "
                         "and report the R@K deltas vs the unquantized run")
    args = ap.parse_args(argv)

    import jax
    from uc2_tpu.config import UC2Config
    from uc2_tpu.data.db import DetectFeatDb, TxtTokDb
    from uc2_tpu.evalu.retrieval import full_retrieval_eval
    from uc2_tpu.models import convert
    from uc2_tpu.models.finetune import UC2ForImageTextRetrieval
    from pretrain import load_raw_checkpoint

    os.makedirs(args.workdir, exist_ok=True)
    txt_dir = _import_if_lmdb("txt", args.txt_db, args.workdir)
    img_dir = _import_if_lmdb("img", args.img_db, args.workdir)

    with open(args.model_config) as f:
        cfg = UC2Config(**json.load(f), dtype=args.dtype)
    model = UC2ForImageTextRetrieval(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    sd = load_raw_checkpoint(args.checkpoint)
    if isinstance(sd, dict) and isinstance(sd.get("roberta"), dict):
        loaded, sd_norm = sd, None       # our own nested tree
    else:
        sd_norm = convert.normalize_state_dict(sd)
        sd_norm = convert.add_model_prefix(sd_norm)
        loaded = convert.torch_to_params(sd_norm)
    params = convert.merge_params(params, loaded)
    if "rank_output" not in loaded:
        params = convert.init_rank_from_itm(params)
        print("[verify] rank head initialized from pretrained ITM head")

    txt_db = TxtTokDb(txt_dir, max_txt_len=args.max_txt_len)
    img_db = DetectFeatDb(img_dir, args.conf_th, args.max_bb, args.min_bb,
                          args.num_bb)

    report = {"checkpoint": args.checkpoint,
              "n_loaded_params": len(jax.tree_util.tree_leaves(loaded))}

    if not args.skip_torch and sd_norm is not None:
        batch = _parity_batch(txt_db, img_db, cfg, args.max_txt_len,
                              args.num_bb, args.parity_batch)
        report.update(_torch_parity(sd_norm, params, model, cfg, batch))
        print(f"[verify] logit parity: max|Δ|="
              f"{report['logit_max_abs_diff']:.3e} "
              f"mean|Δ|={report['logit_mean_abs_diff']:.3e} "
              f"pearson={report['logit_pearson']:.6f}")

    txt_ids = list(txt_db.ids)
    if args.txt_limit:
        txt_ids = txt_ids[:args.txt_limit]
    metrics = full_retrieval_eval(
        model, params, txt_db, img_db, args.max_txt_len + 2, args.num_bb,
        batch_size=args.batch_size, txt_ids=txt_ids)
    report["retrieval"] = {k: round(float(v), 4) for k, v in metrics.items()}
    print("[verify] retrieval:", report["retrieval"])

    if args.quant != "none":
        qmodel = UC2ForImageTextRetrieval(cfg.replace(quant=args.quant))
        qmetrics = full_retrieval_eval(
            qmodel, params, txt_db, img_db, args.max_txt_len + 2,
            args.num_bb, batch_size=args.batch_size, txt_ids=txt_ids)
        report["retrieval_int8"] = {k: round(float(v), 4)
                                    for k, v in qmetrics.items()}
        report["retrieval_int8_delta"] = {
            k: round(float(qmetrics[k]) - float(metrics[k]), 4)
            for k in metrics}
        print("[verify] retrieval int8:", report["retrieval_int8"])
        print("[verify] int8 R@K delta:", report["retrieval_int8_delta"])
    print(json.dumps(report, default=str))
    return report


if __name__ == "__main__":
    main()
