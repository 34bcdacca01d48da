"""Serving-trunk distillation: spend the north-star's quality budget on depth.

BASELINE.md's gate is ">= 5,000 512-token windows/s/chip with Pk/WinDiff
within 0.2 of the PyTorch reference". BENCH_CEILING.md shows dense 12-layer
BERT-base cannot reach 5,000 on this chip (int8-perfect ~= 4k w/s) — but the
0.2-Pk budget is part of the metric, and depth is the one lever that moves
the ceiling. This script produces the quality evidence:

  1. ``--stage torch12``: the PyTorch reference anchor — the parity_e2e
     torch oracle (reference-faithful model+loss stack, see
     scripts/parity_e2e.py) at TWELVE layers, trained with the reference
     recipe on the e2e-harness corpus. This is "the PyTorch reference" of
     the gate, at the harness scale.
  2. ``--stage jax``: our 12-layer teacher through the real run_finetune
     CLI (same recipe), then 6- and 4-layer students initialized from
     evenly-spaced teacher layers and trained with logit distillation
     (temperature-scaled KL on live-label token logits, Hinton 2015) + the
     ts CE loss, evaluated with the same window-level metrics.
  3. ``--stage emit``: PARITY_DISTILL.json — per-depth ΔPk/ΔF1 vs the torch
     12-layer anchor, gated at 0.2. bench.py reads this artifact to decide
     whether the distilled serving depth may carry the headline number.

Stages are separate because the torch 12-layer run costs ~2h on this
machine's single CPU core while the jax stage runs in minutes on the chip.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import parity_e2e  # noqa: E402

IGNORE = -100
TEACHER_LAYERS = 12
STUDENT_DEPTHS = (6, 4)
# evenly spaced teacher layers, always keeping the last (DistilBERT-style)
LAYER_MAPS = {
    6: (1, 3, 5, 7, 9, 11),
    4: (2, 5, 8, 11),
    2: (5, 11),
    1: (11,),
}


def build_assets(workdir: str, hp):
    return parity_e2e.build_assets(
        workdir, seed=0, layers=TEACHER_LAYERS, trunk="bert",
        hidden=hp.hidden, heads=hp.heads, intermediate=hp.intermediate,
        max_seq_length=hp.max_seq_length,
        corpus_profile=hp.corpus_profile,
        corpus_docs=(hp.n_train_docs, hp.n_dev_docs, hp.n_test_docs),
    )


# --------------------------------------------------------------------------
# stage: torch12 — the PyTorch reference anchor at 12 layers
# --------------------------------------------------------------------------


def stage_torch12(workdir: str, hp) -> dict:
    assets = build_assets(workdir, hp)
    metrics = parity_e2e.run_torch(assets, hp)
    out = {"hp": dataclasses.asdict(hp), "layers": TEACHER_LAYERS,
           "torch": metrics}
    with open(os.path.join(workdir, "torch12.json"), "w") as f:
        json.dump(out, f, indent=2, default=float)
    print(json.dumps(out, indent=2, default=float))
    return out


# --------------------------------------------------------------------------
# stage: jax — teacher via the CLI, students via logit distillation
# --------------------------------------------------------------------------


def _student_params_from_teacher(teacher_params, depth: int):
    """Embeddings + evenly spaced encoder layers + both heads."""
    import jax

    enc_t = teacher_params["encoder"]
    enc_s = {"embeddings": enc_t["embeddings"]}
    for j, t in enumerate(LAYER_MAPS[depth]):
        enc_s[f"layer_{j}"] = enc_t[f"layer_{t}"]
    student = {
        "encoder": enc_s,
        "classifier": teacher_params["classifier"],
        "tssp_classifier": teacher_params["tssp_classifier"],
    }
    return jax.tree.map(lambda x: np.asarray(x).copy(), student)


def _evaluate_jax(model, params, eval_docs, wcfg):
    """Window-level eval mirroring parity_e2e.evaluate_torch exactly."""
    import jax
    import jax.numpy as jnp

    from spokennlp_tpu.data.windowing import stack_windows, window_document
    from spokennlp_tpu.eval import seg_metrics

    windows = []
    for eid, doc in enumerate(eval_docs):
        windows.extend(
            window_document(doc["sent_token_ids"], doc["labels"], wcfg, eid)
        )
    batch = stack_windows(windows)

    @jax.jit
    def fwd(params, ids, mask, tt):
        out = model.apply({"params": params}, ids, attention_mask=mask,
                          token_type_ids=tt, deterministic=True)
        return out["token_logits"].astype(jnp.float32)

    N = batch["input_ids"].shape[0]
    B = 32
    outs = []
    for s in range(0, N, B):
        e = min(s + B, N)
        pad = B - (e - s)
        sl = {k: batch[k][s:e] for k in ("input_ids", "attention_mask",
                                         "token_type_ids")}
        if pad:
            sl = {k: np.concatenate([v, np.repeat(v[-1:], pad, 0)])
                  for k, v in sl.items()}
        lg = np.asarray(fwd(params, jnp.asarray(sl["input_ids"]),
                            jnp.asarray(sl["attention_mask"]),
                            jnp.asarray(sl["token_type_ids"])))
        outs.append(lg[: e - s])
    logits = np.concatenate(outs, 0)

    preds, refs = [], []
    for i in range(len(windows)):
        live = batch["labels"][i] != IGNORE
        if not live.any():
            continue
        preds.append(logits[i][live].argmax(-1).tolist())
        refs.append(batch["labels"][i][live].tolist())
    prf = seg_metrics.boundary_prf(preds, refs)
    wm = seg_metrics.compute_window_metric(
        [[1 if v == 0 else 0 for v in p] for p in preds],
        [[1 if v == 0 else 0 for v in r] for r in refs],
    )
    return {"f1": prf["overall_f1"], "precision": prf["overall_precision"],
            "recall": prf["overall_recall"], "pk": wm["pk"], "wd": wm["wd"]}


def _distill_student(assets, hp, teacher_model, teacher_params, depth: int,
                     kd_weight: float, kd_temp: float, train_docs, eval_docs,
                     wcfg, student_lr: float = 5e-4, hid_weight: float = 0.0):
    """Logit-distillation training of one student depth.

    The student starts FROM the teacher's weights (evenly spaced layers),
    so it trains at a lower LR than the from-scratch teacher recipe
    (hp.learning_rate would scramble the initialization before the weaker
    CE+KD signal could recover it — measured: students at lr 2e-3 landed
    WORSE than a from-scratch 2-layer with the full recipe). Both windowed
    views carry CE+KD, mirroring the dual-view structure of the teacher
    recipe.

    hid_weight > 0 adds a TinyBERT-style intermediate-layer loss: MSE
    between the student's post-layer hidden states and the teacher's at
    the mapped layers (LAYER_MAPS), masked to live (unpadded) tokens.
    Same hidden width, so no projection is needed."""
    import jax
    import jax.numpy as jnp
    import optax

    from spokennlp_tpu.data.featurization import batches_from_docs, featurize_paired
    from spokennlp_tpu.models.topic_seg import TopicSegModel
    from spokennlp_tpu.ops import losses as loss_ops

    enc_cfg = dataclasses.replace(teacher_model.enc_cfg, num_layers=depth)
    task_cfg = teacher_model.task_cfg
    student = TopicSegModel(enc_cfg, task_cfg)
    s_params = _student_params_from_teacher(teacher_params, depth)

    n_windows = len(
        featurize_paired(train_docs, wcfg, np.random.default_rng(hp.seed))
    )
    steps_per_epoch = max(n_windows // hp.batch_size, 1)
    total_steps = max(int(steps_per_epoch * hp.epochs), 1)

    sched = optax.linear_schedule(student_lr, 0.0, total_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=hp.weight_decay,
                    mask=lambda p: jax.tree.map(lambda x: x.ndim > 1, p)),
    )
    opt_state = tx.init(s_params)
    class_w = loss_ops.ts_class_weights(hp.weight_label_zero)

    @jax.jit
    def step(s_params, opt_state, t_params, ids, mask, tt, labels, rng):
        # ids/mask/tt/labels: (B, 2, ...) paired views; CE+KD on both
        B2 = ids.shape[0]
        flat = lambda a: a.reshape((B2 * 2,) + a.shape[2:])
        fids, fmask, ftt, flabels = map(flat, (ids, mask, tt, labels))
        want_hid = hid_weight > 0.0
        t_out = teacher_model.apply(
            {"params": t_params}, fids, attention_mask=fmask,
            token_type_ids=ftt, deterministic=True,
            output_hidden_states=want_hid)
        t_logits = jax.lax.stop_gradient(t_out["token_logits"])
        t_hid = (tuple(jax.lax.stop_gradient(h) for h in t_out["hidden_states"])
                 if want_hid else None)

        def loss_fn(p):
            out = student.apply(
                {"params": p}, fids, attention_mask=fmask,
                token_type_ids=ftt,
                deterministic=False, rngs={"dropout": rng},
                output_hidden_states=want_hid)
            s_logits = out["token_logits"]
            ce = loss_ops.cross_entropy_with_ignore(
                s_logits, flabels, class_weights=class_w)
            # temperature-scaled KL at live-label positions, x T^2 (Hinton)
            live = (flabels != IGNORE).astype(jnp.float32)
            t_lp = jax.nn.log_softmax(t_logits / kd_temp, -1)
            s_lp = jax.nn.log_softmax(s_logits / kd_temp, -1)
            kl = (jnp.exp(t_lp) * (t_lp - s_lp)).sum(-1)
            kl = (kl * live).sum() / jnp.maximum(live.sum(), 1.0)
            loss = ce + kd_weight * (kd_temp ** 2) * kl
            if want_hid:
                # hidden_states[0] is embeddings; student layer j maps to
                # teacher layer LAYER_MAPS[depth][j] (post-layer outputs)
                tok = fmask.astype(jnp.float32)[..., None]  # (B2*2, L, 1)
                H = out["hidden_states"][0].shape[-1]
                denom = jnp.maximum(tok.sum(), 1.0) * H
                hid = 0.0
                pairs = [(0, 0)] + [
                    (j + 1, t + 1) for j, t in enumerate(LAYER_MAPS[depth])
                ]
                for sj, tj in pairs:
                    d = (out["hidden_states"][sj] - t_hid[tj]) * tok
                    hid = hid + (d * d).sum() / denom
                hid = hid / len(pairs)
                loss = loss + hid_weight * hid
            return loss, (ce, kl)

        (loss, (ce, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(s_params)
        updates, opt_state = tx.update(grads, opt_state, s_params)
        s_params = optax.apply_updates(s_params, updates)
        return s_params, opt_state, loss, ce, kl

    data_rng = np.random.default_rng(hp.seed)
    key = jax.random.PRNGKey(hp.seed)
    task_for_batches = task_cfg
    n = 0
    while n < total_steps:
        for b in batches_from_docs(train_docs, wcfg, task_for_batches,
                                   hp.batch_size, data_rng, drop_last=False):
            key, sub = jax.random.split(key)
            s_params, opt_state, loss, ce, kl = step(
                s_params, opt_state, teacher_params,
                jnp.asarray(b["input_ids"]),
                jnp.asarray(b["attention_mask"]),
                jnp.asarray(b["token_type_ids"]),
                jnp.asarray(b["labels"]),
                sub,
            )
            n += 1
            if n >= total_steps:
                break
    metrics = _evaluate_jax(student, s_params, eval_docs, wcfg)
    metrics["train_steps"] = n
    metrics["layers"] = depth
    return metrics, s_params


def _serving_eval(enc_cfg, task_cfg, depth, params, eval_docs, wcfg):
    """Evaluate through the SERVING path: W8A8 quantized projections, fused
    Pallas kernels, bf16 — exactly bench.py's model construction. Closes the
    round-4 advisor gap: quality was only ever measured on the unquantized
    einsum path while throughput was measured under W8A8."""
    import jax.numpy as jnp

    from spokennlp_tpu.models.topic_seg import TopicSegModel

    enc = dataclasses.replace(
        enc_cfg, num_layers=depth, quantize="w8a8", attention_impl="auto",
        softmax_in_compute_dtype=True)
    model = TopicSegModel(enc, task_cfg, dtype=jnp.bfloat16)
    return _evaluate_jax(model, params, eval_docs, wcfg)


def _pretrain_trunk(workdir: str, assets, hp, pretrain_epochs: float,
                    pretrain_lr: float) -> str:
    """MLM+NSP pretrain the trunk on the harness corpus, then let the
    teacher FINETUNE from it — the reference's actual regime (its quality
    numbers all start from pretrained checkpoints; run_finetune.sh:14 uses
    lr 5e-5 on longformer_base). Measured necessity at the serving shape:
    from-scratch 12L trunks at seq 512 stay at the all-O collapse through
    150-300 epochs for h in {256, 768} across lr {5e-4, 2e-3} x w0
    {0.5, 0.7} x warmup {0, 0.1} x attention_impl {fused, einsum} x
    aux-losses {on, off}, while the h=64/seq=128 harness shape learns to
    F1 1.0 on the same corpus — see ROUND1_NOTES.md round-5 notes."""
    import json as _json

    from spokennlp_tpu.cli import run_pretrain_mlm

    pre_dir = os.path.join(workdir, "pretrain")
    model_dir = os.path.join(pre_dir, "pretrained_model")
    if os.path.isdir(model_dir):
        return model_dir
    # corpus text: one sentence per line, blank line between documents
    text_path = os.path.join(pre_dir, "corpus.txt")
    os.makedirs(pre_dir, exist_ok=True)
    with open(os.path.join(assets["data_dir"], "train.jsonl")) as f, \
            open(text_path, "w") as out:
        for line in f:
            row = _json.loads(line)
            for s in row["sentences"]:
                out.write(s + "\n")
            out.write("\n")
    run_pretrain_mlm.main([
        "--train_file", text_path,
        "--output_dir", pre_dir,
        "--vocab_file", assets["vocab"],
        "--max_seq_length", str(hp.max_seq_length),
        "--hidden_size", str(hp.hidden),
        "--num_hidden_layers", str(TEACHER_LAYERS),
        "--num_attention_heads", str(hp.heads),
        "--intermediate_size", str(hp.intermediate),
        "--num_train_epochs", str(pretrain_epochs),
        "--learning_rate", str(pretrain_lr),
        "--seed", str(hp.seed),
    ])
    return model_dir


def stage_jax(workdir: str, hp, kd_weight: float, kd_temp: float,
              student_lr: float = 5e-4, hid_weight: float = 0.0,
              depths=STUDENT_DEPTHS, serving_eval: bool = False,
              pretrain_epochs: float = 0.0,
              pretrain_lr: float = 1e-4) -> dict:
    import jax.numpy as jnp

    from spokennlp_tpu.configs import TopicSegConfig, WindowingConfig
    from spokennlp_tpu.data.corpora import load_dataset_splits, tokenize_examples
    from spokennlp_tpu.models import checkpoint_io
    from spokennlp_tpu.models.topic_seg import TopicSegModel
    from transformers import BertTokenizer

    assets = build_assets(workdir, hp)
    if pretrain_epochs > 0:
        pre_model = _pretrain_trunk(workdir, assets, hp, pretrain_epochs,
                                    pretrain_lr)
        assets = {**assets, "model_dir": pre_model,
                  "vocab_file": assets["vocab"],
                  "tokenizer_dir": assets["model_dir"]}

    # 12-layer teacher through the real CLI (saves final_model); an
    # existing final_model is reused (re-running the stage to iterate on
    # the student recipe does not retrain the teacher)
    final_model = os.path.join(workdir, "jax_out", "final_model")
    if os.path.isdir(final_model):
        teacher_metrics = {"reused_existing_teacher": True}
    else:
        teacher_metrics = parity_e2e.run_jax(assets, hp)

    tok = BertTokenizer.from_pretrained(
        assets.get("tokenizer_dir", assets["model_dir"]))
    tokenize_fn = lambda s: tok(s, add_special_tokens=False)["input_ids"]
    splits = load_dataset_splits("wiki_section", assets["data_dir"])
    train_docs = tokenize_examples(splits["train"], tokenize_fn)
    eval_docs = tokenize_examples(splits["validation"], tokenize_fn)
    vocab = tok.get_vocab()
    wcfg = WindowingConfig(
        max_seq_length=hp.max_seq_length,
        cls_token_id=vocab["[CLS]"], pad_token_id=vocab["[PAD]"],
        bos_token_id=vocab["[BOS]"],
    )

    t_params, enc_cfg = checkpoint_io.load_checkpoint(
        os.path.join(assets["workdir"], "jax_out", "final_model"))
    # the topic-seg head never uses the pooler; the trained task params
    # don't carry one even when the converted config says add_pooler
    enc_cfg = dataclasses.replace(enc_cfg, add_pooler=False)
    task_cfg = TopicSegConfig(ts_loss_weight=hp.ts_loss_weight)
    teacher_model = TopicSegModel(enc_cfg, task_cfg)
    teacher_eval = _evaluate_jax(teacher_model, t_params, eval_docs, wcfg)
    if serving_eval:
        sm = _serving_eval(enc_cfg, task_cfg, enc_cfg.num_layers, t_params,
                           eval_docs, wcfg)
        teacher_eval.update({f"serving_{k}": v for k, v in sm.items()
                             if k in ("f1", "pk", "wd")})

    students = {}
    for depth in depths:
        # diagnostic: quality straight off the teacher-layer initialization
        init_eval = _evaluate_jax(
            TopicSegModel(
                dataclasses.replace(enc_cfg, num_layers=depth), task_cfg),
            _student_params_from_teacher(t_params, depth), eval_docs, wcfg)
        m, _ = _distill_student(
            assets, hp, teacher_model, t_params, depth, kd_weight, kd_temp,
            train_docs, eval_docs, wcfg, student_lr=student_lr,
            hid_weight=hid_weight)
        m["init_pk"] = init_eval["pk"]
        m["init_f1"] = init_eval["f1"]
        if serving_eval:
            sm = _serving_eval(enc_cfg, task_cfg, depth, s_params,
                               eval_docs, wcfg)
            m.update({f"serving_{k}": v for k, v in sm.items()
                      if k in ("f1", "pk", "wd")})
        students[str(depth)] = m
        print(f"[distill] student {depth}L: {m}", flush=True)

    # merge with an existing jax_distill.json so a later run adding one
    # depth (e.g. --depths 1) keeps the committed students, provided the
    # student recipe is identical
    prev_path = os.path.join(workdir, "jax_distill.json")
    if os.path.exists(prev_path):
        with open(prev_path) as f:
            prev = json.load(f)
        same_recipe = all(
            prev.get(k) == v for k, v in (
                ("kd_weight", kd_weight), ("kd_temp", kd_temp),
                ("student_lr", student_lr), ("hid_weight", hid_weight))
        )
        if same_recipe:
            students = {**prev.get("students", {}), **students}

    out = {
        "hp": dataclasses.asdict(hp),
        "kd_weight": kd_weight,
        "kd_temp": kd_temp,
        "student_lr": student_lr,
        "hid_weight": hid_weight,
        "jax_teacher_12l": {**teacher_metrics, **{f"win_{k}": v for k, v in teacher_eval.items()}},
        "students": students,
    }
    with open(os.path.join(workdir, "jax_distill.json"), "w") as f:
        json.dump(out, f, indent=2, default=float)
    print(json.dumps(out, indent=2, default=float))
    return out


# --------------------------------------------------------------------------
# stage: emit — PARITY_DISTILL.json
# --------------------------------------------------------------------------


def stage_emit(workdir: str, gate: float, out_path: str) -> dict:
    with open(os.path.join(workdir, "torch12.json")) as f:
        torch12 = json.load(f)
    with open(os.path.join(workdir, "jax_distill.json")) as f:
        jaxd = json.load(f)
    anchor = torch12["torch"]
    rows = {}
    for depth, m in sorted(jaxd["students"].items(), key=lambda kv: int(kv[0])):
        rows[depth] = {
            "metrics": m,
            "abs_delta_vs_torch12": {
                k: abs(m[k] - anchor[k]) for k in ("f1", "pk", "wd")
            },
            "within_gate": bool(abs(m["pk"] - anchor["pk"]) <= gate
                                and abs(m["wd"] - anchor["wd"]) <= gate),
        }
    passing = [int(d) for d, r in rows.items() if r["within_gate"]]
    result = {
        "what": (
            "Quality evidence for the distilled serving trunk: torch "
            "12-layer reference oracle vs our 12-layer teacher and "
            "distilled 6/4-layer students, same corpus/recipe/metrics "
            "(scripts/distill.py; harness scale h=64 L=128)"
        ),
        "gate": gate,
        "torch_12l": anchor,
        "jax_teacher_12l": jaxd["jax_teacher_12l"],
        "students": rows,
        "serving_depth": min(passing) if passing else None,
        "pass": bool(passing),
        "hp": torch12["hp"],
        "kd": {"weight": jaxd["kd_weight"], "temp": jaxd["kd_temp"],
               "hid_weight": jaxd.get("hid_weight", 0.0)},
    }
    blob = json.dumps(result, indent=2, default=float)
    print(blob)
    with open(out_path, "w") as f:
        f.write(blob + "\n")
    return result


def stage_emit_multi(workdirs: list, gate: float, out_path: str) -> dict:
    """3-seed mean±std distill artifact (the reference's seed protocol,
    run_finetune.sh:50 / statistics_of_result.py) — one workdir per seed,
    each holding torch12.json + jax_distill.json. The gate applies to the
    MEAN per-depth |ΔPk|/|ΔWD| vs the per-seed torch 12L anchors."""
    per_seed = []
    for wd in workdirs:
        with open(os.path.join(wd, "torch12.json")) as f:
            torch12 = json.load(f)
        with open(os.path.join(wd, "jax_distill.json")) as f:
            jaxd = json.load(f)
        anchor = torch12["torch"]
        students = {}
        for depth, m in jaxd["students"].items():
            students[depth] = {
                "metrics": m,
                "abs_delta_vs_torch12": {
                    k: abs(m[k] - anchor[k]) for k in ("f1", "pk", "wd")
                },
            }
        per_seed.append({
            "seed": torch12["hp"]["seed"],
            "torch_12l": anchor,
            "jax_teacher_12l": jaxd["jax_teacher_12l"],
            "students": students,
            "kd": {"weight": jaxd["kd_weight"], "temp": jaxd["kd_temp"],
                   "hid_weight": jaxd.get("hid_weight", 0.0)},
        })

    def agg(values):
        return (float(np.mean(values)), float(np.std(values)))

    keys = ("f1", "pk", "wd")
    torch_mean = {k: agg([s["torch_12l"][k] for s in per_seed]) for k in keys}
    depths = sorted(per_seed[0]["students"], key=int)
    rows = {}
    for d in depths:
        mean_delta = {
            k: agg([s["students"][d]["abs_delta_vs_torch12"][k]
                    for s in per_seed])
            for k in keys
        }
        mean_metrics = {
            k: agg([s["students"][d]["metrics"][k] for s in per_seed])
            for k in keys
        }
        rows[d] = {
            "metrics_mean_std": mean_metrics,
            "abs_delta_vs_torch12_mean_std": mean_delta,
            "within_gate": bool(mean_delta["pk"][0] <= gate
                                and mean_delta["wd"][0] <= gate),
        }
    passing = [int(d) for d, r in rows.items() if r["within_gate"]]
    result = {
        "what": (
            "3-seed quality evidence for the distilled serving trunk: per "
            "seed in {42, 59, 88}, a torch 12-layer reference oracle vs our "
            "12-layer teacher and distilled students (CE + logit KL + "
            "intermediate hidden-state MSE; scripts/distill.py, harness "
            "scale h=64 L=128, longseg corpus profile so segeval k >= 2 "
            "and WD is a real second gate); gate on the mean |dPk|/|dWD|; "
            "full-scale (h=768 L=512) evidence in PARITY_DISTILL_FULL.json"
        ),
        "gate": gate,
        "seeds": [s["seed"] for s in per_seed],
        "torch_12l_mean_std": torch_mean,
        "students_mean_std": rows,
        "per_seed": per_seed,
        "serving_depth": min(passing) if passing else None,
        "pass": bool(passing),
        # flat single-number views (means) — the schema bench.py reads
        "torch_12l": {k: torch_mean[k][0] for k in keys},
        "students": {
            dd: {
                "metrics": {k: rows[dd]["metrics_mean_std"][k][0]
                            for k in keys},
                "abs_delta_vs_torch12": {
                    k: rows[dd]["abs_delta_vs_torch12_mean_std"][k][0]
                    for k in keys
                },
                "within_gate": rows[dd]["within_gate"],
            }
            for dd in depths
        },
        "kd": per_seed[0]["kd"],
    }
    blob = json.dumps(result, indent=2, default=float)
    print(blob)
    with open(out_path, "w") as f:
        f.write(blob + "\n")
    return result


def stage_emit_full(full_workdirs: list, harness_workdirs: list, gate: float,
                    out_path: str) -> dict:
    """PARITY_DISTILL_FULL.json — quality evidence at the benched serving
    shape (hidden=768, seq=512, fullscale corpus), round-4 verdict missing
    #1. A torch 12L oracle at that width is CPU-infeasible here (~5h/seed on
    the single host core), so the artifact composes two measured pieces per
    seed (triangle inequality, both halves measured):

      full_delta   |student_full - our_teacher_full|   at h=768/L=512
      bridge_delta |our_teacher_harness - torch12|     at h=64/L=128
                   (the cross-framework seam, the only part a torch oracle
                    is needed for; measured on the same longseg protocol)

    composed = full_delta + bridge_delta upper-bounds the student-vs-torch
    delta under the assumption the framework seam does not grow with width —
    the assumption the bridge makes explicit instead of silent. The gate
    applies to the mean composed Pk AND WD. serving_* rows additionally
    evaluate the student through the W8A8 fused serving path bench.py
    measures (the round-4 advisor's quantization gap)."""
    keys = ("f1", "pk", "wd")
    per_seed = []
    for fwd, hwd in zip(full_workdirs, harness_workdirs):
        with open(os.path.join(fwd, "jax_distill.json")) as f:
            full = json.load(f)
        with open(os.path.join(hwd, "torch12.json")) as f:
            t12 = json.load(f)
        with open(os.path.join(hwd, "jax_distill.json")) as f:
            harness = json.load(f)
        teacher_full = {k: full["jax_teacher_12l"][f"win_{k}"] for k in keys}
        bridge = {
            k: abs(harness["jax_teacher_12l"][f"win_{k}"]
                   - t12["torch"][k]) for k in keys
        }
        students = {}
        for depth, m in full["students"].items():
            full_delta = {k: abs(m[k] - teacher_full[k]) for k in keys}
            row = {
                "metrics": {k: m[k] for k in keys},
                "full_delta_vs_full_teacher": full_delta,
                "composed_delta_vs_torch12": {
                    k: full_delta[k] + bridge[k] for k in keys
                },
            }
            if "serving_pk" in m:
                sd = {k: abs(m[f"serving_{k}"] - teacher_full[k])
                      for k in keys}
                row["serving_metrics"] = {k: m[f"serving_{k}"] for k in keys}
                row["serving_composed_delta_vs_torch12"] = {
                    k: sd[k] + bridge[k] for k in keys
                }
            students[depth] = row
        per_seed.append({
            "seed": full["hp"]["seed"],
            "teacher_full": teacher_full,
            "teacher_full_serving": {
                k: full["jax_teacher_12l"].get(f"win_serving_{k}")
                for k in keys
            },
            "torch12_harness": {k: t12["torch"][k] for k in keys},
            "jax_teacher_harness": {
                k: harness["jax_teacher_12l"][f"win_{k}"] for k in keys},
            "bridge_delta": bridge,
            "students": students,
            "kd": {"weight": full["kd_weight"], "temp": full["kd_temp"],
                   "hid_weight": full.get("hid_weight", 0.0)},
        })

    def agg(vals):
        return (float(np.mean(vals)), float(np.std(vals)))

    depths = sorted(per_seed[0]["students"], key=int)
    rows = {}
    for d in depths:
        comp = {k: agg([s["students"][d]["composed_delta_vs_torch12"][k]
                        for s in per_seed]) for k in keys}
        fullm = {k: agg([s["students"][d]["metrics"][k] for s in per_seed])
                 for k in keys}
        fulld = {k: agg([s["students"][d]["full_delta_vs_full_teacher"][k]
                         for s in per_seed]) for k in keys}
        row = {
            "metrics_mean_std": fullm,
            "full_delta_vs_full_teacher_mean_std": fulld,
            "composed_delta_vs_torch12_mean_std": comp,
            "within_gate": bool(comp["pk"][0] <= gate
                                and comp["wd"][0] <= gate),
        }
        if "serving_composed_delta_vs_torch12" in per_seed[0]["students"][d]:
            scomp = {
                k: agg([s["students"][d]
                        ["serving_composed_delta_vs_torch12"][k]
                        for s in per_seed]) for k in keys
            }
            row["serving_composed_delta_vs_torch12_mean_std"] = scomp
            row["serving_within_gate"] = bool(
                scomp["pk"][0] <= gate and scomp["wd"][0] <= gate)
        rows[d] = row
    passing = [int(d) for d, r in rows.items() if r["within_gate"]]
    bridge_mean = {k: agg([s["bridge_delta"][k] for s in per_seed])
                   for k in keys}
    result = {
        "what": (
            "Full-scale (hidden=768, seq=512, fullscale longseg corpus) "
            "3-seed quality evidence for the distilled serving trunks at "
            "the shape the throughput bench measures. composed delta = "
            "|student_full - our_12L_full| (measured on chip, incl. the "
            "W8A8 fused serving path) + |our_12L_harness - torch12_harness| "
            "(the cross-framework bridge at the largest CPU-feasible torch "
            "scale); gate on mean composed Pk AND WD (both de-degenerate: "
            "k >= 2)"
        ),
        "gate": gate,
        "seeds": [s["seed"] for s in per_seed],
        "bridge_delta_mean_std": bridge_mean,
        "students_mean_std": rows,
        "per_seed": per_seed,
        "serving_depth": min(passing) if passing else None,
        "pass": bool(passing),
    }
    blob = json.dumps(result, indent=2, default=float)
    print(blob)
    with open(out_path, "w") as f:
        f.write(blob + "\n")
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--stage", required=True,
                    choices=["torch12", "jax", "emit", "emit_multi",
                             "emit_full"])
    ap.add_argument("--epochs", type=float, default=None)
    ap.add_argument("--lr", type=float, default=None,
                    help="teacher learning rate (HP default 2e-3 is tuned "
                    "for the tiny trunk; full width wants ~2e-4)")
    ap.add_argument("--hidden", type=int, default=None)
    ap.add_argument("--heads", type=int, default=None)
    ap.add_argument("--intermediate", type=int, default=None)
    ap.add_argument("--max_seq_length", type=int, default=None)
    ap.add_argument("--profile", default=None, choices=list(parity_e2e.PROFILES),
                    help="corpus shape profile (HP default longseg)")
    ap.add_argument("--full", action="store_true",
                    help="shortcut: hidden=768 heads=12 intermediate=3072 "
                    "max_seq_length=512 profile=fullscale — the width/length "
                    "the throughput bench measures at (round-4 verdict "
                    "missing #1)")
    ap.add_argument("--kd_weight", type=float, default=1.0)
    ap.add_argument("--kd_temp", type=float, default=2.0)
    ap.add_argument("--student_lr", type=float, default=5e-4)
    ap.add_argument("--hid_weight", type=float, default=0.0,
                    help="TinyBERT-style intermediate hidden-state MSE weight")
    ap.add_argument("--depths", default=None,
                    help="comma-separated student depths (default 6,4)")
    ap.add_argument("--gate", type=float, default=0.2)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default="PARITY_DISTILL.json")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--workdirs", default=None,
                    help="comma-separated per-seed workdirs (emit_multi; "
                    "emit_full: the FULL-scale per-seed workdirs)")
    ap.add_argument("--harness_workdirs", default=None,
                    help="emit_full: comma-separated per-seed HARNESS-scale "
                    "workdirs holding torch12.json + jax_distill.json")
    ap.add_argument("--serving_eval", action="store_true",
                    help="stage jax: also evaluate teacher+students through "
                    "the W8A8 fused serving path (TPU only)")
    ap.add_argument("--pretrain_epochs", type=float, default=0.0,
                    help="stage jax: MLM+NSP pretrain the trunk on the "
                    "harness corpus first, then finetune the teacher from "
                    "it (the reference's pretrained-trunk regime; required "
                    "at full width — from-scratch h=768 collapses, see "
                    "_pretrain_trunk)")
    ap.add_argument("--pretrain_lr", type=float, default=1e-4)
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    hp = parity_e2e.HP()
    if args.full:
        hp = dataclasses.replace(hp, hidden=768, heads=12, intermediate=3072,
                                 max_seq_length=512,
                                 corpus_profile="fullscale",
                                 n_train_docs=96, n_dev_docs=24,
                                 n_test_docs=24)
    for field, val in (("epochs", args.epochs), ("learning_rate", args.lr),
                       ("hidden", args.hidden), ("heads", args.heads),
                       ("intermediate", args.intermediate),
                       ("max_seq_length", args.max_seq_length),
                       ("corpus_profile", args.profile)):
        if val is not None:
            hp = dataclasses.replace(hp, **{field: val})
    hp = dataclasses.replace(hp, seed=args.seed)

    if args.stage == "torch12":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        stage_torch12(args.workdir, hp)
    elif args.stage == "jax":
        if args.cpu:
            import jax

            jax.config.update("jax_platforms", "cpu")
        depths = (tuple(int(d) for d in args.depths.split(","))
                  if args.depths else STUDENT_DEPTHS)
        stage_jax(args.workdir, hp, args.kd_weight, args.kd_temp,
                  student_lr=args.student_lr, hid_weight=args.hid_weight,
                  depths=depths, serving_eval=args.serving_eval,
                  pretrain_epochs=args.pretrain_epochs,
                  pretrain_lr=args.pretrain_lr)
    elif args.stage == "emit_multi":
        assert args.workdirs, "--workdirs required for emit_multi"
        stage_emit_multi(args.workdirs.split(","), args.gate, args.out)
    elif args.stage == "emit_full":
        assert args.workdirs and args.harness_workdirs
        stage_emit_full(args.workdirs.split(","),
                        args.harness_workdirs.split(","),
                        args.gate, args.out)
    else:
        stage_emit(args.workdir, args.gate, args.out)


if __name__ == "__main__":
    main()
