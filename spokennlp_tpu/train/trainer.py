"""Training loop for topic segmentation: epochs, eval gating, checkpoints.

One trainer replaces the reference's per-project HF Trainer / Accelerate /
ModelScope / TF-Estimator plumbing (reference layer map, SURVEY.md §1):

- eval cadence mirrors the reference's eval_steps computation
  (ts_sentence_seq_labeling.py:959-969: total_steps // eval_cnt, min 40).
- best-checkpoint retention by a chosen metric replaces
  --load_best_model_at_end --metric_for_best_model overall_f1
  (run_finetune.sh:82-84) via an Orbax CheckpointManager.
- metrics stream to a JSONL file + stdout (reference: trainer.log_metrics /
  save_metrics JSON files, :1103-1105).
- resume: restore the latest checkpoint (params, opt state, step) — the HF
  get_last_checkpoint equivalent (:117-129).
"""

from __future__ import annotations

import functools
import json
import logging
import os
import time
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from spokennlp_tpu.configs import (
    TopicSegConfig,
    TrainConfig,
    WindowingConfig,
)
from spokennlp_tpu.data.featurization import batches_from_docs, featurize_paired
from spokennlp_tpu.eval import seg_metrics
from spokennlp_tpu.parallel import dist as dist_lib
from spokennlp_tpu.parallel import mesh as mesh_lib
from spokennlp_tpu.train import optim
from spokennlp_tpu.train.train_step import (
    TrainState,
    create_train_state,
    make_topic_seg_train_step,
)

logger = logging.getLogger("spokennlp_tpu.trainer")


class MetricLogger:
    """JSONL metric stream (one line per event) + stdout + optional
    TensorBoard events (the reference's report_to tensorboard,
    run_finetune.sh / sld run.sh:255)."""

    def __init__(self, path: Optional[str], tensorboard_dir: Optional[str] = None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None
        self._tb = None
        if tensorboard_dir:
            from flax.metrics import tensorboard as _tb

            os.makedirs(tensorboard_dir, exist_ok=True)
            self._tb = _tb.SummaryWriter(tensorboard_dir)

    def log(self, event: Dict):
        event = {**event, "time": time.time()}
        line = json.dumps(event, default=float)
        logger.info(line)
        if self._f:
            self._f.write(line + "\n")
            self._f.flush()
        if self._tb is not None:
            step = int(event.get("step", 0))
            tag = event.get("event", "metrics")
            for k, v in event.items():
                if k in ("event", "step", "time", "epoch"):
                    continue
                if isinstance(v, (int, float)):
                    self._tb.scalar(f"{tag}/{k}", float(v), step)
            self._tb.flush()

    def close(self):
        if self._f:
            self._f.close()
        if self._tb is not None:
            self._tb.close()


class TopicSegTrainer:
    def __init__(
        self,
        model,
        task_cfg: TopicSegConfig,
        train_cfg: TrainConfig,
        windowing_cfg: WindowingConfig,
        train_docs: Sequence[Dict],
        eval_docs: Optional[Sequence[Dict]] = None,
        params=None,
        metric_for_best: str = "f1",
        log_path: Optional[str] = None,
        mesh=None,
    ):
        self.model = model
        self.task_cfg = task_cfg
        self.train_cfg = train_cfg
        self.wcfg = windowing_cfg
        self.train_docs = list(train_docs)
        self.eval_docs = list(eval_docs) if eval_docs else None
        self.metric_for_best = metric_for_best
        self.metrics_log = MetricLogger(log_path, train_cfg.tensorboard_dir)

        # SPMD mesh over all devices: data-parallel batch sharding (the
        # reference's DDP default, run_finetune.sh:61) with an optional
        # tensor-parallel axis; params/batches placed via parallel/mesh rules.
        if mesh is None:
            mesh = mesh_lib.make_mesh(train_cfg.model_parallel_size)
        self.mesh = mesh
        self.dp_size = mesh.shape[mesh_lib.DATA_AXIS]
        self.batch_size = train_cfg.per_device_batch_size * self.dp_size
        n_windows = len(
            featurize_paired(
                self.train_docs,
                self.wcfg,
                np.random.default_rng(train_cfg.seed),
                task_cfg.tssp_ablation,
                num_proc=train_cfg.preprocessing_num_workers,
            )
        )
        steps_per_epoch = max(n_windows // self.batch_size, 1)
        self.total_steps = int(
            steps_per_epoch
            * train_cfg.num_train_epochs
            // train_cfg.gradient_accumulation_steps
        )
        # reference cadence: eval_steps = total // eval_cnt, min 40 (:960-969)
        self.eval_steps = max(self.total_steps // max(train_cfg.eval_cnt, 1), 40)

        self.tx = optim.make_optimizer(train_cfg, max(self.total_steps, 1))
        if params is None:
            params = self._init_params()
        params = mesh_lib.shard_params(params, self.mesh)
        self.state = create_train_state(params, self.tx)
        self.step_fn = make_topic_seg_train_step(model, task_cfg, self.tx)
        self.rng = jax.random.PRNGKey(train_cfg.seed)

        self._ckpt_mgr = None
        if train_cfg.checkpoint_dir:
            import orbax.checkpoint as ocp

            self._ckpt_mgr = ocp.CheckpointManager(
                os.path.abspath(train_cfg.checkpoint_dir),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=train_cfg.save_total_limit,
                    best_fn=lambda m: m.get(self.metric_for_best, float("-inf")),
                    best_mode="max",
                ),
            )

    def _init_params(self):
        L = self.wcfg.max_seq_length
        B = 2
        return self.model.init(
            jax.random.PRNGKey(self.train_cfg.seed),
            jnp.ones((B, L), jnp.int32),
            attention_mask=jnp.ones((B, L), jnp.int32),
            token_type_ids=jnp.zeros((B, L), jnp.int32),
            sent_positions=jnp.zeros((B, 8), jnp.int32),
            deterministic=True,
        )["params"]

    # ------------------------------------------------------------------ train

    def train(self) -> Dict:
        cfg = self.train_cfg
        accum = max(cfg.gradient_accumulation_steps, 1)
        data_rng = np.random.default_rng(cfg.seed)
        step = int(self.state.step)  # micro-batch counter
        best = float("-inf")
        history = []
        t_start = time.time()
        epoch = 0
        while step < self.total_steps * accum:
            epoch += 1
            # drop_last=False: short final batches are padded by repetition so
            # tiny corpora still progress (and shapes stay static for jit).
            for batch in batches_from_docs(
                self.train_docs,
                self.wcfg,
                self.task_cfg,
                self.batch_size,
                data_rng,
                drop_last=False,
                num_proc=cfg.preprocessing_num_workers,
            ):
                jb = mesh_lib.shard_batch(batch, self.mesh)
                self.state, metrics = self.step_fn(self.state, jb, self.rng)
                step += 1
                # log/eval cadences count OPTIMIZER steps (the reference's
                # eval_steps is in optimizer steps; with accumulation > 1 the
                # micro-batch counter would fire accum times too often).
                at_opt_boundary = step % accum == 0
                opt_step = step // accum
                if at_opt_boundary and opt_step % cfg.log_every == 0:
                    scalars = {k: float(v) for k, v in metrics.items()}
                    self.metrics_log.log(
                        {"event": "train", "step": opt_step, "epoch": epoch, **scalars}
                    )
                if (
                    self.eval_docs
                    and at_opt_boundary
                    and opt_step % self.eval_steps == 0
                ):
                    eval_metrics = self.evaluate()
                    self.metrics_log.log(
                        {"event": "eval", "step": opt_step, **eval_metrics}
                    )
                    history.append((opt_step, eval_metrics))
                    score = eval_metrics.get(self.metric_for_best, 0.0)
                    if score > best:
                        best = score
                    self._save(opt_step, eval_metrics)
                if step >= self.total_steps * accum:
                    break
        final = {
            "train_steps": step,
            "train_time_s": time.time() - t_start,
            "best_" + self.metric_for_best: best,
        }
        if self.eval_docs:
            final_eval = self.evaluate()
            final.update({f"final_{k}": v for k, v in final_eval.items()})
            self._save(step // accum, final_eval)
        self.metrics_log.log({"event": "train_end", **final})
        return final

    # ------------------------------------------------------------------- eval

    def evaluate(self, docs: Optional[Sequence[Dict]] = None) -> Dict:
        """Window-level eval (the reference's compute_metrics, :1018-1074)."""
        from spokennlp_tpu.eval.inference import predict_windows_scanned
        from spokennlp_tpu.data.windowing import stack_windows, window_document

        docs = docs if docs is not None else self.eval_docs
        if docs is None:
            # --do_eval without a validation split (e.g. wiki50/wiki_elements
            # ship test-only); mirror the "no windows" no-op instead of dying
            logger.warning("evaluate() called with no eval docs; skipping")
            return {}
        windows = []
        for eid, doc in enumerate(docs):
            windows.extend(
                window_document(doc["sent_token_ids"], doc["labels"], self.wcfg, eid)
            )
        if not windows:
            return {}
        batch = stack_windows(windows)
        preds, refs = [], []
        if self.task_cfg.ts_score_predictor == "cos":
            # cos mode: the linear head carries no ts gradient — window
            # predictions come from sigmoid(adjacent-eop cosine) > 0.5
            # (reference eval path, ts_sentence_seq_labeling.py:1042-1048)
            from spokennlp_tpu.eval.inference import make_cos_predict_fn

            # compiled once and cached: params are a jit argument, so each
            # evaluate() during training reuses the executable (and sharded
            # params keep their shardings rather than being baked in)
            if getattr(self, "_cos_predict_fn", None) is None:
                self._cos_predict_fn = make_cos_predict_fn(
                    self.model, self.task_cfg.ts_score_predictor_cos_temp
                )
            predict = functools.partial(self._cos_predict_fn, self.state.params)
            N = batch["input_ids"].shape[0]
            B = self.batch_size
            sims = np.zeros(batch["sent_positions"].shape, np.float32)
            for s in range(0, N, B):
                e = min(s + B, N)
                pad = B - (e - s)
                parts = []
                for key in ("input_ids", "attention_mask", "token_type_ids",
                            "sent_positions", "eop_mask", "labels"):
                    a = batch[key][s:e]
                    if pad:
                        a = np.concatenate([a, np.repeat(a[-1:], pad, 0)])
                    parts.append(jnp.asarray(a))
                sims[s:e] = np.asarray(predict(*parts))[: e - s]
            for i in range(len(windows)):
                m = batch["eop_mask"][i].astype(bool)
                if m.any():
                    preds.append([1 if v > 0.5 else 0 for v in sims[i][m]])
                    refs.append(
                        batch["sent_labels"][i][m].astype(int).tolist())
        else:
            # gather_sents: logits fetched only at sentence positions (same
            # transfer cut as the inference engine; labels at those slots are
            # batch["sent_labels"])
            logits = predict_windows_scanned(
                self.model, self.state.params, batch, self.batch_size,
                mesh=self.mesh, gather_sents=True,
            )
            for i in range(len(windows)):
                live = batch["sent_labels"][i] != -100
                if live.any():
                    preds.append(np.argmax(logits[i][live], -1).tolist())
                    refs.append(batch["sent_labels"][i][live].tolist())
        # multi-host: gather every process's windows before scoring (the
        # reference's accelerator.gather_for_metrics; no-op single-host)
        preds = dist_lib.allgather_ragged(preds)
        refs = dist_lib.allgather_ragged(refs)
        prf = seg_metrics.boundary_prf(preds, refs)
        # Pk/WinDiff alongside F1, as the reference's compute_metrics reports
        # every eval (seqeval.py:125-237) — best-checkpoint gating can use
        # metric_for_best="1-pk"/"1-wd" as well as "f1". Label id 0 = B-EOP.
        wm = seg_metrics.compute_window_metric(
            [[1 if v == 0 else 0 for v in p] for p in preds],
            [[1 if v == 0 else 0 for v in r] for r in refs],
        )
        return {
            "precision": prf["overall_precision"],
            "recall": prf["overall_recall"],
            "f1": prf["overall_f1"],
            "accuracy": prf["overall_accuracy"],
            "1-pk": wm["1-pk"],
            "1-wd": wm["1-wd"],
            "pk": wm["pk"],
            "wd": wm["wd"],
        }

    # ------------------------------------------------------------ checkpoints

    def _save(self, step: int, eval_metrics: Dict):
        if self._ckpt_mgr is None:
            return
        import orbax.checkpoint as ocp

        self._ckpt_mgr.save(
            step,
            args=ocp.args.StandardSave(
                {"params": self.state.params, "opt_state": self.state.opt_state,
                 "step": self.state.step}
            ),
            metrics={k: float(v) for k, v in eval_metrics.items()},
        )
        self._ckpt_mgr.wait_until_finished()

    def restore_latest(self, checkpoint_dir: Optional[str] = None) -> bool:
        """Resume from the newest checkpoint; returns True if restored.

        ``checkpoint_dir`` overrides the trainer's own checkpoint root (the
        --resume_from_checkpoint path; HF semantics at
        ts_sentence_seq_labeling.py:1089-1093)."""
        import orbax.checkpoint as ocp

        mgr = self._ckpt_mgr
        if checkpoint_dir:
            mgr = ocp.CheckpointManager(os.path.abspath(checkpoint_dir))
        if mgr is None or mgr.latest_step() is None:
            return False

        target = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        restored = mgr.restore(
            mgr.latest_step(), args=ocp.args.StandardRestore(target)
        )
        self.state = TrainState(
            step=restored["step"],
            params=restored["params"],
            opt_state=restored["opt_state"],
        )
        return True

    def restore_best(self) -> bool:
        if self._ckpt_mgr is None or self._ckpt_mgr.best_step() is None:
            return False
        import orbax.checkpoint as ocp

        target = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        restored = self._ckpt_mgr.restore(
            self._ckpt_mgr.best_step(), args=ocp.args.StandardRestore(target)
        )
        self.state = TrainState(
            step=restored["step"],
            params=restored["params"],
            opt_state=restored["opt_state"],
        )
        return True
