"""SLD: Smoothed Label Distillation for discrete-speech-token ASR.

TPU-native rebuild of the reference's modified run_clm trainer (reference:
sld/transformers/examples/pytorch/language-modeling/run_clm.py:74-1022):

- sequence packing ``speech_tokens + [speech_end] + text_tokens + [text_end]``
  with speech ids offset by ``gpt_vocab_size + 2`` (:510-540);
- 30% input time-masking to EOS during training (:788-791);
- composite loss = w_s * CE_speech + w_t * CE_text + w_kl * T^2 *
  KL(log_softmax(masked speech logits / T) || softmax(smoothed one-hot / T))
  — the reference's exact formulation including its mask-multiplies and eps
  additions (:787-831), so training curves are comparable;
- per-epoch beam decode -> WER/CER (models/generation.py + eval/asr_metrics).

The loss is one fused jitted function — XLA fuses the softmaxes, smoothing
and masking into the logits epilogue.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
from spokennlp_tpu.train.train_step import fast_dropout_key
import numpy as np

Array = jax.Array

IGNORE = -100


@dataclasses.dataclass(frozen=True)
class SLDConfig:
    gpt_vocab_size: int = 50257  # original text vocab
    vocab_size_speech: int = 2000
    block_size: int = 1024
    max_text_length: int = 256
    weight_ce_speech: float = 1.0
    weight_ce_text: float = 1.0
    weight_kl_speech: float = 1.0
    kl_temperature: float = 1.0
    label_smoothing_eps: float = 0.1
    time_masking: float = 0.3
    eos_token_id: int = 50256

    @property
    def speech_end_id(self) -> int:
        return self.gpt_vocab_size + 1  # added after text_end

    @property
    def text_end_id(self) -> int:
        return self.gpt_vocab_size

    @property
    def total_vocab(self) -> int:
        return self.gpt_vocab_size + 2 + self.vocab_size_speech


def pack_example(
    speech_tokens: Sequence[int],
    text_token_ids: Sequence[int],
    cfg: SLDConfig,
) -> Optional[Dict[str, np.ndarray]]:
    """Pack one (speech codes, text ids) pair into a fixed block.

    Mirrors tokenize_function (:510-540): truncate text to max_text_length,
    offset speech codes by gpt_vocab_size + 2, truncate speech to fit, pad
    with eos / -100.
    """
    if not len(speech_tokens) or not len(text_token_ids):
        return None
    text = list(text_token_ids)[: cfg.max_text_length]
    max_speech = cfg.block_size - 2 - len(text)
    speech = [int(t) + cfg.gpt_vocab_size + 2 for t in speech_tokens][:max_speech]
    seq = speech + [cfg.speech_end_id] + text + [cfg.text_end_id]
    n = len(seq)
    pad = cfg.block_size - n
    return {
        "input_ids": np.asarray(seq + [cfg.eos_token_id] * pad, np.int32),
        "attention_mask": np.asarray([1] * n + [0] * pad, np.int32),
        "labels": np.asarray(seq + [IGNORE] * pad, np.int32),
    }


def time_mask_inputs(input_ids: Array, rng: Array, cfg: SLDConfig) -> Array:
    """Randomly replace a fraction of input tokens with EOS (:788-791)."""
    if cfg.time_masking <= 0:
        return input_ids
    mask = jax.random.uniform(rng, input_ids.shape) < cfg.time_masking
    return jnp.where(mask, cfg.eos_token_id, input_ids)


def sld_loss(
    logits: Array,
    labels: Array,
    attention_mask: Array,
    cfg: SLDConfig,
):
    """The reference composite loss, exactly (:787-831).

    logits: (B, L, V_total); labels/attention_mask: (B, L).
    Returns (loss, {"ce_speech", "ce_text", "kl_speech"}).
    """
    B, L, V = logits.shape
    Vs = cfg.vocab_size_speech
    T = cfg.kl_temperature
    eps = 1e-9
    maskf = attention_mask.astype(jnp.float32)

    # ---- KL over the speech sub-vocabulary (reference quirks preserved:
    # logits multiplied by the mask then eps-shifted BEFORE the softmax)
    speech_logits = logits[:, :-1, -Vs:].astype(jnp.float32)
    speech_logits = speech_logits * maskf[:, :-1, None] + eps
    tgt = (labels[:, 1:] - cfg.gpt_vocab_size - 2) * attention_mask[:, 1:]
    tgt = jnp.maximum(tgt, 0)
    one_hot = jax.nn.one_hot(tgt, Vs)
    smoothed = one_hot * (1.0 - cfg.label_smoothing_eps) + cfg.label_smoothing_eps / Vs
    smoothed = smoothed * maskf[:, 1:, None] + eps
    log_p = jax.nn.log_softmax(speech_logits / T, axis=-1)
    q = jax.nn.softmax(smoothed / T, axis=-1)
    # torch KLDivLoss(reduction="batchmean"): sum over all elements / B
    kl = jnp.sum(q * (jnp.log(jnp.maximum(q, 1e-30)) - log_p)) / B
    loss_kl = kl * (T**2)

    # ---- CE over text / speech target subsets
    shift_logits = logits[:, :-1, :].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    text_labels = jnp.where(shift_labels >= cfg.gpt_vocab_size + 1, IGNORE, shift_labels)
    speech_labels = jnp.where(shift_labels < cfg.gpt_vocab_size + 1, IGNORE, shift_labels)

    from spokennlp_tpu.ops.losses import cross_entropy_with_ignore

    loss_ce_text = cross_entropy_with_ignore(shift_logits, text_labels)
    loss_ce_speech = cross_entropy_with_ignore(shift_logits, speech_labels)

    loss = (
        cfg.weight_ce_speech * loss_ce_speech
        + cfg.weight_ce_text * loss_ce_text
        + cfg.weight_kl_speech * loss_kl
    )
    return loss, {
        "ce_speech": loss_ce_speech,
        "ce_text": loss_ce_text,
        "kl_speech": loss_kl,
    }


def make_sld_train_step(model, cfg: SLDConfig, tx):
    """Jitted train step over GPT2LMModel with the SLD objective."""
    import optax
    from spokennlp_tpu.train.train_step import TrainState

    def loss_fn(params, batch, rng):
        ids = time_mask_inputs(batch["input_ids"], rng, cfg)
        out = model.apply(
            {"params": params},
            ids,
            attention_mask=batch["attention_mask"],
            deterministic=False,
            rngs={"dropout": jax.random.fold_in(rng, 1)},
        )
        return sld_loss(out["logits"], batch["labels"], batch["attention_mask"], cfg)

    def step(state, batch, rng):
        rng = fast_dropout_key(jax.random.fold_in(rng, state.step))
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **aux}
        return TrainState(step=state.step + 1, params=params, opt_state=opt_state), metrics

    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# decode eval: prompts end at speech_end, references are the raw text
# ---------------------------------------------------------------------------


def build_prompts(batch_input_ids: np.ndarray, cfg: SLDConfig):
    """Left-padded speech prompts (reference :657-668)."""
    prompts = []
    for row in batch_input_ids.tolist():
        p = row.index(cfg.speech_end_id) + 1 if cfg.speech_end_id in row else len(row)
        prompts.append(row[:p])
    max_len = max(len(p) for p in prompts)
    ids = np.full((len(prompts), max_len), cfg.eos_token_id, np.int32)
    mask = np.zeros((len(prompts), max_len), np.int32)
    for i, p in enumerate(prompts):
        ids[i, max_len - len(p) :] = p
        mask[i, max_len - len(p) :] = 1
    return ids, mask


class SLDTrainer:
    """End-to-end SLD training driver: epoch loop with input time-masking,
    per-epoch jitted decode -> WER/CER gating, best-checkpoint retention.

    The reference's Accelerate loop (run_clm.py:740-905) with its per-epoch
    ``model.generate`` eval (:647-739) rebuilt TPU-first: fixed-shape packed
    batches sharded over the data-parallel mesh axis, one compiled train
    step, one compiled KV-cache decode program reused across epochs.
    """

    def __init__(
        self,
        model,
        cfg: SLDConfig,
        tx,
        train_examples: Sequence[Dict[str, np.ndarray]],
        eval_examples: Sequence[Dict[str, np.ndarray]],
        eval_texts: Sequence[str],
        detokenize_fn,
        batch_size: int = 8,
        num_epochs: int = 3,
        seed: int = 0,
        decode_max_len: Optional[int] = None,
        num_beams: int = 1,
        checkpoint_dir: Optional[str] = None,
        mesh=None,
        metric_for_best: str = "wer",
        params=None,
    ):
        from spokennlp_tpu.parallel import mesh as mesh_lib
        from spokennlp_tpu.train.train_step import create_train_state

        self.model = model
        self.cfg = cfg
        self.tx = tx
        self.train_examples = list(train_examples)
        self.eval_examples = list(eval_examples)
        self.eval_texts = list(eval_texts)
        self.detokenize_fn = detokenize_fn
        self.batch_size = batch_size
        self.num_epochs = num_epochs
        self.seed = seed
        self.num_beams = num_beams
        self.decode_max_len = decode_max_len or cfg.block_size
        self.checkpoint_dir = checkpoint_dir
        self.metric_for_best = metric_for_best
        if mesh is None:
            # dp must divide the batch: use the largest device count that does
            n_dev = len(jax.devices())
            dp = next(d for d in range(min(n_dev, batch_size), 0, -1)
                      if batch_size % d == 0)
            mesh = mesh_lib.make_mesh(1, devices=jax.devices()[:dp])
        self.mesh = mesh
        self._mesh_lib = mesh_lib

        if params is None:
            L = self.train_examples[0]["input_ids"].shape[0]
            params = model.init(
                jax.random.PRNGKey(seed),
                jnp.ones((1, L), jnp.int32),
                attention_mask=jnp.ones((1, L), jnp.int32),
                deterministic=True,
            )["params"]
        params = mesh_lib.shard_params(params, self.mesh)
        self.state = create_train_state(params, tx)
        self.step_fn = make_sld_train_step(model, cfg, tx)
        self.rng = jax.random.PRNGKey(seed)

        # one fixed prompt length for the whole eval set -> one compiled
        # decode program across epochs
        self._prompt_ids, self._prompt_mask = build_prompts(
            np.stack([e["input_ids"] for e in self.eval_examples]), cfg
        )

    def _batches(self, rng: np.random.Generator):
        order = rng.permutation(len(self.train_examples))
        bs = self.batch_size
        for s in range(0, len(order), bs):
            take = order[s : s + bs].tolist()
            while len(take) < bs:  # pad tail by repetition (static shapes)
                take.append(take[len(take) - len(order[s : s + bs])])
            chunk = [self.train_examples[i] for i in take]
            yield {
                k: np.stack([c[k] for c in chunk])
                for k in ("input_ids", "attention_mask", "labels")
            }

    def decode_eval(self) -> Dict[str, float]:
        """Jitted KV-cache decode over the eval prompts -> WER/CER
        (reference: per-epoch generate + jiwer metrics, run_clm.py:647-739)."""
        from spokennlp_tpu.eval.asr_metrics import cer as cer_fn
        from spokennlp_tpu.eval.asr_metrics import wer as wer_fn
        from spokennlp_tpu.models.generation import beam_generate, greedy_generate

        n = self._prompt_ids.shape[0]
        bs = self.batch_size
        hyps: List[str] = []
        for s in range(0, n, bs):
            ids = self._prompt_ids[s : s + bs]
            mask = self._prompt_mask[s : s + bs]
            pad = bs - ids.shape[0]
            if pad:
                ids = np.concatenate([ids, np.repeat(ids[-1:], pad, 0)])
                mask = np.concatenate([mask, np.repeat(mask[-1:], pad, 0)])
            if self.num_beams > 1:
                gen = beam_generate(
                    self.model, self.state.params, jnp.asarray(ids),
                    jnp.asarray(mask), max_len=self.decode_max_len,
                    eos_id=self.cfg.text_end_id, num_beams=self.num_beams,
                )
            else:
                gen = greedy_generate(
                    self.model, self.state.params, jnp.asarray(ids),
                    jnp.asarray(mask), max_len=self.decode_max_len,
                    eos_id=self.cfg.text_end_id,
                )
            token_rows = extract_text_tokens(np.asarray(gen), self.cfg)
            hyps.extend(self.detokenize_fn(r) for r in token_rows)
        hyps = hyps[:n]
        return {
            "wer": wer_fn(hyps, self.eval_texts),
            "cer": cer_fn(hyps, self.eval_texts),
        }

    def _save(self, epoch: int, metrics: Dict[str, float]):
        if not self.checkpoint_dir:
            return
        import orbax.checkpoint as ocp

        if not hasattr(self, "_ckpt_mgr"):
            import os

            self._ckpt_mgr = ocp.CheckpointManager(
                os.path.abspath(self.checkpoint_dir),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=2,
                    best_fn=lambda m: -m.get(self.metric_for_best, float("inf")),
                    best_mode="max",  # lower WER = better
                ),
            )
        self._ckpt_mgr.save(
            epoch,
            args=ocp.args.StandardSave({"params": self.state.params}),
            metrics={k: float(v) for k, v in metrics.items()},
        )
        self._ckpt_mgr.wait_until_finished()

    def train(self) -> Dict:
        data_rng = np.random.default_rng(self.seed)
        history = []
        for epoch in range(1, self.num_epochs + 1):
            losses = []
            for batch in self._batches(data_rng):
                jb = self._mesh_lib.shard_batch(batch, self.mesh)
                self.state, metrics = self.step_fn(self.state, jb, self.rng)
                losses.append(float(metrics["loss"]))
            eval_metrics = self.decode_eval()
            row = {
                "epoch": epoch,
                "train_loss": float(np.mean(losses)),
                **eval_metrics,
            }
            history.append(row)
            self._save(epoch, eval_metrics)
        return {"history": history, "final": history[-1]}


def extract_text_tokens(generated: np.ndarray, cfg: SLDConfig) -> List[List[int]]:
    """Tokens between speech_end and text_end (reference :683-691)."""
    out = []
    for row in generated.tolist():
        if cfg.speech_end_id in row:
            start = row.index(cfg.speech_end_id) + 1
            if cfg.text_end_id in row:
                out.append(row[start : row.index(cfg.text_end_id)])
            else:
                out.append(row[start:])
        else:
            out.append([])
    return out
