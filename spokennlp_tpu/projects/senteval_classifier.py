"""SentEval-protocol classifier (torch-free JAX port of the published MLP).

Faithful to ditto's vendored SentEval classifier (reference:
ditto/SentEval/senteval/tools/classifier.py):

  model      nhid=0 -> Linear(in, ncls) (logistic regression);
             nhid>0 -> Linear -> Dropout -> **Sigmoid** -> Linear
  loss       summed cross entropy (loss_fn.size_average = False)
  optimizer  adam lr 1e-3 with COUPLED L2 (torch's Adam weight_decay adds
             l2 * w to the gradient before the moment updates)
  fit        epochs of ``epoch_size`` full passes; early stopping when dev
             accuracy fails to improve ``tenacity`` times; best dev model
             restored (classifier.py:61-85)
  reg grid   l2 in {1e-5, 1e-4, 1e-3, 1e-2} (tools/validation.py:61)

The published Ditto transfer protocol (reference: ditto/evaluation_ditto.py:
82-84) is nhid=0, adam, batch 64, tenacity 5, epoch_size 4, kfold 10 —
the defaults here.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

REG_GRID = (1e-5, 1e-4, 1e-3, 1e-2)  # validation.py:61 (usepytorch branch)


@dataclasses.dataclass
class MLPParams:
    nhid: int = 0  # 0 = logistic regression (the Ditto protocol)
    optim_lr: float = 1e-3  # torch adam default
    tenacity: int = 5
    epoch_size: int = 4
    max_epoch: int = 200
    dropout: float = 0.0
    batch_size: int = 64


class SentEvalMLP:
    """scikit-style fit/score over frozen embeddings (one (l2, seed) run)."""

    def __init__(self, inputdim: int, nclasses: int, l2reg: float = 0.0,
                 cfg: Optional[MLPParams] = None, seed: int = 1111):
        self.cfg = cfg or MLPParams()
        self.inputdim = inputdim
        self.nclasses = nclasses
        self.l2reg = l2reg
        self.seed = seed
        self.params = None

    # ------------------------------------------------------------- internals
    def _init_params(self, rng: np.random.Generator):
        c = self.cfg

        def linear(din, dout):
            # torch nn.Linear init: U(-1/sqrt(din), 1/sqrt(din))
            bound = 1.0 / np.sqrt(din)
            return {
                "w": rng.uniform(-bound, bound, size=(din, dout)).astype(np.float32),
                "b": rng.uniform(-bound, bound, size=(dout,)).astype(np.float32),
            }

        if c.nhid == 0:
            return {"out": linear(self.inputdim, self.nclasses)}
        return {
            "hid": linear(self.inputdim, c.nhid),
            "out": linear(c.nhid, self.nclasses),
        }

    def _build(self):
        import jax
        import jax.numpy as jnp
        import optax

        c = self.cfg

        def logits_fn(params, X, drop_key=None):
            if c.nhid == 0:
                return X @ params["out"]["w"] + params["out"]["b"]
            h = X @ params["hid"]["w"] + params["hid"]["b"]
            if drop_key is not None and c.dropout > 0:
                keep = jax.random.bernoulli(drop_key, 1 - c.dropout, h.shape)
                h = jnp.where(keep, h / (1 - c.dropout), 0.0)
            h = jax.nn.sigmoid(h)  # classifier.py:193 (Sigmoid, not ReLU)
            return h @ params["out"]["w"] + params["out"]["b"]

        def loss_fn(params, X, y, drop_key):
            lg = logits_fn(params, X, drop_key)
            logp = jax.nn.log_softmax(lg, -1)
            # summed CE: classifier.py:200 size_average = False
            return -jnp.take_along_axis(logp, y[:, None], axis=1).sum()

        # coupled L2 like torch Adam(weight_decay=l2): grad += l2 * w
        tx = optax.chain(
            optax.add_decayed_weights(self.l2reg),
            optax.adam(c.optim_lr),
        )

        @jax.jit
        def train_batch(params, opt_state, X, y, drop_key):
            grads = jax.grad(loss_fn)(params, X, y, drop_key)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        @jax.jit
        def predict(params, X):
            return jnp.argmax(logits_fn(params, X), -1)

        return tx, train_batch, predict

    # ------------------------------------------------------------------- api
    def fit(self, X, y, validation_data: Tuple[np.ndarray, np.ndarray]):
        import jax

        c = self.cfg
        rng = np.random.default_rng(self.seed)
        params = self._init_params(rng)
        tx, train_batch, predict = self._build()
        opt_state = tx.init(params)
        devX, devy = validation_data

        best_acc, best_params = -1.0, params
        early = 0
        key = jax.random.PRNGKey(self.seed)
        n = len(X)
        epoch = 0
        while epoch <= c.max_epoch:
            for _ in range(c.epoch_size):
                perm = rng.permutation(n)
                for i in range(0, n, c.batch_size):
                    idx = perm[i : i + c.batch_size]
                    key, sub = jax.random.split(key)
                    params, opt_state = train_batch(
                        params, opt_state, X[idx], y[idx], sub
                    )
            epoch += c.epoch_size
            acc = float((np.asarray(predict(params, devX)) == devy).mean())
            if acc > best_acc:
                best_acc, best_params = acc, jax.tree.map(np.asarray, params)
                early = 0
            else:
                if early >= c.tenacity:
                    break
                early += 1
        self.params = best_params
        self._predict = predict
        return best_acc

    def score(self, X, y) -> float:
        return float((np.asarray(self._predict(self.params, X)) == y).mean())


def fit_with_reg_grid(
    Xtr, ytr, Xval, yval, nclasses: int, cfg: Optional[MLPParams] = None,
    reg_grid: Sequence[float] = REG_GRID, seed: int = 1111,
) -> Tuple[SentEvalMLP, float, float]:
    """Pick l2 on (Xval, yval), keep the best fitted model.

    SplitClassifier semantics (validation.py): the model trained during the
    grid IS the final model (train split only; no retrain on train+dev).
    Returns (fitted_clf, best_reg, best_dev_acc)."""
    best = (None, reg_grid[0], -1.0)
    for reg in reg_grid:
        clf = SentEvalMLP(Xtr.shape[1], nclasses, l2reg=reg, cfg=cfg, seed=seed)
        acc = clf.fit(Xtr, ytr, validation_data=(Xval, yval))
        if acc > best[2]:
            best = (clf, reg, acc)
    return best
