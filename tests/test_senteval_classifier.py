"""SentEval pytorch-classifier protocol port (projects/senteval_classifier).

Covers: torch-semantics equivalence of one adam step (coupled L2, summed
CE), learnability + early stopping, nhid>0 sigmoid-MLP path, and the
transfer harness dispatch (classifier="mlp").
"""

import numpy as np
import pytest

from spokennlp_tpu.projects.senteval_classifier import (
    MLPParams,
    SentEvalMLP,
    fit_with_reg_grid,
)


def _blobs(rng, n, d=8, ncls=3, centers=None):
    y = rng.integers(0, ncls, size=n)
    if centers is None:
        centers = rng.normal(0, 3.0, size=(ncls, d))
    X = centers[y] + rng.normal(0, 1.0, size=(n, d))
    return X.astype(np.float32), y.astype(np.int64), centers


def test_one_adam_step_matches_torch_semantics():
    """One batch step of the JAX port == torch nn.Linear + Adam(weight_decay)
    with summed CE (the vendored classifier's exact configuration)."""
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(0)
    X, y, _ = _blobs(rng, 32, d=6, ncls=3)
    l2 = 1e-3

    clf = SentEvalMLP(6, 3, l2reg=l2, cfg=MLPParams(), seed=1)
    params = clf._init_params(np.random.default_rng(1))
    tx, train_batch, predict = clf._build()
    opt_state = tx.init(params)

    lin = torch.nn.Linear(6, 3)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(params["out"]["w"].T.copy()))
        lin.bias.copy_(torch.from_numpy(params["out"]["b"].copy()))
    opt = torch.optim.Adam(lin.parameters(), lr=1e-3, weight_decay=l2)
    loss_fn = torch.nn.CrossEntropyLoss(reduction="sum")

    import jax

    for it in range(3):
        params, opt_state = train_batch(
            params, opt_state, X, y, jax.random.PRNGKey(it)
        )
        loss = loss_fn(lin(torch.from_numpy(X)), torch.from_numpy(y))
        opt.zero_grad()
        loss.backward()
        opt.step()

    np.testing.assert_allclose(
        np.asarray(params["out"]["w"]), lin.weight.detach().numpy().T,
        atol=1e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(params["out"]["b"]), lin.bias.detach().numpy(),
        atol=1e-5, rtol=1e-4,
    )


@pytest.mark.parametrize("nhid", [0, 16])
def test_fit_learns_separable_blobs(nhid):
    rng = np.random.default_rng(2)
    Xtr, ytr, centers = _blobs(rng, 400)
    Xdev, ydev, _ = _blobs(rng, 100, centers=centers)
    Xte, yte, _ = _blobs(rng, 100, centers=centers)
    cfg = MLPParams(nhid=nhid, max_epoch=40)
    clf = SentEvalMLP(8, 3, l2reg=1e-4, cfg=cfg, seed=3)
    dev_acc = clf.fit(Xtr, ytr, validation_data=(Xdev, ydev))
    assert dev_acc > 0.85
    assert clf.score(Xte, yte) > 0.85


def test_reg_grid_returns_fitted_best():
    rng = np.random.default_rng(4)
    Xtr, ytr, centers = _blobs(rng, 300)
    Xdev, ydev, _ = _blobs(rng, 80, centers=centers)
    clf, reg, acc = fit_with_reg_grid(
        Xtr, ytr, Xdev, ydev, 3, cfg=MLPParams(max_epoch=60)
    )
    assert reg in (1e-5, 1e-4, 1e-3, 1e-2)
    assert acc > 0.8
    assert clf.score(Xdev, ydev) == pytest.approx(acc)


def test_transfer_harness_mlp_dispatch():
    """evaluate_transfer_classification(classifier='mlp') end-to-end on a
    tiny synthetic split task with a degenerate embedding."""
    from spokennlp_tpu.projects.ditto import evaluate_transfer_classification

    rng = np.random.default_rng(5)

    def tokenize(batch):
        # "embedding" = bag of char codes, padded
        ids = np.zeros((len(batch), 4), np.int32)
        for i, s in enumerate(batch):
            for j, ch in enumerate(s[:4]):
                ids[i, j] = ord(ch)
        return ids, np.ones_like(ids)

    def embed(ids, mask):
        # center/scale so logits start unsaturated (real sentence
        # embeddings are ~unit scale)
        return (ids.astype(np.float32) - 105.0) / 10.0

    def mk_split(n):
        sents, labels = [], []
        for _ in range(n):
            lab = int(rng.integers(0, 2))
            sents.append(("aaaa" if lab else "zzzz") + "x")
            labels.append(lab)
        return sents, labels

    tasks = {"TOY": {"train": mk_split(120), "dev": mk_split(40),
                     "test": mk_split(40)}}
    res = evaluate_transfer_classification(
        embed, tokenize, tasks, batch_size=16,
        classifier="mlp",
    )
    assert res["TOY"]["acc"] > 95.0
    assert "best_reg" in res["TOY"]
