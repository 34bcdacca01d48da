"""Tests for segmentation metrics (Pk, WinDiff, boundary P/R/F1)."""

import numpy as np

from spokennlp_tpu.eval import seg_metrics as M


def test_mass_conversion():
    assert M.mass_from_boundary_labels([1, 1, 0, 0, 1, 1]) == [1, 1, 3, 1]
    assert M.mass_from_boundary_labels([0, 0, 1]) == [3]
    assert M.mass_from_boundary_labels([0, 0, 0]) == [3]  # trailing open segment
    assert M.mass_from_boundary_labels([1]) == [1]
    assert M.mass_from_boundary_labels([]) == []


def test_pk_perfect_and_worst():
    ref = [3, 3, 3, 3]
    assert M.pk_metric(ref, ref) == 0.0
    # hypothesis with no boundaries at all
    hyp = [12]
    pk = M.pk_metric(hyp, ref, k=2)
    # windows straddling a ref boundary are errors: positions i,i+2 in
    # different ref segments but same hyp segment
    # ref seg ids: 0,0,0,1,1,1,2,2,2,3,3,3 ; for i in 0..9: pairs (i,i+2)
    # differ at i=2,3 (0 vs1),5,6,8,9 -> 6 errors / 10
    assert abs(pk - 0.6) < 1e-9


def test_windowdiff_known_value():
    ref = [2, 2, 4]
    hyp = [2, 6]
    # n=8, default k = round(8/3/2)=1
    # ref boundaries after units 2 and 4 (1-indexed): b_ref=[0,1,0,1,0,0,0]
    # hyp boundaries after unit 2: b_hyp=[0,1,0,0,0,0,0]
    # k=1: windows i..i+1 compare single boundary positions: differ at pos 3 (0-idx)
    wd = M.windowdiff_metric(hyp, ref)
    assert abs(wd - 1 / 7) < 1e-9


def test_window_metric_identical():
    preds = [[0, 1, 0, 0, 1], [1, 0, 1]]
    res = M.compute_window_metric(preds, preds)
    assert res["1-pk"] == 1.0
    assert res["1-wd"] == 1.0
    assert res["f1"] == 1.0


def test_boundary_prf():
    # label 0 = B-EOP (positive)
    preds = [[0, 1, 1], [1, 0, 1]]
    refs = [[0, 1, 0], [1, 0, 1]]
    r = M.boundary_prf(preds, refs)
    # tp=2 (pos 0 of ex0, pos 1 of ex1), fp=0, fn=1 (pos 2 of ex0)
    assert r["overall_precision"] == 1.0
    assert abs(r["overall_recall"] - 2 / 3) < 1e-9
    assert abs(r["overall_f1"] - 0.8) < 1e-9
    assert abs(r["overall_accuracy"] - 5 / 6) < 1e-9


def test_example_level_threshold_and_topk():
    # doc with 4 sentences, boundaries after 1st and 3rd (labels 0=B-EOP)
    labels = [[0, 1, 0, 1]]
    logits = [np.array([[5.0, 0.0], [0.0, 5.0], [5.0, 0.0], [0.0, 5.0]])]
    res = M.compute_example_level_metric(
        logits, labels, threshold=0.5, topk=2, f1_at_k=1
    )
    assert res["f1"] == 1.0
    assert res["threshold_0.5_example_level_1-pk"] == 1.0
    assert res["topk_2_example_level_f1"] == 1.0
    assert res["f1@1_example_level_f1"] == 1.0


def test_f1_at_k_snaps_near_miss():
    labels = [[1, 0, 1, 1]]  # true boundary at sentence 1
    # predicted boundary at sentence 2 (off by one)
    logits = [np.array([[0.0, 5.0], [0.0, 5.0], [5.0, 0.0], [0.0, 5.0]])]
    strict = M.compute_example_level_metric(logits, labels, threshold=0.5)
    soft = M.compute_example_level_metric(logits, labels, threshold=0.5, f1_at_k=1)
    assert strict["threshold_0.5_example_level_f1"] == 0.0
    assert soft["f1@1_example_level_f1"] == 1.0
