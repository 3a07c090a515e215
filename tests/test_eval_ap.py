"""AP interpolation parity vs the reference's mmdet `average_precision`.

The reference's eval_map computes 'area'-mode AP for every dataset except
voc07 (/root/reference/r3det/datasets/dota1.py:419-420); our evaluator
must default to the same interpolation or every headline mAP is
incomparable to the published 70.41 target. mmdet is not installed in
this image, so `_mmdet_average_precision` below is a faithful stub of
mmdet/core/evaluation/mean_ap.py::average_precision (same hstack /
envelope / changepoint-sum algorithm, both modes).
"""
import inspect

import numpy as np
import pytest

from r3det_tpu.datasets.dota import (DOTADataset, _average_precision,
                                     eval_rbbox_map)


def _mmdet_average_precision(recalls, precisions, mode='area'):
    """Stub of mmdet's average_precision (mean_ap.py), single-scale."""
    recalls = recalls[np.newaxis, :]
    precisions = precisions[np.newaxis, :]
    num_scales = recalls.shape[0]
    ap = np.zeros(num_scales, dtype=np.float32)
    if mode == 'area':
        zeros = np.zeros((num_scales, 1), dtype=recalls.dtype)
        ones = np.ones((num_scales, 1), dtype=recalls.dtype)
        mrec = np.hstack((zeros, recalls, ones))
        mpre = np.hstack((zeros, precisions, zeros))
        for i in range(mpre.shape[1] - 1, 0, -1):
            mpre[:, i - 1] = np.maximum(mpre[:, i - 1], mpre[:, i])
        for i in range(num_scales):
            ind = np.where(mrec[i, 1:] != mrec[i, :-1])[0]
            ap[i] = np.sum(
                (mrec[i, ind + 1] - mrec[i, ind]) * mpre[i, ind + 1])
    elif mode == '11points':
        for i in range(num_scales):
            for thr in np.arange(0, 1 + 1e-3, 0.1):
                precs = precisions[i, recalls[i, :] >= thr]
                prec = precs.max() if precs.size > 0 else 0
                ap[i] += prec
            ap /= 11
    return float(ap[0])


def _random_pr_curve(rng, n):
    """A plausible PR curve: recall nondecreasing, precision anything."""
    recall = np.sort(rng.uniform(0, 1, n))
    # repeated recall values happen whenever a det is a FP; np.resize
    # tiles to exactly rep.sum() so the assignment is shape-safe for any
    # draw (ADVICE r4: np.repeat(...)[:k] under-fills when
    # rep.sum() > 2 * (~rep).sum())
    rep = rng.random(n) < 0.3
    if (~rep).any() and rep.any():
        recall[rep] = np.resize(recall[~rep], rep.sum())
    recall = np.sort(recall)
    precision = rng.uniform(0, 1, n)
    return recall.astype(np.float64), precision.astype(np.float64)


@pytest.mark.parametrize('mode', ['area', '11points'])
def test_average_precision_matches_mmdet(mode):
    rng = np.random.RandomState(0)
    for trial in range(50):
        n = rng.randint(1, 40)
        recall, precision = _random_pr_curve(rng, n)
        ref = _mmdet_average_precision(recall, precision, mode)
        got = _average_precision(recall, precision,
                                 use_07_metric=(mode == '11points'))
        assert got == pytest.approx(ref, abs=1e-6), (trial, mode)


def test_area_mode_is_the_default():
    """The headline evaluator must default to reference AP semantics."""
    assert inspect.signature(eval_rbbox_map).parameters[
        'use_07_metric'].default is False
    assert inspect.signature(DOTADataset.evaluate).parameters[
        'use_07_metric'].default is False


def test_modes_differ_on_coarse_curve():
    """Sanity: the two interpolations genuinely disagree (guards against
    a stub that silently computes the same thing twice)."""
    recall = np.array([0.25, 0.5])
    precision = np.array([1.0, 0.4])
    area = _average_precision(recall, precision, use_07_metric=False)
    p11 = _average_precision(recall, precision, use_07_metric=True)
    assert abs(area - p11) > 0.01
