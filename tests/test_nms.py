"""Rotated NMS tests vs a numpy greedy oracle built on the cv2 IoU oracle."""
import math

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from r3det_tpu.ops.nms import (
    rnms, batched_rnms, ml_nms_rotated, obb_batched_nms, poly_nms,
    multiclass_nms_rotated)

PI = math.pi
RNG = np.random.RandomState(11)


def cv2_iou(b1, b2):
    r1 = ((float(b1[0]), float(b1[1])), (float(b1[2]), float(b1[3])),
          float(np.degrees(b1[4])))
    r2 = ((float(b2[0]), float(b2[1])), (float(b2[2]), float(b2[3])),
          float(np.degrees(b2[4])))
    ret, pts = cv2.rotatedRectangleIntersection(r1, r2)
    inter = 0.0
    if pts is not None and len(pts) >= 3:
        inter = cv2.contourArea(cv2.convexHull(pts))
    return inter / max(b1[2] * b1[3] + b2[2] * b2[3] - inter, 1e-14)


def greedy_nms_oracle(boxes, scores, thr, labels=None):
    """Plain-python greedy NMS: returns kept original indices, score order."""
    order = np.argsort(-scores, kind='stable')
    kept = []
    for i in order:
        ok = True
        for j in kept:
            if labels is not None and labels[i] != labels[j]:
                continue
            if cv2_iou(boxes[j], boxes[i]) > thr:
                ok = False
                break
        if ok:
            kept.append(i)
    return kept


def rand_boxes(n, scale=100.0):
    cx = RNG.uniform(0, scale, n)
    cy = RNG.uniform(0, scale, n)
    w = RNG.uniform(10, 50, n)
    h = RNG.uniform(10, 50, n)
    a = RNG.uniform(-PI, PI, n)
    return np.stack([cx, cy, w, h, a], -1).astype(np.float32)


def test_rnms_matches_greedy_oracle():
    boxes = rand_boxes(40)
    scores = RNG.uniform(0.1, 1.0, 40).astype(np.float32)
    dets = np.concatenate([boxes, scores[:, None]], -1)
    keep_idx, n = rnms(jnp.asarray(dets), 0.3, max_out=40)
    got = [int(i) for i in np.asarray(keep_idx) if i >= 0]
    want = greedy_nms_oracle(boxes, scores, 0.3)
    assert int(n) == len(want)
    assert got == want


def test_rnms_pair_keeps_higher_score():
    boxes = np.array([[50., 50., 30., 20., 0.2],
                      [51., 50., 30., 20., 0.2]], np.float32)
    dets = np.concatenate([boxes, [[0.4], [0.9]]], -1).astype(np.float32)
    keep_idx, n = rnms(jnp.asarray(dets), 0.5, max_out=2)
    assert int(n) == 1 and int(keep_idx[0]) == 1


def test_label_aware_keeps_cross_class_overlap():
    boxes = np.array([[50., 50., 30., 20., 0.2],
                      [51., 50., 30., 20., 0.2]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    labels = np.array([0, 1], np.int32)
    (dets, out_labels), n = ml_nms_rotated(jnp.asarray(boxes),
                                           jnp.asarray(scores),
                                           jnp.asarray(labels), 0.3,
                                           max_out=4)
    assert int(n) == 2
    assert set(np.asarray(out_labels[:2]).tolist()) == {0, 1}


def test_batched_rnms_offset_equals_label_gating():
    boxes = rand_boxes(30)
    scores = RNG.uniform(0.1, 1.0, 30).astype(np.float32)
    labels = RNG.randint(0, 3, 30).astype(np.int32)
    (d1, l1), n1 = batched_rnms(jnp.asarray(boxes), jnp.asarray(scores),
                                jnp.asarray(labels), 0.25, max_out=30)
    (d2, l2), n2 = ml_nms_rotated(jnp.asarray(boxes), jnp.asarray(scores),
                                  jnp.asarray(labels), 0.25, max_out=30)
    assert int(n1) == int(n2)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)
    want = greedy_nms_oracle(boxes, scores, 0.25, labels)
    assert int(n1) == len(want)


def test_obb_batched_nms_skips_tiny():
    boxes = np.array([[50., 50., 30., 20., 0.2],
                      [50., 50., 1e-4, 20., 0.2]], np.float32)
    scores = np.array([0.5, 0.99], np.float32)
    labels = np.zeros(2, np.int32)
    (dets, out_labels), n = obb_batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels), 0.3,
        max_out=2)
    assert int(n) == 1
    assert dets[0, 5] == pytest.approx(0.5)   # big box survives


def test_poly_nms_suppresses_duplicates():
    sq = np.array([0., 0., 20., 0., 20., 20., 0., 20.])
    shifted = sq + np.array([1., 0.] * 4)
    polys = np.stack([np.concatenate([sq, [0.9]]),
                      np.concatenate([shifted, [0.5]]),
                      np.concatenate([sq + 100, [0.8]])]).astype(np.float32)
    keep_idx, n = poly_nms(jnp.asarray(polys), 0.3, max_out=3)
    kept = [int(i) for i in np.asarray(keep_idx) if i >= 0]
    assert int(n) == 2 and kept == [0, 2]


@pytest.mark.parametrize('version', ['v1', 'v2', 'v3', 'mmcv'])
def test_multiclass_nms_basic(version):
    n, c = 50, 4
    boxes = rand_boxes(n)
    scores = RNG.uniform(0, 0.6, (n, c + 1)).astype(np.float32)
    dets, labels, num = multiclass_nms_rotated(
        jnp.asarray(boxes), jnp.asarray(scores), score_thr=0.05,
        iou_thr=0.3, version=version, max_num=20, pre_topk=64)
    num = int(num)
    assert 0 < num <= 20
    d = np.asarray(dets)
    lab = np.asarray(labels)
    # valid rows have positive score and label in range; pad rows zeroed
    assert np.all(d[:num, 5] > 0.05)
    assert np.all((lab[:num] >= 0) & (lab[:num] < c))
    assert np.all(d[num:, 5] == 0)
    assert np.all(lab[num:] == -1)
    # scores descending
    assert np.all(np.diff(d[:num, 5]) <= 1e-6)


def test_multiclass_nms_score_thr_filters_all():
    boxes = rand_boxes(10)
    scores = np.full((10, 5), 0.01, np.float32)
    dets, labels, num = multiclass_nms_rotated(
        jnp.asarray(boxes), jnp.asarray(scores), score_thr=0.5,
        iou_thr=0.3, version='v2', max_num=8, pre_topk=16)
    assert int(num) == 0
    assert np.all(np.asarray(dets) == 0)


def test_multiclass_nms_label_awareness_differs_from_blind():
    """Same box, two strong classes: label-aware keeps both."""
    boxes = np.tile(np.array([[50., 50., 30., 20., 0.3]], np.float32), (1, 1))
    scores = np.zeros((1, 3), np.float32)
    scores[0, 0] = 0.9
    scores[0, 1] = 0.8
    dets, labels, num = multiclass_nms_rotated(
        jnp.asarray(boxes), jnp.asarray(scores), score_thr=0.05,
        iou_thr=0.3, version='v2', max_num=4, pre_topk=8)
    assert int(num) == 2


def test_multiclass_nms_dense_scene_full_budget_matches_oracle():
    """Dense case: every (position, class) candidate above score_thr.

    With nms_candidates >= the above-thr candidate count, the result
    must equal the reference semantics exactly — suppress ALL pairs
    above score_thr, truncate to max_num after NMS
    (bbox_nms_rotated.py:98-131). Candidate budget smaller than the
    live count (round-1's global pre-truncation) is the deviation this
    guards against.
    """
    n, c = 150, 3
    boxes = rand_boxes(n, scale=300.0)
    scores = RNG.uniform(0.2, 1.0, (n, c + 1)).astype(np.float32)
    # oracle over the flattened (position, class) pairs
    flat_boxes = np.repeat(boxes, c, axis=0)
    flat_scores = scores[:, :c].reshape(-1)
    flat_labels = np.tile(np.arange(c), n)
    want = greedy_nms_oracle(flat_boxes, flat_scores, 0.3, flat_labels)
    want_scores = np.sort(flat_scores[want])[::-1][:40]

    dets, labels, num = multiclass_nms_rotated(
        jnp.asarray(boxes), jnp.asarray(scores), score_thr=0.05,
        iou_thr=0.3, version='v1', max_num=40, pre_topk=n * c)
    num = int(num)
    assert num == min(len(want), 40)
    np.testing.assert_allclose(np.asarray(dets)[:num, 5], want_scores[:num],
                               atol=1e-6)


def test_blocked_sweep_equals_fixpoint():
    """_greedy_keep_blocked must match _greedy_keep on random matrices."""
    from r3det_tpu.ops.nms import _greedy_keep, _greedy_keep_blocked
    for trial, (k, thr) in enumerate([(50, 0.3), (300, 0.1), (513, 0.5)]):
        iou = RNG.uniform(0, 1, (k, k)).astype(np.float32)
        iou = np.triu(iou, 1) * (RNG.uniform(0, 1, (k, k)) < 0.1)
        valid = RNG.uniform(0, 1, k) < 0.8
        a = np.asarray(_greedy_keep(jnp.asarray(iou), jnp.asarray(valid),
                                    thr))
        b = np.asarray(_greedy_keep_blocked(jnp.asarray(iou),
                                            jnp.asarray(valid), thr,
                                            block=64))
        np.testing.assert_array_equal(a, b, err_msg=f'trial {trial}')


def test_dense_scene_candidate_budget():
    """The shipped default budget (4 * nms_pre) must reproduce the
    reference's all-pairs semantics on a dense scene where the live
    candidate count exceeds nms_pre — and the old nms_pre-sized budget
    must demonstrably truncate there (the round-2 parity risk this
    default closes). detector_predict wires nms_candidates=None to
    2 * nms_pre (models/detectors.py::detector_predict)."""
    n, c = 150, 5                       # 750 live pairs, all above thr
    nms_pre = 400                       # stand-in for the shipped 2000
    boxes = rand_boxes(n, scale=600.0)
    scores = RNG.uniform(0.2, 1.0, (n, c + 1)).astype(np.float32)

    def run(budget):
        dets, labels, num = multiclass_nms_rotated(
            jnp.asarray(boxes), jnp.asarray(scores), score_thr=0.05,
            iou_thr=0.3, version='v1', max_num=n * c, pre_topk=budget)
        num = int(num)
        return np.asarray(dets)[:num], np.asarray(labels)[:num], num

    full_d, full_l, full_n = run(n * c)           # exact reference
    ship_d, ship_l, ship_n = run(2 * nms_pre)     # shipped default
    old_d, old_l, old_n = run(nms_pre)            # round-2 default

    assert ship_n == full_n
    np.testing.assert_allclose(ship_d, full_d, atol=1e-6)
    np.testing.assert_array_equal(ship_l, full_l)
    assert old_n < full_n, (
        f'expected the nms_pre-sized budget to truncate on a dense '
        f'scene (kept {old_n} vs {full_n})')


def test_streamed_sweep_equals_dense():
    """_greedy_keep_streamed (the >2048-candidate memory-safe path) must
    produce the dense path's exact keep set, including label gating,
    holes in the valid prefix, and the valid-count row cutoff."""
    from r3det_tpu.ops.nms import (_greedy_keep_blocked,
                                   _greedy_keep_streamed)
    from r3det_tpu.ops.rotated_iou import rotated_iou_pairwise
    r = np.random.RandomState(44)
    k = 2600                              # above STREAM_THRESHOLD
    boxes = np.stack([
        r.uniform(0, 800, k), r.uniform(0, 800, k),
        r.uniform(10, 80, k), r.uniform(8, 60, k),
        r.uniform(-np.pi / 2, 0, k)], -1).astype(np.float32)
    scores = np.sort(r.uniform(0, 1, k).astype(np.float32))[::-1]
    labels = r.randint(0, 4, k).astype(np.int32)
    valid = np.ones(k, bool)
    valid[2000:] = False                  # dead tail (below score_thr)
    valid[150] = False                    # hole (v3 tiny-box skip)
    vcount = 2001
    bj = jnp.asarray(boxes)
    vj = jnp.asarray(valid)
    lj = jnp.asarray(labels)
    iou = rotated_iou_pairwise(bj, bj, backend='jnp')
    iou = jnp.where(lj[:, None] == lj[None, :], iou, 0.0)
    want = np.asarray(_greedy_keep_blocked(iou, vj, 0.2))
    got = np.asarray(_greedy_keep_streamed(
        bj, vj, lj, 0.2, jnp.int32(vcount), label_aware=True))
    np.testing.assert_array_equal(got, want)
