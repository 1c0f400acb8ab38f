"""mAP engine tests: hand-computed AP values, native-vs-numpy matcher
equivalence, protocol semantics (ignore, area ranges, maxDets)."""

import numpy as np
import pytest

from eas_snn_tpu.evaluators.coco_map import (
    DetEval,
    IOU_THRS,
    _match_category_numpy,
    summarize,
)
from eas_snn_tpu.evaluators.cocoeval import load_native


def det_row(img, cat, x, y, w, h, score):
    return [img, cat, x, y, w, h, score]


def gt_row(img, cat, x, y, w, h, ignore=0):
    return [img, cat, x, y, w, h, ignore]


class TestAPValues:
    def test_perfect_detection(self):
        gt = np.array([gt_row(0, 0, 10, 10, 50, 40)])
        det = np.array([det_row(0, 0, 10, 10, 50, 40, 0.9)])
        res = DetEval(num_classes=1).evaluate(det, gt)
        assert res.ap == pytest.approx(1.0)
        assert res.ap50 == pytest.approx(1.0)

    def test_half_recall(self):
        # 2 gts, 1 perfect det -> precision 1 at recall .5:
        # 101-pt AP = 51/101
        gt = np.array([
            gt_row(0, 0, 10, 10, 50, 40),
            gt_row(0, 0, 100, 100, 50, 40),
        ])
        det = np.array([det_row(0, 0, 10, 10, 50, 40, 0.9)])
        res = DetEval(num_classes=1).evaluate(det, gt)
        assert res.ap == pytest.approx(51 / 101)

    def test_false_positive_penalty(self):
        # det 1 perfect (score .9), det 2 pure FP (score .95, ranked first):
        # precisions along recall: efter sort [FP, TP] -> tp=[0,1], fp=[1,1]
        # precision at recall 0.0..1.0 -> max precision at recall 1 is 1/2
        gt = np.array([gt_row(0, 0, 10, 10, 50, 40)])
        det = np.array([
            det_row(0, 0, 200, 200, 50, 40, 0.95),
            det_row(0, 0, 10, 10, 50, 40, 0.90),
        ])
        res = DetEval(num_classes=1).evaluate(det, gt)
        assert res.ap == pytest.approx(0.5)

    def test_localization_threshold(self):
        # IoU with gt = 0.5 exactly: shifted box [10,10,50,40] vs
        # [10,10,50,40] offset x by 50/3 -> compute a case at iou ~0.58:
        # matched at IoU<=0.55 thresholds only
        gt = np.array([gt_row(0, 0, 0, 0, 40, 40)])
        det = np.array([det_row(0, 0, 10, 0, 40, 40, 0.9)])
        # IoU = 30*40 / (2*1600 - 1200) = 1200/2000 = 0.6
        res = DetEval(num_classes=1).evaluate(det, gt)
        # matched for thr in {.5, .55, .6} -> 3 of 10 thresholds
        assert res.ap == pytest.approx(3 / 10)
        assert res.ap50 == pytest.approx(1.0)

    def test_ignored_gt_not_counted(self):
        gt = np.array([
            gt_row(0, 0, 10, 10, 50, 40),
            gt_row(0, 0, 100, 100, 50, 40, ignore=1),
        ])
        det = np.array([
            det_row(0, 0, 10, 10, 50, 40, 0.9),
            # det on the ignored gt: must be ignored, not counted FP
            det_row(0, 0, 100, 100, 50, 40, 0.8),
        ])
        res = DetEval(num_classes=1).evaluate(det, gt)
        assert res.ap == pytest.approx(1.0)

    def test_multi_class_mean(self):
        gt = np.array([gt_row(0, 0, 10, 10, 50, 40), gt_row(0, 1, 100, 10, 50, 40)])
        det = np.array([
            det_row(0, 0, 10, 10, 50, 40, 0.9),   # class 0 perfect
            det_row(0, 1, 300, 300, 50, 40, 0.9),  # class 1 miss
        ])
        res = DetEval(num_classes=2).evaluate(det, gt)
        assert res.ap == pytest.approx(0.5)
        assert res.per_class_ap[0] == pytest.approx(1.0)
        assert res.per_class_ap[1] == pytest.approx(0.0)

    def test_summarize_contains_tables(self):
        gt = np.array([gt_row(0, 0, 10, 10, 50, 40)])
        det = np.array([det_row(0, 0, 10, 10, 50, 40, 0.9)])
        res = DetEval(num_classes=1).evaluate(det, gt)
        text = summarize(res, class_names=("car",))
        assert "Average Precision" in text and "car" in text


class TestNativeVsNumpy:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matcher_equivalence(self, seed):
        lib = load_native()
        assert lib is not None, "native cocoeval failed to build"
        rng = np.random.default_rng(seed)
        n_img = 5
        gts, dets = [], []
        for img in range(n_img):
            for _ in range(rng.integers(0, 8)):
                x, y = rng.uniform(0, 200, 2)
                w, h = rng.uniform(5, 80, 2)
                gts.append([img, x, y, w, h, rng.integers(0, 2)])
            for _ in range(rng.integers(0, 15)):
                x, y = rng.uniform(0, 200, 2)
                w, h = rng.uniform(5, 80, 2)
                dets.append([img, x, y, w, h, rng.uniform()])
        gt = np.array(gts, np.float64).reshape(-1, 6)
        dt = np.array(dets, np.float64).reshape(-1, 6)
        g_img = gt[:, 0].astype(np.int64)
        d_img = dt[:, 0].astype(np.int64)
        gt_off = np.searchsorted(g_img, np.arange(n_img + 1))
        det_off = np.searchsorted(d_img, np.arange(n_img + 1))
        gt_boxes = np.ascontiguousarray(gt[:, 1:5])
        gt_ign = gt[:, 5].astype(np.uint8)
        det_boxes = np.ascontiguousarray(dt[:, 1:5])
        det_scores = np.ascontiguousarray(dt[:, 5])

        ref = _match_category_numpy(
            gt_off, gt_boxes, gt_ign, det_off, det_boxes, det_scores,
            IOU_THRS, 0.0, 1e10, 100,
        )
        T = len(IOU_THRS)
        D = len(dt)
        m = np.zeros(T * D, np.uint8)
        ig = np.zeros(T * D, np.uint8)
        rk = np.zeros(max(D, 1), np.int32)
        n_pos = lib.coco_match_category(
            n_img, gt_off.astype(np.int64), gt_boxes.reshape(-1), gt_ign,
            det_off.astype(np.int64), det_boxes.reshape(-1), det_scores,
            IOU_THRS, T, 0.0, 1e10, 100, m, ig, rk,
        )
        np.testing.assert_array_equal(m.reshape(T, D), ref[0])
        np.testing.assert_array_equal(ig.reshape(T, D), ref[1])
        np.testing.assert_array_equal(rk[:D], ref[2])
        assert n_pos == ref[3]
