"""Evaluator tests: Prophesee protocol (filters, ±50 ms matching),
COCO/PSEE evaluators end-to-end on a synthetic GEN1 dataset, energy/SOP
profiling."""

import numpy as np
import pytest

from eas_snn_tpu.data import EventDataLoader, Gen1Dataset
from eas_snn_tpu.data.psee_io import BBOX_DTYPE
from eas_snn_tpu.evaluators import (
    EventEvaluator,
    PSEEEvaluator,
    boxes_to_prophesee,
    evaluate_lists,
    filter_boxes,
    match_times,
)

from test_data import build_gen1_tree


def mk_boxes(rows):
    """rows: (t, x, y, w, h, cls, conf)"""
    arr = np.zeros(len(rows), BBOX_DTYPE)
    for i, (t, x, y, w, h, c, conf) in enumerate(rows):
        arr[i] = (t, x, y, w, h, c, 0, conf)
    return arr


class TestPropheseeProtocol:
    def test_filter_boxes(self):
        boxes = mk_boxes([
            (400_000, 0, 0, 50, 50, 0, 1.0),   # too early
            (600_000, 0, 0, 8, 50, 0, 1.0),    # side < 10
            (600_000, 0, 0, 15, 20, 0, 1.0),   # diag < 30
            (600_000, 0, 0, 30, 30, 0, 1.0),   # passes (diag ~42)
        ])
        out = filter_boxes(boxes, int(5e5), 30, 10)
        assert len(out) == 1 and out[0]["w"] == 30

    def test_match_times_vs_bruteforce(self, rng):
        gt = mk_boxes(
            sorted(
                [(int(t), 0, 0, 40, 40, 0, 1.0)
                 for t in rng.integers(0, 1_000_000, 30)],
            )
        )
        dt = mk_boxes(
            sorted(
                [(int(t), 0, 0, 40, 40, 0, 0.5)
                 for t in rng.integers(0, 1_000_000, 50)],
            )
        )
        tol = 50_000
        all_ts = np.unique(gt["t"])
        gw, dw = match_times(all_ts, gt, dt, tol)
        # brute force with the reference's monotone-high-cursor semantics
        hi_g = hi_d = 0
        for i, ts in enumerate(all_ts):
            lo_g = np.searchsorted(gt["t"], ts, "left")
            hi_g = max(hi_g, np.searchsorted(gt["t"], ts, "right"))
            lo_d = np.searchsorted(dt["t"], ts - tol, "left")
            hi_d = max(hi_d, np.searchsorted(dt["t"], ts + tol, "right"))
            np.testing.assert_array_equal(gw[i]["t"], gt["t"][lo_g:hi_g])
            np.testing.assert_array_equal(dw[i]["t"], dt["t"][min(lo_d, hi_d):hi_d])

    def test_perfect_detection_ap1(self):
        gt = mk_boxes([
            (600_000, 20, 30, 60, 40, 0, 1.0),
            (700_000, 80, 50, 50, 50, 1, 1.0),
        ])
        dt = mk_boxes([
            (598_000, 20, 30, 60, 40, 0, 0.9),  # within tolerance
            (703_000, 80, 50, 50, 50, 1, 0.8),
        ])
        out = evaluate_lists([dt], [gt], camera="gen1")
        assert out["AP"] == pytest.approx(1.0)
        assert out["AP_50"] == pytest.approx(1.0)

    def test_out_of_tolerance_miss(self):
        gt = mk_boxes([(600_000, 20, 30, 60, 40, 0, 1.0)])
        dt = mk_boxes([(700_000, 20, 30, 60, 40, 0, 0.9)])  # 100 ms late
        out = evaluate_lists([dt], [gt], camera="gen1")
        assert out["AP"] == pytest.approx(0.0)


def perfect_forward_fn(dataset, num_classes, A=64):
    """Build a forward_fn emitting one high-confidence exact box per GT
    (in letterboxed input units), padding the rest with low-conf junk."""

    def forward(frames):
        B = frames.shape[0]
        out = np.zeros((B, A, 5 + num_classes), np.float32)
        out[:, :, :4] = 1.0  # degenerate tiny boxes
        out[:, :, 4] = 1e-6
        return forward.fill(out)

    return forward


class TestEventEvaluatorEndToEnd:
    def _eval_setup(self, tmp_path, rng, map_val=True):
        root = build_gen1_tree(tmp_path, rng)
        ds = Gen1Dataset(
            root, input_size=(128, 160), training=False, map_val=True,
            aggregation="sum", num_slice=1, micro_slice=1,
            window=(-100_000, 0),
        )
        loader = EventDataLoader(
            ds, batch_size=3, shuffle=False, infinite=False, num_workers=1
        )
        return ds, loader

    def test_perfect_predictions_give_ap1(self, tmp_path, rng):
        ds, loader = self._eval_setup(tmp_path, rng)
        num_classes = 2
        scale = min(128 / 240, 160 / 304)
        # per-sample gt (raw size) for fabricating predictions
        gts = {}
        for i in range(len(ds)):
            f, g = ds.resolve_index(i)
            gts[i] = ds.raw_boxes(f, g)

        ids_seen = []

        def forward(frames):
            B = frames.shape[0]
            A = 32
            out = np.zeros((B, A, 5 + num_classes), np.float32)
            out[:, :, 2:4] = 1e-3
            out[:, :, 4] = 1e-9
            batch_ids = forward.ids.pop(0)
            for b, sid in enumerate(batch_ids):
                for j, (x1, y1, x2, y2, cls) in enumerate(gts[int(sid)]):
                    out[b, j, 0] = (x1 + x2) / 2 * scale
                    out[b, j, 1] = (y1 + y2) / 2 * scale
                    out[b, j, 2] = (x2 - x1) * scale
                    out[b, j, 3] = (y2 - y1) * scale
                    out[b, j, 4] = 0.99
                    out[b, j, 5 + int(cls)] = 0.99
            return out

        # pre-walk loader order to know ids per batch (shuffle=False)
        forward.ids = []
        for _, _, _, ids in EventDataLoader(
            ds, batch_size=3, shuffle=False, infinite=False, num_workers=1
        ):
            forward.ids.append(list(ids))

        ev = EventEvaluator(
            loader, img_size=(128, 160), confthre=0.01, nmsthre=0.65,
            num_classes=num_classes,
        )
        ap, ap50, text = ev.evaluate(forward)
        assert ap50 == pytest.approx(1.0)
        assert ap > 0.8  # quantization of box coords costs a little at .95
        assert "Average Precision" in text

    def test_psee_evaluator_runs(self, tmp_path, rng):
        ds, loader = self._eval_setup(tmp_path, rng)
        num_classes = 2

        def forward(frames):
            B = frames.shape[0]
            out = np.zeros((B, 8, 5 + num_classes), np.float32)
            out[:, :, 2:4] = 1e-3
            out[:, :, 4] = 1e-9
            # one fat confident box per image
            out[:, 0] = 0
            out[:, 0, 0], out[:, 0, 1] = 40.0, 30.0
            out[:, 0, 2], out[:, 0, 3] = 40.0, 30.0
            out[:, 0, 4], out[:, 0, 5] = 0.9, 0.9
            return out

        ev = PSEEEvaluator(
            loader, img_size=(128, 160), confthre=0.001, nmsthre=0.65,
            num_classes=num_classes, camera="gen1",
        )
        ap, ap50, text = ev.evaluate(forward)
        assert 0.0 <= ap <= 1.0
        assert "AP" in text


class TestEnergy:
    def test_sop_counting(self):
        import jax
        import jax.numpy as jnp

        from eas_snn_tpu.evaluators import count_ops, estimate_energy
        from eas_snn_tpu.models import EASYOLOX

        m = EASYOLOX(
            num_classes=2, depth=0.33, width=0.125, use_spike="backbone",
            T=2, Ts=2, embedding="count",
        )
        events = jnp.asarray(
            np.random.default_rng(0).poisson(0.1, (1, 1, 2, 64, 64, 2))
        ).astype(jnp.float32)
        variables = m.init(jax.random.PRNGKey(0), events)
        ops = count_ops(m, variables, events)
        assert len(ops) > 10
        arr = np.stack(list(ops.values()))
        assert (arr[:, 0] >= 0).all() and (arr[:, 1] > 0).all()
        assert arr[:, 2].max() == 1.0 and arr[:, 2].min() == 0.0
        e = estimate_energy(m, variables, events)
        assert e["total_energy_mJ"] > 0
        assert e["sops"] > 0


class TestVOCEval:
    def _toy(self):
        # 2 images, 1 class; 3 gts, 4 dets (1 dup on same gt, 1 miss)
        gt = np.array([
            [0, 0, 10, 10, 50, 50, 0],
            [0, 0, 60, 60, 90, 90, 0],
            [1, 0, 20, 20, 40, 40, 0],
        ], np.float64)
        det = np.array([
            [0, 0, 11, 11, 49, 49, 0.9],   # tp
            [0, 0, 12, 10, 50, 52, 0.8],   # dup -> fp
            [1, 0, 21, 19, 41, 40, 0.7],   # tp
            [1, 0, 200, 200, 220, 220, 0.6],  # fp
        ], np.float64)
        return det, gt

    def test_matches_reference_formula(self):
        """Bit-parity vs the reference's voc_eval on the same toy case."""
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from refutil import install_ref_stubs

        install_ref_stubs()
        from yolox.evaluators.voc_eval import voc_ap as ref_voc_ap

        from eas_snn_tpu.evaluators import VOCDetEval, voc_ap

        det, gt = self._toy()
        for use07 in (False, True):
            mAP, per_class = VOCDetEval(1, use_07_metric=use07).evaluate(det, gt)
            # expected: tp=[1,0,1,0] in confidence order -> rec/prec curve
            rec = np.array([1 / 3, 1 / 3, 2 / 3, 2 / 3])
            prec = np.array([1.0, 0.5, 2 / 3, 0.5])
            expect = ref_voc_ap(rec, prec, use07)
            assert mAP == pytest.approx(expect, abs=1e-9)
            assert voc_ap(rec, prec, use07) == pytest.approx(expect, abs=1e-12)

    def test_difficult_excluded(self):
        from eas_snn_tpu.evaluators import VOCDetEval

        det, gt = self._toy()
        gt[1, 6] = 1  # second gt difficult
        mAP, _ = VOCDetEval(1).evaluate(det, gt)
        # npos becomes 2; both tps hit non-difficult boxes -> recall 1.0 tail
        assert 0.5 < mAP <= 1.0
