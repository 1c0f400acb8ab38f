"""End-to-end *pipeline* parity against the reference's own dataset code.

The round-1 parity harness proved module-level equality (embeddings, ANN
backbone+head). This file closes the remaining gap: it writes synthetic GEN1
`.dat` + `_bbox.npy` fixtures, instantiates the REFERENCE's ``GEN1Dataset``
(reference: yolox/data/datasets/gen1.py:43-528) and ours on the same bytes,
and requires

  (a) identical ``generate_slices`` frame tensors + labels sample-by-sample
      for the 'sum' and 'micro_sum' aggregations,
  (b) identical val/letterbox ``__getitem__`` output (frames + padded
      labels + sample ids),
  (c) equal eval-path detections + AP with translated weights: reference
      frames -> reference torch model vs our frames -> our model, the same
      NMS + mAP machinery applied to both.

Known, asserted-bounded divergence: the reference letterboxes GT boxes in an
int64 array (gen1.py:437 ``box = np.array(bboxes, dtype=np.int64)``), so its
scaled val GT coords are floor-truncated; ours stay float. Box coords are
therefore compared with atol=1px when scale != 1 and exactly when scale == 1.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from refutil import install_ref_stubs, patch_ref_numpy_compat  # noqa: E402

H_RAW, W_RAW = 240, 304
TL, TM = 2, 3
WINDOW = (-200000, 0)


@pytest.fixture(scope="module", autouse=True)
def ref_env():
    install_ref_stubs()
    patch_ref_numpy_compat()
    yield


def _make_stream(rng, path_base, n_events, t_max, label_times_boxes):
    """Write `<base>_td.dat` + `<base>_bbox.npy`."""
    from eas_snn_tpu.data.psee_io import write_bboxes_npy, write_dat_events

    t = np.sort(rng.integers(0, t_max, size=n_events)).astype(np.uint32)
    x = rng.integers(0, W_RAW, size=n_events)
    y = rng.integers(0, H_RAW, size=n_events)
    p = rng.integers(0, 2, size=n_events)
    write_dat_events(path_base + "_td.dat", t, x, y, p, H_RAW, W_RAW)
    rows = []
    for lt, boxes in label_times_boxes:
        for (bx, by, bw, bh, cls) in boxes:
            rows.append((lt, bx, by, bw, bh, cls, 0, 1.0))
    write_bboxes_npy(path_base + "_bbox.npy", rows)


@pytest.fixture(scope="module")
def gen1_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("gen1_fixture")
    rng = np.random.default_rng(42)
    _make_stream(
        rng, str(root / "seq_a"), 60000, 1_200_000,
        [
            (300_000, [(40, 50, 60, 40, 0), (120, 90, 30, 70, 1)]),
            (500_000, [(10, 10, 90, 90, 0)]),
            (1_100_000, [(200, 120, 50, 50, 1), (5, 200, 40, 30, 0),
                         (260, 10, 40, 40, 0)]),
        ],
    )
    # seq_b's first label sits before the window span -> exercises the
    # zero-event backoff path on the earliest slice
    _make_stream(
        rng, str(root / "seq_b"), 25000, 800_000,
        [
            (150_000, [(60, 60, 80, 50, 1)]),
            (700_000, [(100, 100, 60, 60, 0), (30, 150, 70, 40, 1)]),
        ],
    )
    # a corrupted sequence from the skip list: both sides must drop it
    _make_stream(
        rng,
        str(root / "17-04-06_09-57-37_6344500000_6404500000"),
        1000, 100_000, [(50_000, [(10, 10, 50, 50, 0)])],
    )
    return str(root)


def _ref_dataset(gen1_dir, aggregation, map_val=False, input_size=(240, 304)):
    from yolox.data.datasets.gen1 import GEN1Dataset
    from yolox.data.event_data_augment import (
        TrainTransform as RefTrain,
        ValTransform as RefVal,
    )

    return GEN1Dataset(
        data_path=gen1_dir,
        input_size=input_size,
        random_aug=False,
        img_size=(H_RAW, W_RAW),
        continuous=True,
        slice_policy="fix_t",
        letterbox_image=True,
        map_val=map_val,
        format="cxcywh",
        target_transform=RefVal() if map_val else RefTrain(max_labels=50),
        aggregation=aggregation,
        overlap=0,
        num_slice=TL,
        micro_slice=TM,
        measure="count",
        window=WINDOW,
    )


def _our_dataset(gen1_dir, aggregation, map_val=False, input_size=(240, 304)):
    from eas_snn_tpu.data.gen1 import Gen1Dataset

    return Gen1Dataset(
        data_dir=gen1_dir,
        input_size=input_size,
        training=False,
        map_val=map_val,
        aggregation=aggregation,
        num_slice=TL,
        micro_slice=TM,
        window=WINDOW,
        letterbox_val=True,
    )


def _ref_frames_to_ours(frames):
    """reference channel-first (..., 2, H, W) -> channel-last."""
    return np.moveaxis(np.asarray(frames), -3, -1)


def _sorted_rows(a):
    a = np.asarray(a, np.float64).reshape(-1, a.shape[-1])
    return a[np.lexsort(a.T[::-1])]


class TestIndexParity:
    def test_same_samples(self, gen1_dir):
        ref = _ref_dataset(gen1_dir, "sum")
        ours = _our_dataset(gen1_dir, "sum")
        assert len(ref) == len(ours) == 5
        assert set(ref.sample_names) == set(ours.sample_names)
        # skip-list sequence dropped on both sides
        assert not any("17-04-06" in n for n in ours.sample_names)

    def test_label_groups_match(self, gen1_dir):
        ref = _ref_dataset(gen1_dir, "sum")
        ours = _our_dataset(gen1_dir, "sum")
        for i in range(len(ours)):
            name = ours.sample_names[i]
            j = ref.sample_names.index(name)
            rf, rt = ref.resolve_index(j)
            of, og = ours.resolve_index(i)
            lab = ref.labels[rf][rt]
            ref_xyxy = np.stack(
                [lab["x"], lab["y"], lab["x"] + lab["w"],
                 lab["y"] + lab["h"], lab["class_id"]], axis=-1,
            ).astype(np.float32)
            np.testing.assert_array_equal(
                _sorted_rows(ref_xyxy), _sorted_rows(ours.raw_boxes(of, og))
            )


class TestFrameParity:
    @pytest.mark.parametrize("aggregation", ["sum", "micro_sum"])
    def test_generate_slices_identical(self, gen1_dir, aggregation):
        ref = _ref_dataset(gen1_dir, aggregation)
        ours = _our_dataset(gen1_dir, aggregation)
        for i in range(len(ours)):
            name = ours.sample_names[i]
            j = ref.sample_names.index(name)
            rf, rt = ref.resolve_index(j)
            of, og = ours.resolve_index(i)
            ref_frames = ref.generate_slices(rf, rt, TL, True)
            our_frames = ours.generate_slices(of, og)
            np.testing.assert_array_equal(
                _ref_frames_to_ours(ref_frames),
                np.asarray(our_frames, np.float64),
                err_msg=f"sample {name} ({aggregation})",
            )


class TestGetitemParity:
    def test_val_letterbox_scale1(self, gen1_dir):
        """input_size == img_size: scale == 1 -> bit-exact frames + labels."""
        ref = _ref_dataset(gen1_dir, "micro_sum", input_size=(240, 304))
        ours = _our_dataset(gen1_dir, "micro_sum", input_size=(240, 304))
        for i in range(len(ours)):
            name = ours.sample_names[i]
            j = ref.sample_names.index(name)
            np.random.seed(0)  # the reference shuffles GT rows (gen1.py:460)
            rf_frames, rf_labels, rf_size, rf_sid = ref[j]
            of_frames, of_labels, of_size, of_sid = ours[i]
            assert tuple(rf_size) == tuple(of_size) == (H_RAW, W_RAW)
            assert ref.sample_names[rf_sid] == ours.sample_names[of_sid]
            np.testing.assert_array_equal(
                _ref_frames_to_ours(rf_frames),
                np.asarray(of_frames, np.float64),
            )
            np.testing.assert_array_equal(
                _sorted_rows(rf_labels), _sorted_rows(of_labels)
            )

    def test_val_letterbox_resized(self, gen1_dir):
        """input 256x320 (scale 1.0526): frames match to float tolerance,
        boxes to the reference's documented 1px int truncation."""
        ref = _ref_dataset(gen1_dir, "sum", input_size=(256, 320))
        ours = _our_dataset(gen1_dir, "sum", input_size=(256, 320))
        for i in range(len(ours)):
            name = ours.sample_names[i]
            j = ref.sample_names.index(name)
            np.random.seed(0)
            rf_frames, rf_labels, _, _ = ref[j]
            of_frames, of_labels, _, _ = ours[i]
            np.testing.assert_allclose(
                _ref_frames_to_ours(rf_frames),
                np.asarray(of_frames, np.float64),
                rtol=1e-5, atol=1e-4,
            )
            r = _sorted_rows(rf_labels)
            o = _sorted_rows(of_labels)
            assert r.shape == o.shape
            assert np.abs(r - o).max() <= 1.0 + 1e-6

    def test_map_val_raw_boxes(self, gen1_dir):
        """map_val mode: GT must come back at raw sensor resolution,
        bit-equal between the two pipelines (gen1.py:191-197)."""
        ref = _ref_dataset(gen1_dir, "sum", map_val=True, input_size=(256, 320))
        ours = _our_dataset(gen1_dir, "sum", map_val=True, input_size=(256, 320))
        for i in range(len(ours)):
            name = ours.sample_names[i]
            j = ref.sample_names.index(name)
            np.random.seed(0)
            rf_frames, rf_boxes, _, _ = ref[j]
            of_frames, of_boxes, _, _ = ours[i]
            np.testing.assert_allclose(
                _ref_frames_to_ours(rf_frames),
                np.asarray(of_frames, np.float64),
                rtol=1e-5, atol=1e-4,
            )
            np.testing.assert_allclose(
                _sorted_rows(rf_boxes), _sorted_rows(of_boxes),
                rtol=1e-5, atol=1e-5,
            )


class TestEvalPathParity:
    def test_detections_and_ap_match(self, gen1_dir):
        """Full eval path: each pipeline's frames through its own model
        (translated weights), the same NMS + mAP engine on both outputs.
        Proves dataset + model + decode parity end to end; the COCO engine
        itself is bit-tested separately (test_coco_map.py)."""
        import jax
        import jax.numpy as jnp
        from flax import linen as nn

        from yolox.models.yolo_head import YOLOXHead as RefHead
        from yolox.models.yolo_pafpn import YOLOPAFPN as RefPAFPN

        from eas_snn_tpu.evaluators.coco_map import DetEval
        from eas_snn_tpu.models import YOLOPAFPN, YOLOXHead
        from eas_snn_tpu.ops.boxes import nms_numpy
        from eas_snn_tpu.utils.torch_import import translate_torch_checkpoint

        depth, width, num_classes = 0.33, 0.25, 2
        torch.manual_seed(7)
        ref_back = RefPAFPN(depth, width, in_dim=2).eval()
        ref_head = RefHead(num_classes, width).eval()

        class Det(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                f = YOLOPAFPN(depth=depth, width=width, name="backbone")(
                    x, train
                )
                return YOLOXHead(
                    num_classes=num_classes, width=width, name="head"
                )(f, train)

        ours_model = Det()

        # 256x320 letterbox val datasets, 'sum' aggregation (Tl frames only)
        ref_ds = _ref_dataset(gen1_dir, "sum", map_val=True,
                              input_size=(256, 320))
        our_ds = _our_dataset(gen1_dir, "sum", map_val=True,
                              input_size=(256, 320))

        sd = {}
        for k, v in ref_back.state_dict().items():
            sd["backbone." + k] = v.detach().numpy()
        for k, v in ref_head.state_dict().items():
            sd["head." + k] = v.detach().numpy()

        def run_sample(i):
            name = our_ds.sample_names[i]
            j = ref_ds.sample_names.index(name)
            np.random.seed(0)
            rf_frames, rf_boxes, _, _ = ref_ds[j]
            of_frames, of_boxes, _, _ = our_ds[i]

            # reference model on reference frames: frames (Tl, 2, H, W);
            # ANN YOLOX consumes a single frame -> sum over Tl like the
            # count embedding would with Ts=1
            ref_in = torch.from_numpy(
                np.asarray(rf_frames, np.float32).sum(0, keepdims=True)
            )
            with torch.no_grad():
                ref_out = ref_head(
                    list(ref_back(ref_in))
                ).numpy()[0]  # (A, 5+C) decoded

            our_in = jnp.asarray(
                np.asarray(of_frames, np.float32).sum(0)[None]
            )
            our_out = np.asarray(
                ours_model.apply(run_sample.variables, our_in).outputs
            )[0]
            return ref_out, our_out, rf_boxes, of_boxes

        # translate weights once
        xl_init = jnp.zeros((1, 256, 320, 2), jnp.float32)
        variables = ours_model.init(jax.random.PRNGKey(0), xl_init)
        variables2, report = translate_torch_checkpoint(sd, variables)
        assert report["unmapped"] == 0, report
        run_sample.variables = variables2

        def decode_dets(raw, conf_thr=0.3):
            # raw: (A, 5+C) cxcywh + obj + cls
            boxes = raw[:, :4]
            obj = raw[:, 4]
            cls_prob = raw[:, 5:]
            cls_id = cls_prob.argmax(-1)
            score = obj * cls_prob.max(-1)
            keep = score > conf_thr
            if not keep.any():
                return np.zeros((0, 6), np.float32)
            b = boxes[keep]
            xyxy = np.stack(
                [b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
                 b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2], -1,
            )
            s, c = score[keep], cls_id[keep]
            # class-offset trick = per-class NMS
            sel = nms_numpy(xyxy + c[:, None] * 4096.0, s, 0.65)
            return np.concatenate(
                [xyxy[sel], s[sel, None], c[sel, None]], -1
            ).astype(np.float32)

        ref_all, our_all, gt_all = [], [], []
        for i in range(len(our_ds)):
            ref_out, our_out, rf_boxes, of_boxes = run_sample(i)
            np.testing.assert_allclose(
                our_out, ref_out, rtol=5e-3, atol=5e-3
            )
            rd, od = decode_dets(ref_out), decode_dets(our_out)
            assert rd.shape == od.shape
            if len(rd):
                np.testing.assert_allclose(rd, od, rtol=1e-2, atol=5e-2)
            ref_all.append(rd)
            our_all.append(od)
            # raw cxcywh -> xyxy GT rows (cls, x1, y1, x2, y2)
            np.testing.assert_allclose(
                _sorted_rows(rf_boxes), _sorted_rows(of_boxes),
                rtol=1e-5, atol=1e-5,
            )
            g = np.asarray(of_boxes, np.float32)
            gxyxy = np.stack(
                [g[:, 0] - g[:, 2] / 2, g[:, 1] - g[:, 3] / 2,
                 g[:, 0] + g[:, 2] / 2, g[:, 1] + g[:, 3] / 2], -1,
            )
            gt_all.append((gxyxy, g[:, 4].astype(np.int64)))

        def compute_ap(dets_per_img):
            det_rows, gt_rows = [], []
            for img_id, (dets, (gx, gc)) in enumerate(
                zip(dets_per_img, gt_all)
            ):
                for b, c in zip(gx, gc):
                    gt_rows.append(
                        [img_id, c, b[0], b[1], b[2] - b[0], b[3] - b[1]]
                    )
                for d in dets:
                    det_rows.append(
                        [img_id, d[5], d[0], d[1], d[2] - d[0],
                         d[3] - d[1], d[4]]
                    )
            res = DetEval(num_classes=num_classes).evaluate(
                np.asarray(det_rows, np.float64).reshape(-1, 7),
                np.asarray(gt_rows, np.float64).reshape(-1, 6),
            )
            return res.ap

        ap_ref = compute_ap(ref_all)
        ap_ours = compute_ap(our_all)
        assert abs(ap_ref - ap_ours) < 1e-4, (ap_ref, ap_ours)


# ---------------------------------------------------------------------------
# GEN4 raw (1Mpx): same harness against the reference's GEN4Dataset
# ---------------------------------------------------------------------------

H4, W4 = 720, 1280


@pytest.fixture(scope="module")
def gen4_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("gen4_fixture")
    rng = np.random.default_rng(7)
    from eas_snn_tpu.data.psee_io import write_bboxes_npy, write_dat_events

    n = 80000
    t = np.sort(rng.integers(0, 1_000_000, size=n)).astype(np.uint32)
    write_dat_events(
        str(root / "m1_td.dat"), t, rng.integers(0, W4, n),
        rng.integers(0, H4, n), rng.integers(0, 2, n), H4, W4,
    )
    rows = [
        # kept: classes 0-2, sane sizes
        (300_000, 100, 120, 80, 60, 0, 0, 1.0),
        (300_000, 400, 300, 60, 90, 2, 1, 1.0),
        # filtered out: class 4 (bus), too small, spans the frame, off-FOV
        (300_000, 50, 50, 40, 40, 4, 2, 1.0),
        (300_000, 10, 10, 3, 3, 0, 3, 1.0),
        (300_000, 0, 200, 1230, 100, 1, 4, 1.0),
        (700_000, -40, 500, 40, 60, 1, 5, 1.0),  # crop-to-FOV edge case
        (700_000, 900, 600, 70, 50, 1, 6, 1.0),
    ]
    write_bboxes_npy(str(root / "m1_bbox.npy"), rows)
    return str(root)


class TestGen4PipelineParity:
    def _ref(self, gen4_dir):
        from yolox.data.datasets.gen4 import GEN4Dataset
        from yolox.data.event_data_augment import TrainTransform as RefTrain

        return GEN4Dataset(
            data_path=gen4_dir, input_size=(H4, W4), random_aug=False,
            img_size=(H4, W4), continuous=True, slice_policy="fix_t",
            letterbox_image=True, map_val=False, format="cxcywh",
            target_transform=RefTrain(max_labels=50),
            aggregation="sum", overlap=0, num_slice=TL, micro_slice=TM,
            measure="count", window=WINDOW, prestore=False,
        )

    def _ours(self, gen4_dir):
        from eas_snn_tpu.data.gen4 import Gen4Dataset

        return Gen4Dataset(
            gen4_dir, input_size=(H4, W4), training=False,
            aggregation="sum", num_slice=TL, micro_slice=TM,
            window=WINDOW, letterbox_val=True,
        )

    def test_label_filter_chain_matches(self, gen4_dir):
        """The raw GEN4 reader applies the filter chain at index time
        (reference gen4.py:399): class subset + crop-to-FOV + min-side-5 +
        huge-box. Same surviving boxes, same grouping — EXCEPT the
        reference's first label group: gen4.py:407-409 seeds
        ``labels_per_stamp`` with row 0 and then iterates from idx 0,
        DUPLICATING the first filtered label of every sequence (the GEN1
        reader-based loop doesn't; defect not replicated)."""
        ref = self._ref(gen4_dir)
        ours = self._ours(gen4_dir)
        assert len(ref) == len(ours)
        assert set(ref.sample_names) == set(ours.sample_names)
        for i in range(len(ours)):
            j = ref.sample_names.index(ours.sample_names[i])
            rf, rt = ref.resolve_index(j)
            of, og = ours.resolve_index(i)
            lab = ref.labels[rf][rt]
            ref_xyxy = np.stack(
                [lab["x"], lab["y"], lab["x"] + lab["w"],
                 lab["y"] + lab["h"], lab["class_id"]], axis=-1,
            ).astype(np.float32)
            r = _sorted_rows(ref_xyxy)
            if rt == 0:
                # the duplicate seed is the first row in file order —
                # drop it and assert it really was a duplicate
                assert (ref_xyxy[0] == ref_xyxy[1]).all(), (
                    "expected the reference's first-row duplicate"
                )
                r = _sorted_rows(ref_xyxy[1:])
            np.testing.assert_allclose(
                r, _sorted_rows(ours.raw_boxes(of, og)),
                rtol=1e-5, atol=1e-5,
            )

    def test_generate_slices_identical(self, gen4_dir):
        ref = self._ref(gen4_dir)
        ours = self._ours(gen4_dir)
        for i in range(len(ours)):
            j = ref.sample_names.index(ours.sample_names[i])
            rf, rt = ref.resolve_index(j)
            of, og = ours.resolve_index(i)
            ref_frames = ref.generate_slices(rf, rt, TL, True)
            np.testing.assert_array_equal(
                _ref_frames_to_ours(ref_frames),
                np.asarray(ours.generate_slices(of, og), np.float64),
            )


# ---------------------------------------------------------------------------
# N-Caltech101: same harness against the reference's NCaltech
# ---------------------------------------------------------------------------

HN, WN = 180, 240


@pytest.fixture(scope="module")
def ncaltech_dir(tmp_path_factory):
    import struct as st

    from eas_snn_tpu.data.ncaltech import encode_atis

    root = tmp_path_factory.mktemp("ncal_fixture")
    rng = np.random.default_rng(11)
    pairs = []
    for cls in ("ant", "bee"):
        ddir = root / "Caltech101" / cls
        adir = root / "Caltech101_annotations" / cls
        ddir.mkdir(parents=True)
        adir.mkdir(parents=True)
        for i in range(2):
            n = 4000
            t = np.sort(rng.integers(0, 1 << 21, n))
            ev = encode_atis(
                t, rng.integers(0, WN, n), rng.integers(0, HN, n),
                rng.integers(0, 2, n),
            )
            dpath = ddir / f"image_{i:04d}.bin"
            dpath.write_bytes(ev)
            box = np.array(
                [[40 + i, 160, 160, 40 + i], [30, 130 + i, 130 + i, 30]],
                np.int16,
            )  # row 0: x coords, row 1: y coords
            apath = adir / f"annotation_{i:04d}.bin"
            with open(apath, "wb") as f:
                f.write(st.pack("h", 2))
                f.write(st.pack("h", 4))
                f.write(np.asfortranarray(box).tobytes(order="F"))
                f.write(st.pack("h", 2))
                f.write(st.pack("h", 4))
                f.write(np.asfortranarray(box).tobytes(order="F"))
            pairs.append(f"{dpath} {apath}")
    # deterministic split shared by BOTH readers (each skips generation
    # when train.txt exists)
    (root / "train.txt").write_text("\n".join(pairs) + "\n")
    (root / "val.txt").write_text("")
    (root / "test.txt").write_text("")
    return str(root)


class TestNCaltechPipelineParity:
    def _ref(self, root, aggregation):
        from yolox.data.datasets.ncaltech import NCaltech
        from yolox.data.event_data_augment import TrainTransform as RefTrain

        return NCaltech(
            root_path=root, input_size=(HN, WN), type="train",
            img_size=(HN, WN), map_val=False, letterbox_image=True,
            random_aug=False, speed_random_aug=False, format="cxcywh",
            target_transform=RefTrain(max_labels=50), window=None,
            aggregation=aggregation, overlap=0, num_slice=2,
            micro_slice=3, measure="count",
        )

    def _ours(self, root, aggregation):
        from eas_snn_tpu.data.ncaltech import NCaltechDataset

        return NCaltechDataset(
            root, input_size=(HN, WN), split="train", training=False,
            aggregation=aggregation, num_slice=2, micro_slice=3,
            measure="count", letterbox_val=True,
        )

    @pytest.mark.parametrize("aggregation", ["sum", "micro_sum"])
    def test_getitem_identical(self, ncaltech_dir, aggregation):
        ref = self._ref(ncaltech_dir, aggregation)
        ours = self._ours(ncaltech_dir, aggregation)
        assert len(ref) == len(ours) == 4
        assert set(ref.sample_names) == set(ours.sample_names)
        for i in range(len(ours)):
            j = ref.sample_names.index(ours.sample_names[i])
            np.random.seed(0)  # ref shuffles GT rows in letterbox path
            rf_frames, rf_labels, rf_size, rf_sid = ref[j]
            of_frames, of_labels, of_size, of_sid = ours[i]
            assert tuple(rf_size) == tuple(of_size) == (HN, WN)
            assert ref.sample_names[rf_sid] == ours.sample_names[of_sid]
            np.testing.assert_array_equal(
                _ref_frames_to_ours(rf_frames),
                np.asarray(of_frames, np.float64),
                err_msg=f"{ours.sample_names[i]} ({aggregation})",
            )
            np.testing.assert_array_equal(
                _sorted_rows(rf_labels), _sorted_rows(of_labels)
            )


# ---------------------------------------------------------------------------
# RVT-preprocessed GEN4: the reference's own RVTGEN4Dataset h5 reader next to
# ours on shared synthetic fixtures (reference: yolox/data/datasets/
# rvt_gen4.py:56 generate_slices :109-125, extract_labels ds2 rescale
# :365-409). Closes the one dataset family the round-2 harness covered only
# with unit tests.
# ---------------------------------------------------------------------------

TL_RVT = 6  # > first repr index + 1 -> exercises the zero-padded history


@pytest.fixture(scope="module")
def rvt_dir(tmp_path_factory):
    h5py = pytest.importorskip("h5py")
    root = tmp_path_factory.mktemp("rvt_fixture")
    rng = np.random.default_rng(13)
    rep = "stacked_histogram_dt=50_nbins=10"
    label_dtype = np.dtype([
        ("t", "<i8"), ("x", "<f4"), ("y", "<f4"), ("w", "<f4"), ("h", "<f4"),
        ("class_id", "<u4"), ("class_confidence", "<f4"), ("track_id", "<u4"),
    ])
    n_frames, nbins = 5, 10
    for s in range(2):
        seq = root / f"seq{s:02d}"
        ldir = seq / "labels_v2"
        rdir = seq / "event_representations_v2" / rep
        ldir.mkdir(parents=True)
        rdir.mkdir(parents=True)
        n_repr = n_frames + 4
        data = rng.integers(0, 3, (n_repr, nbins, 360, 640)).astype(np.uint8)
        with h5py.File(rdir / "event_representations_ds2_nearest.h5", "w") as f:
            f.create_dataset("data", data=data)
        np.save(rdir / "objframe_idx_2_repr_idx.npy",
                np.arange(4, 4 + n_frames).astype(np.int64))
        np.save(rdir / "timestamps_us.npy",
                (np.arange(n_repr) * 50_000).astype(np.int64))
        rows, frame_idx = [], []
        for i in range(n_frames):
            frame_idx.append(len(rows))
            # original-res (720x1280) boxes incl. the reference's untouched
            # class-5 label (extract_labels applies NO class filter) and
            # crop/degenerate edge cases for the ds2 rescale (:371-388)
            rows.append((i * 50_000, 100.0, 80.0, 120.0, 90.0, 1, 1.0, i))
            rows.append((i * 50_000, 400.0, 200.0, 60.0, 70.0, 5, 1.0, i))
            rows.append((i * 50_000, -30.0, 650.0, 90.0, 100.0, 0, 1.0, i))
            rows.append((i * 50_000, 1270.0, 10.0, 50.0, 40.0, 2, 1.0, i))
        labels = np.zeros(len(rows), label_dtype)
        for j, r in enumerate(rows):
            labels[j] = r
        np.savez(ldir / "labels.npz", labels=labels,
                 objframe_idx_2_label_idx=np.asarray(frame_idx, np.int64))
        np.save(ldir / "timestamps_us.npy",
                (np.arange(n_frames) * 50_000).astype(np.int64))
    return str(root)


class TestRVTGen4PipelineParity:
    def _ref(self, rvt_dir, map_val=True):
        from yolox.data.datasets.rvt_gen4 import RVTGEN4Dataset
        from yolox.data.event_data_augment import (
            TrainTransform as RefTrain,
            ValTransform as RefVal,
        )

        return RVTGEN4Dataset(
            data_path=rvt_dir, input_size=(384, 640), random_aug=False,
            img_size=(360, 640), letterbox_image=True, map_val=map_val,
            format="cxcywh",
            target_transform=RefVal() if map_val else RefTrain(max_labels=50),
            down_sample_factor=2,
            aggregation="event_sum", num_slice=TL_RVT,
        )

    def _ours(self, rvt_dir, map_val=True):
        from eas_snn_tpu.data.gen4 import RVTGen4Dataset

        return RVTGen4Dataset(
            rvt_dir, input_size=(384, 640), training=False, map_val=map_val,
            aggregation="event_sum", num_slice=TL_RVT,
            letterbox_val=True,
        )

    @staticmethod
    def _match(ref, ours, i):
        """Map our sample i to the reference's index by (seq, label time):
        name formats differ (ours '<seq>_r<g>_a<t>' vs ref
        '<seq>_n<num_slice>_a<t>', rvt_gen4.py:246-248) and the reference
        iterates os.listdir unsorted."""
        name = ours.sample_names[i]
        seq, _, tail = name.rpartition("_r")
        t = tail.rpartition("_a")[2]
        return ref.sample_names.index(f"{seq}_n{TL_RVT}_a{t}")

    def test_ds2_labels_identical(self, rvt_dir):
        ref = self._ref(rvt_dir)
        ours = self._ours(rvt_dir)
        assert len(ref) == len(ours) == 10
        for i in range(len(ours)):
            j = self._match(ref, ours, i)
            rf, rt = ref.resolve_index(j)
            of, og = ours.resolve_index(i)
            lab = ref.labels[rf][rt]
            # reference rows are ds2-rescaled [t, x, y, w, h, cls, conf]
            ref_xyxy = np.stack(
                [lab[:, 1], lab[:, 2], lab[:, 1] + lab[:, 3],
                 lab[:, 2] + lab[:, 4], lab[:, 5]], axis=-1,
            )
            np.testing.assert_allclose(
                _sorted_rows(ref_xyxy), _sorted_rows(ours.raw_boxes(of, og)),
                rtol=1e-5, atol=1e-5,
            )

    def test_generate_slices_identical(self, rvt_dir):
        """Bit-identical stacked-histogram frames, incl. the zero-padded
        missing history of early samples (rvt_gen4.py:123-124)."""
        ref = self._ref(rvt_dir)
        ours = self._ours(rvt_dir)
        padded_seen = False
        for i in range(len(ours)):
            j = self._match(ref, ours, i)
            rf, rt = ref.resolve_index(j)
            of, og = ours.resolve_index(i)
            ref_frames = ref.generate_slices(rf, rt, TL_RVT, "event_sum")
            our_frames = np.asarray(ours.generate_slices(of, og), np.float64)
            np.testing.assert_array_equal(
                _ref_frames_to_ours(ref_frames), our_frames
            )
            if not our_frames[0, 0].any():
                padded_seen = True
        assert padded_seen, "fixture must exercise the zero-padded history"

    def test_map_val_getitem_identical(self, rvt_dir):
        """Full __getitem__ (letterbox 360x640 -> 384x640 + ValTransform):
        frames and raw ds2 boxes equal."""
        ref = self._ref(rvt_dir, map_val=True)
        ours = self._ours(rvt_dir, map_val=True)
        for i in range(len(ours)):
            j = self._match(ref, ours, i)
            rf_frames, rf_boxes, _, _ = ref[j]
            of_frames, of_boxes, _, _ = ours[i]
            np.testing.assert_allclose(
                _ref_frames_to_ours(rf_frames),
                np.asarray(of_frames, np.float64),
                rtol=1e-5, atol=1e-4,
            )
            np.testing.assert_allclose(
                _sorted_rows(rf_boxes), _sorted_rows(of_boxes),
                rtol=1e-5, atol=1e-5,
            )


# ---------------------------------------------------------------------------
# Full composition with the ARSNN sampler in the loop: reference
# YOLOX(use_spike=False, embedding=AdaptiveRSNNEmbedding) vs our
# EASYOLOX(use_spike='none', embedding='arsnn') on translated weights —
# eval-path equality on the GEN1 fixtures, then a 3-step Adam
# train-trajectory cross-check against the reference's 5-group optimizer
# (emb_lr group, coupled weight decay; reference:
# yolox/exp/event_yolox_base.py:353-416, core/trainer.py:95-135).
# ---------------------------------------------------------------------------


class TestFullCompositionParity:
    DEPTH, WIDTH, NC = 0.33, 0.25, 2
    TM = 3
    TS = 2
    LR, EMB_LR, WD = 1e-3, 2e-3, 5e-4

    def _ref_model(self):
        from yolox.models.activation import Rectangle
        from yolox.models.embedding import AdaptiveRSNNEmbedding
        from yolox.models.yolo_head import YOLOXHead as RefHead
        from yolox.models.yolo_pafpn import YOLOPAFPN as RefPAFPN
        from yolox.models.yolox import YOLOX as RefYOLOX

        torch.manual_seed(3)
        emb = AdaptiveRSNNEmbedding(
            kernel_size=3, Ts=self.TS, depth=2, readout="sum",
            write_zero=True, spike_attach=False,
            nb_steps=self.TM, thresh=1.0, vreset=None, spike_fn=Rectangle,
        )
        model = RefYOLOX(
            backbone=RefPAFPN(self.DEPTH, self.WIDTH, in_dim=2),
            head=RefHead(self.NC, self.WIDTH),
            embedding=emb,
        )
        # init_yolo BN semantics (reference exp/event_yolox_base.py:179-183)
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.eps = 1e-3
                m.momentum = 0.03
        return model

    def _our_model(self):
        from eas_snn_tpu.models import EASYOLOX

        return EASYOLOX(
            num_classes=self.NC, depth=self.DEPTH, width=self.WIDTH,
            use_spike="none", embedding="arsnn", embedding_ksize=3,
            embedding_depth=2, Ts=self.TS, readout="sum", write_zero=True,
            spike_fn="rect", alpha=1.0, thresh=1.0, vreset=None,
        )

    def _translate(self, ref_model, variables):
        from eas_snn_tpu.utils.torch_import import translate_torch_checkpoint

        sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
        v2, report = translate_torch_checkpoint(sd, variables)
        assert report["unmapped"] == 0, report
        return v2

    def _batches(self, gen1_dir, map_val):
        """Identical (frames, labels) through each pipeline's own reader:
        Tl=1, Tm=3 micro_sum at 256x320 letterbox."""
        from yolox.data.datasets.gen1 import GEN1Dataset
        from yolox.data.event_data_augment import (
            TrainTransform as RefTrain,
            ValTransform as RefVal,
        )

        from eas_snn_tpu.data.gen1 import Gen1Dataset

        ref_ds = GEN1Dataset(
            data_path=gen1_dir, input_size=(256, 320), random_aug=False,
            img_size=(H_RAW, W_RAW), continuous=True, slice_policy="fix_t",
            letterbox_image=True, map_val=map_val, format="cxcywh",
            target_transform=RefVal() if map_val else RefTrain(max_labels=50),
            aggregation="micro_sum", overlap=0, num_slice=1,
            micro_slice=self.TM, measure="count", window=WINDOW,
        )
        our_ds = Gen1Dataset(
            data_dir=gen1_dir, input_size=(256, 320), training=False,
            map_val=map_val, aggregation="micro_sum", num_slice=1,
            micro_slice=self.TM, window=WINDOW, letterbox_val=True,
        )
        rf, of, rl, ol = [], [], [], []
        for i in range(len(our_ds)):
            j = ref_ds.sample_names.index(our_ds.sample_names[i])
            a = ref_ds[j]
            b = our_ds[i]
            rf.append(np.asarray(a[0], np.float32))
            of.append(np.asarray(b[0], np.float32))
            rl.append(np.asarray(a[1], np.float32))
            ol.append(np.asarray(b[1], np.float32))
        return (np.stack(rf), np.stack(of), rl, ol)

    def test_eval_composition_equal(self, gen1_dir):
        import jax
        import jax.numpy as jnp

        ref_model = self._ref_model().eval()
        ours = self._our_model()
        rf, of, _, _ = self._batches(gen1_dir, map_val=True)
        # (B, Tl=1, Tm, 2, H, W) -> channel-last for ours
        xo = jnp.asarray(of)  # ours is already channel-last
        variables = jax.jit(
            ours.init, static_argnames=("train",)
        )(jax.random.PRNGKey(0), xo[:1], train=False)
        v2 = self._translate(ref_model, variables)

        with torch.no_grad():
            ref_out = ref_model(torch.from_numpy(rf)).numpy()
        our_out = np.asarray(
            jax.jit(lambda v, e: ours.apply(v, e, train=False))(
                {"params": v2["params"], "batch_stats": v2["batch_stats"]},
                xo,
            )
        )
        # decoded (B, A, 5+C) raw head outputs: spike dynamics are exact in
        # f32 (rect threshold on identical floats), detector is pure conv
        np.testing.assert_allclose(our_out, ref_out, rtol=5e-3, atol=5e-3)

    def test_adam_train_trajectory(self, gen1_dir):
        import jax
        import jax.numpy as jnp
        import optax

        from eas_snn_tpu.core.optim import build_optimizer

        ref_model = self._ref_model().train()
        ours = self._our_model()
        rf, of, rl, ol = self._batches(gen1_dir, map_val=False)
        # Identical inputs on both sides: the reference pipeline's frames +
        # labels (its int64-truncated letterbox GT at scale != 1 is a
        # documented divergence covered by TestGetitemParity; this test
        # isolates model + loss + optimizer-trajectory parity).
        xo = jnp.asarray(np.moveaxis(rf, 3, -1))
        tgt = jnp.asarray(np.stack(rl))
        variables = jax.jit(
            ours.init, static_argnames=("train",)
        )(jax.random.PRNGKey(0), xo[:1], tgt[:1], train=True)
        v2 = self._translate(ref_model, variables)
        params, bstats = v2["params"], v2["batch_stats"]

        # ---- reference 5-group Adam (event_yolox_base.py:379-411)
        pg0, pg1, pg2, pg4 = [], [], [], []
        for k, v in ref_model.named_modules():
            if "embedding" in k:
                continue
            if hasattr(v, "bias") and isinstance(v.bias, torch.nn.Parameter):
                pg2.append(v.bias)
            if isinstance(v, torch.nn.BatchNorm2d) or "bn" in k:
                pg0.append(v.weight)
            elif hasattr(v, "weight") and isinstance(v.weight, torch.nn.Parameter):
                pg1.append(v.weight)
        pg4 = [p for p in ref_model.embedding.parameters() if p.requires_grad]
        opt = torch.optim.Adam(pg0, lr=self.LR, amsgrad=False)
        opt.add_param_group({"params": pg1, "weight_decay": self.WD})
        opt.add_param_group({"params": pg2})
        opt.add_param_group({"params": pg4, "lr": self.EMB_LR})

        tx = build_optimizer(
            params, lambda s: self.LR, optimizer="ADAM",
            weight_decay=self.WD, emb_lr=self.EMB_LR, base_lr=self.LR,
        )
        opt_state = tx.init(params)

        def loss_fn(p, bs, ev, tg):
            out, muts = ours.apply(
                {"params": p, "batch_stats": bs}, ev, tg, train=True,
                mutable=["batch_stats"],
            )
            return out["total_loss"], (out, muts["batch_stats"])

        step = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        xt = torch.from_numpy(rf)
        tt = torch.from_numpy(np.stack(rl))

        for it in range(3):
            ref_out = ref_model(xt, tt)
            ref_loss = ref_out["total_loss"]
            opt.zero_grad()
            ref_loss.backward()
            opt.step()

            (loss, (out, bstats)), grads = step(params, bstats, xo, tgt)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

            assert float(loss) == pytest.approx(
                float(ref_loss.detach()), rel=2e-3
            ), f"step {it}: loss diverged"
            assert float(out["num_fg"]) == pytest.approx(
                float(ref_out["num_fg"]), rel=1e-6
            ), f"step {it}: SimOTA assignment count diverged"

        # Parameter-movement magnitude after 3 steps. Elementwise (or tight
        # per-leaf) equality is NOT attainable: leaves with near-zero
        # gradients take sign-noise-driven +/-lr Adam random walks, so a
        # single small leaf's movement norm legitimately varies ~20%
        # between frameworks. The *aggregate* movement is gradient-driven
        # and pins lr/emb_lr/decay systematically (5%), while a loose 2x
        # per-leaf band still catches a mis-grouped leaf (3x emb_lr, a
        # decayed BN vector). Exact update semantics are pinned separately
        # by test_adam_group_semantics_match_torch; on-trajectory params
        # are already proven by the step-1/2 loss equality above.
        v_after = self._translate(
            ref_model, {"params": params, "batch_stats": bstats}
        )
        flat_ref = jax.tree_util.tree_leaves(v_after["params"])
        flat_our = jax.tree_util.tree_leaves(params)
        flat_init = jax.tree_util.tree_leaves(v2["params"])
        tot_ref = tot_our = 0.0
        for a, b, p0 in zip(flat_ref, flat_our, flat_init):
            d_ref = float(np.linalg.norm(np.asarray(a) - np.asarray(p0)))
            d_our = float(np.linalg.norm(np.asarray(b) - np.asarray(p0)))
            tot_ref += d_ref * d_ref
            tot_our += d_our * d_our
            if d_ref < 1e-7 and d_our < 1e-7:
                continue
            assert d_our == pytest.approx(d_ref, rel=1.0), (
                f"leaf movement diverged: ours {d_our} vs ref {d_ref}"
            )
        assert np.sqrt(tot_our) == pytest.approx(np.sqrt(tot_ref), rel=0.05)


def test_adam_group_semantics_match_torch():
    """build_optimizer must reproduce torch's 5-group Adam EXACTLY on
    synthetic gradients: coupled weight decay on non-BN kernels only, no
    decay anywhere in the embedding subtree (reference pg4,
    event_yolox_base.py:389-411), and the separate emb_lr."""
    import jax
    import jax.numpy as jnp
    import optax

    from eas_snn_tpu.core.optim import build_optimizer

    LR, EMB_LR, WD = 1e-3, 3e-3, 5e-4
    rng = np.random.default_rng(5)

    shapes = {
        ("backbone", "conv", "kernel"): (3, 3, 4, 8),
        ("backbone", "bn", "scale"): (8,),
        ("backbone", "bn", "bias"): (8,),
        ("head", "conv", "bias"): (8,),
        ("embedding", "input_conv_kernel0"): (3, 3, 2, 4),
        ("embedding", "input_conv_bias0"): (4,),
    }
    vals = {k: rng.normal(size=s).astype(np.float32) for k, s in shapes.items()}
    grads_seq = [
        {k: rng.normal(size=s).astype(np.float32) for k, s in shapes.items()}
        for _ in range(5)
    ]

    def to_tree(d):
        tree = {}
        for path, v in d.items():
            node = tree
            for p in path[:-1]:
                node = node.setdefault(p, {})
            node[path[-1]] = jnp.asarray(v)
        return tree

    params = to_tree(vals)
    tx = build_optimizer(
        params, lambda s: LR, optimizer="ADAM", weight_decay=WD,
        emb_lr=EMB_LR, base_lr=LR,
    )
    opt_state = tx.init(params)
    for g in grads_seq:
        updates, opt_state = tx.update(to_tree(g), opt_state, params)
        params = optax.apply_updates(params, updates)

    # torch: pg0 BN weights (no decay) / pg1 kernels (decay) / pg2 biases /
    # pg4 embedding (own lr, no decay)
    tparams = {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
               for k, v in vals.items()}
    pg0 = [tparams[("backbone", "bn", "scale")]]
    pg1 = [tparams[("backbone", "conv", "kernel")]]
    pg2 = [tparams[("backbone", "bn", "bias")], tparams[("head", "conv", "bias")]]
    pg4 = [tparams[("embedding", "input_conv_kernel0")],
           tparams[("embedding", "input_conv_bias0")]]
    opt = torch.optim.Adam(pg0, lr=LR, amsgrad=False)
    opt.add_param_group({"params": pg1, "weight_decay": WD})
    opt.add_param_group({"params": pg2})
    opt.add_param_group({"params": pg4, "lr": EMB_LR})
    for g in grads_seq:
        opt.zero_grad()
        for k, p in tparams.items():
            p.grad = torch.from_numpy(g[k].copy())
        opt.step()

    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    got = {tuple(p.key for p in path): np.asarray(v) for path, v in flat}
    for k, p in tparams.items():
        np.testing.assert_allclose(
            got[k], p.detach().numpy(), rtol=1e-6, atol=1e-7,
            err_msg=str(k),
        )
