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
