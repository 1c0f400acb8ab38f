"""Legacy RGB pipeline tests: COCO-json parsing, VOC xml, mosaic+mixup,
random affine, RGB exp wiring — on synthetic data."""

import json
import os

import cv2
import numpy as np
import pytest

from eas_snn_tpu.data import COCODataset, MosaicDataset, VOCDataset
from eas_snn_tpu.data.mosaic import random_affine


def build_coco_tree(tmp_path, rng, n_images=6):
    (tmp_path / "annotations").mkdir()
    (tmp_path / "train2017").mkdir()
    images, annotations = [], []
    for i in range(n_images):
        h, w = 120, 160
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        name = f"{i:012d}.jpg"
        cv2.imwrite(str(tmp_path / "train2017" / name), img)
        images.append({"id": i + 1, "file_name": name, "width": w, "height": h})
        annotations.append({
            "id": 2 * i, "image_id": i + 1, "category_id": 3,
            "bbox": [10, 20, 60, 40], "area": 2400, "iscrowd": 0,
        })
        annotations.append({
            "id": 2 * i + 1, "image_id": i + 1, "category_id": 7,
            "bbox": [80, 50, 40, 50], "area": 2000, "iscrowd": 0,
        })
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": 3, "name": "car"}, {"id": 7, "name": "truck"},
        ],
    }
    with open(tmp_path / "annotations" / "instances_train2017.json", "w") as f:
        json.dump(coco, f)
    return str(tmp_path)


class TestCOCO:
    def test_parse_and_shapes(self, rng, tmp_path):
        root = build_coco_tree(tmp_path, rng)
        ds = COCODataset(
            root, input_size=(96, 128), training=True, max_labels=10
        )
        assert len(ds) == 6
        assert ds.class_names == ("car", "truck")
        frames, labels, img_size, sid = ds[0]
        assert frames.shape == (1, 1, 96, 128, 3)
        assert labels.shape == (10, 5)
        assert tuple(img_size) == (120, 160)

    def test_val_letterbox(self, rng, tmp_path):
        root = build_coco_tree(tmp_path, rng)
        ds = COCODataset(
            root, input_size=(96, 128), training=False, max_labels=10
        )
        frames, labels, _, _ = ds[1]
        assert frames.shape == (1, 1, 96, 128, 3)
        # two valid boxes survive letterboxing
        assert (labels.sum(-1) != 0).sum() == 2


class TestMosaic:
    def test_mosaic_sample(self, rng, tmp_path):
        root = build_coco_tree(tmp_path, rng)
        base = COCODataset(
            root, input_size=(96, 128), training=True, max_labels=10
        )
        ds = MosaicDataset(base, input_size=(96, 128), max_labels=30)
        frames, labels, img_size, sid = ds[0]
        assert frames.shape == (1, 1, 96, 128, 3)
        assert labels.shape == (30, 5)
        assert np.isfinite(frames).all()

    def test_close_mosaic(self, rng, tmp_path):
        root = build_coco_tree(tmp_path, rng)
        base = COCODataset(
            root, input_size=(96, 128), training=True, max_labels=10
        )
        ds = MosaicDataset(base, input_size=(96, 128))
        ds.close_mosaic()
        frames, labels, _, _ = ds[2]
        assert frames.shape == (1, 1, 96, 128, 3)

    def test_random_affine_identity(self, rng):
        img = rng.integers(0, 255, (64, 64, 3), np.uint8)
        boxes = np.array([[10, 10, 40, 40, 0.0]], np.float32)
        out, b = random_affine(
            img, boxes, np.random.default_rng(0), target_size=(64, 64),
            degrees=0, translate=0, scales=(1.0, 1.0), shear=0,
        )
        # pure identity: translation fixed to center shift of 0.5*size
        assert out.shape == (64, 64, 3)
        assert len(b) <= 1


class TestVOC:
    def _build(self, tmp_path, rng):
        root = tmp_path / "VOC2007"
        (root / "ImageSets" / "Main").mkdir(parents=True)
        (root / "Annotations").mkdir()
        (root / "JPEGImages").mkdir()
        ids = []
        for i in range(3):
            img_id = f"00000{i}"
            ids.append(img_id)
            img = rng.integers(0, 255, (100, 140, 3), np.uint8)
            cv2.imwrite(str(root / "JPEGImages" / f"{img_id}.jpg"), img)
            xml = f"""<annotation>
  <object><name>car</name><difficult>0</difficult>
    <bndbox><xmin>11</xmin><ymin>21</ymin><xmax>71</xmax><ymax>61</ymax></bndbox>
  </object>
  <object><name>person</name><difficult>0</difficult>
    <bndbox><xmin>81</xmin><ymin>31</ymin><xmax>121</xmax><ymax>91</ymax></bndbox>
  </object>
</annotation>"""
            (root / "Annotations" / f"{img_id}.xml").write_text(xml)
        (root / "ImageSets" / "Main" / "trainval.txt").write_text(
            "\n".join(ids) + "\n"
        )
        return str(tmp_path)

    def test_voc_parse(self, rng, tmp_path):
        root = self._build(tmp_path, rng)
        ds = VOCDataset(
            root, input_size=(96, 128), training=True, max_labels=10
        )
        assert len(ds) == 3
        frames, labels, img_size, sid = ds[0]
        assert frames.shape == (1, 1, 96, 128, 3)
        valid = labels[labels.sum(-1) != 0]
        assert len(valid) == 2
        # class ids: car=6, person=14 in VOC_CLASSES
        assert set(valid[:, 0].astype(int)) == {6, 14}


class TestRGBExp:
    def test_yolox_s_model_builds(self):
        import jax
        import jax.numpy as jnp

        from eas_snn_tpu.exp import get_exp

        exp = get_exp(exp_name="yolox-s")
        exp.depth, exp.width = 0.33, 0.125  # shrink for test speed
        model = exp.get_model()
        x = jnp.zeros((1, 1, 1, 64, 64, 3))
        v = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(v, x)
        assert out.shape == (1, 84, 5 + 80)

    def test_yolox_nano_depthwise_builds(self):
        """Nano preset: depthwise convs engaged end-to-end (reference
        exps/default/yolox_nano.py:37 depthwise=True)."""
        import jax
        import jax.numpy as jnp

        from eas_snn_tpu.exp import get_exp

        exp = get_exp(exp_name="yolox-nano")
        assert exp.depthwise and exp.width == 0.25
        assert exp.input_size == (416, 416) and exp.mixup_prob == 0.0
        model = exp.get_model()
        assert model.depthwise
        x = jnp.zeros((1, 1, 1, 64, 64, 3))
        v = model.init(jax.random.PRNGKey(0), x)
        # depthwise kernels present: DWConv = grouped 3x3 + pointwise 1x1
        flat = jax.tree_util.tree_leaves_with_path(v["params"])
        assert any("dconv" in jax.tree_util.keystr(p) for p, _ in flat)
        out = model.apply(v, x)
        assert out.shape == (1, 84, 5 + 80)

    def test_yolox_tiny_x_presets_load(self):
        from eas_snn_tpu.exp import get_exp

        tiny = get_exp(exp_name="yolox-tiny")
        assert (tiny.depth, tiny.width) == (0.33, 0.375)
        assert tiny.input_size == (416, 416)
        x = get_exp(exp_name="yolox-x")
        assert (x.depth, x.width) == (1.33, 1.25)


class TestLegacyYOLOv3:
    def test_yolofpn_forward(self):
        import jax
        import jax.numpy as jnp

        from eas_snn_tpu.models.yolo_fpn import Darknet, YOLOFPN

        x = jnp.zeros((1, 64, 64, 3))
        m = YOLOFPN(depth=21)
        v = m.init(jax.random.PRNGKey(0), x)
        o3, o4, o5 = m.apply(v, x)
        assert o3.shape == (1, 8, 8, 128)
        assert o4.shape == (1, 4, 4, 256)
        assert o5.shape[1:3] == (2, 2)

    def test_yolov3_exp(self):
        import jax
        import jax.numpy as jnp

        from eas_snn_tpu.exp import get_exp

        exp = get_exp(exp_file="exps/default/yolov3.py")
        m = exp.get_model()
        x = jnp.zeros((1, 1, 1, 64, 64, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape == (1, 84, 85)
