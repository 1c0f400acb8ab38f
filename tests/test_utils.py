"""Utility tests: metrics tracking, meters, model info, visualization,
exp.eval wiring."""

import json
import os

import numpy as np
import pytest


class TestTracking:
    def test_jsonl_stream(self, tmp_path):
        from eas_snn_tpu.utils.tracking import MetricsTracker

        t = MetricsTracker(str(tmp_path))
        t.log(1, {"loss": 3.5, "lr": 1e-3})
        t.log(2, {"AP50": 0.4}, split="val")
        t.close()
        lines = [
            json.loads(l)
            for l in open(tmp_path / "metrics.jsonl").read().splitlines()
        ]
        assert lines[0]["step"] == 1 and lines[0]["loss"] == 3.5
        assert lines[1]["split"] == "val" and lines[1]["AP50"] == 0.4

    def test_disabled_writes_nothing(self, tmp_path):
        from eas_snn_tpu.utils.tracking import MetricsTracker

        t = MetricsTracker(str(tmp_path / "x"), enabled=False)
        t.log(1, {"a": 1.0})
        t.close()
        assert not os.path.exists(tmp_path / "x" / "metrics.jsonl")

    def test_wandb_backend(self, tmp_path, monkeypatch):
        """wandb integration exercised via a stub module (the package is
        absent in this environment; reference: WandbLogger,
        yolox/utils/logger.py)."""
        import sys
        import types

        calls = {"logged": [], "artifacts": [], "finished": 0}

        class _Run:
            def log(self, d, step=None):
                calls["logged"].append((step, dict(d)))

            def log_artifact(self, art):
                calls["artifacts"].append(art)

            def finish(self):
                calls["finished"] += 1

        class _Artifact:
            def __init__(self, name, type):
                self.name, self.type = name, type
                self.files = []

            def add_file(self, p):
                self.files.append(p)

            def add_dir(self, p):
                self.files.append(p)

        fake = types.ModuleType("wandb")
        fake.init = lambda **kw: _Run()
        fake.Artifact = _Artifact
        monkeypatch.setitem(sys.modules, "wandb", fake)

        from eas_snn_tpu.utils.tracking import MetricsTracker

        t = MetricsTracker(str(tmp_path), backend="wandb",
                           run_config={"depth": 0.33})
        t.log(5, {"loss": 2.0})
        t.log(6, {"AP50": 0.1}, split="val")
        ckpt = tmp_path / "best"
        ckpt.mkdir()
        t.log_artifact(str(ckpt), name="best_ckpt")
        t.close()

        assert calls["logged"] == [
            (5, {"train/loss": 2.0}), (6, {"val/AP50": 0.1})
        ]
        assert len(calls["artifacts"]) == 1
        assert calls["artifacts"][0].name == "best_ckpt"
        assert calls["finished"] == 1
        # JSONL still written alongside
        assert os.path.exists(tmp_path / "metrics.jsonl")

    def test_wandb_required_but_missing_raises(self, tmp_path, monkeypatch):
        import builtins
        import sys

        monkeypatch.delitem(sys.modules, "wandb", raising=False)
        real_import = builtins.__import__

        def deny(name, *a, **k):
            if name == "wandb":
                raise ImportError("no wandb")
            return real_import(name, *a, **k)

        monkeypatch.setattr(builtins, "__import__", deny)
        from eas_snn_tpu.utils.tracking import MetricsTracker

        with pytest.raises(ImportError):
            MetricsTracker(str(tmp_path), backend="wandb")
        # 'auto' degrades silently
        t = MetricsTracker(str(tmp_path), backend="auto")
        t.log(1, {"a": 1.0})
        t.close()


class TestMeters:
    def test_average_meter_window(self):
        from eas_snn_tpu.utils import AverageMeter

        m = AverageMeter(window_size=3)
        for v in (1, 2, 3, 4):
            m.update(v)
        assert m.avg == pytest.approx(3.0)       # window (2, 3, 4)
        assert m.global_avg == pytest.approx(2.5)
        assert m.latest == 4
        assert m.median == 3

    def test_meter_buffer(self):
        from eas_snn_tpu.utils import MeterBuffer

        b = MeterBuffer(window_size=5)
        b.update(loss=1.0, iou_loss=2.0)
        b.update({"loss": 3.0})
        assert b["loss"].avg == pytest.approx(2.0)
        assert set(b.get_filtered_meter("loss")) == {"loss", "iou_loss"}


class TestVisualize:
    def test_event_frame_image_and_boxes(self):
        from eas_snn_tpu.utils import event_frame_to_image, vis_detections

        frame = np.zeros((32, 48, 2), np.float32)
        frame[4, 5, 1] = 3  # positive-dominant pixel
        frame[6, 7, 0] = 2  # negative-dominant pixel
        img = event_frame_to_image(frame)
        assert img.shape == (32, 48, 3)
        assert img[4, 5, 0] == 255 and img[6, 7, 0] == 0 and img[0, 0, 0] == 127
        out = vis_detections(
            img, np.array([[5, 5, 20, 20]]), np.array([0.9]), np.array([1]),
            conf=0.5, class_names=("car", "ped"),
        )
        assert out.shape == img.shape and (out != img).any()


class TestModelInfo:
    def test_params_and_flops_string(self):
        import jax
        import jax.numpy as jnp

        from eas_snn_tpu.models import EASYOLOX
        from eas_snn_tpu.utils import count_params, get_model_info

        m = EASYOLOX(
            num_classes=2, depth=0.33, width=0.125, use_spike="none",
            embedding="count",
        )
        ev = jnp.zeros((1, 1, 1, 64, 64, 2))
        v = m.init(jax.random.PRNGKey(0), ev)
        n = count_params(v["params"])
        assert n > 100_000
        info = get_model_info(m, v, ev)
        assert "Params" in info and "Gflops" in info


class TestExpEval:
    def test_exp_eval_convenience(self, rng, tmp_path):
        import jax

        from eas_snn_tpu.exp import EventExp

        from test_data import build_gen1_tree

        root = build_gen1_tree(tmp_path, rng)
        exp = EventExp()
        exp.merge([
            "data_name", "gen1", "data_dir", root, "num_classes", "2",
            "input_size", "(64,64)", "test_size", "(64,64)",
            "depth", "0.33", "width", "0.125", "Tl", "1", "Tm", "1",
            "T", "2", "Ts", "1", "aggregation", "sum",
            "embedding", "count", "use_spike", "True",
            "data_num_workers", "1",
        ])
        model = exp.get_model()
        import jax.numpy as jnp

        sample = jnp.zeros((1, 1, 1, 64, 64, 2))
        variables = model.init(jax.random.PRNGKey(0), sample, train=False)
        evaluator = exp.get_evaluator(batch_size=3)
        ap, ap50, text = exp.eval(model, variables, evaluator)
        assert 0.0 <= ap <= 1.0 and "Average Precision" in text


class TestAssignViz:
    def test_visualize_assignments(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from eas_snn_tpu.models import EASYOLOX
        from eas_snn_tpu.utils.assign_viz import visualize_assignments

        m = EASYOLOX(
            num_classes=2, depth=0.33, width=0.125, use_spike="none",
            embedding="count",
        )
        rng = np.random.default_rng(5)
        events = jnp.asarray(rng.poisson(0.3, (2, 1, 1, 64, 64, 2)), jnp.float32)
        labels = np.zeros((2, 5, 5), np.float32)
        labels[0, 0] = [0, 32, 32, 20, 16]
        labels[1, 0] = [1, 16, 40, 12, 12]
        v = m.init(jax.random.PRNGKey(0), events, jnp.asarray(labels), train=True)
        imgs = visualize_assignments(
            m, v, np.asarray(events), labels,
            save_prefix=str(tmp_path / "assign_"),
        )
        assert len(imgs) == 2 and imgs[0].shape == (64, 64, 3)
        assert os.path.exists(tmp_path / "assign_0.png")


class TestPredImageLogging:
    def _frames_dets(self):
        rng = np.random.default_rng(5)
        frames = rng.integers(0, 3, (2, 24, 32, 2)).astype(np.float32)
        det0 = np.array([
            [4.0, 5.0, 20.0, 18.0, 0.9, 0.8, 0.0],
            [1.0, 1.0, 8.0, 9.0, 0.7, 0.9, 1.0],
        ])
        return frames, [det0, None]

    def test_jsonl_backend_writes_pngs(self, tmp_path):
        from eas_snn_tpu.utils.tracking import MetricsTracker

        t = MetricsTracker(str(tmp_path), backend="jsonl")
        frames, dets = self._frames_dets()
        written = t.log_pred_images(
            7, frames, dets, class_names=("car", "ped"))
        t.close()
        assert len(written) == 2
        for p in written:
            assert os.path.exists(p)
        import cv2

        img = cv2.imread(written[0])
        assert img.shape == (24, 32, 3)

    def test_multislice_frames_collapse(self, tmp_path):
        from eas_snn_tpu.utils.tracking import MetricsTracker

        t = MetricsTracker(str(tmp_path), backend="jsonl")
        frames = np.zeros((1, 1, 3, 16, 16, 2), np.float32)  # (B,Tl,Tm,...)
        written = t.log_pred_images(1, frames, [None])
        t.close()
        assert len(written) == 1

    def test_wandb_backend_logs_box_metadata(self, tmp_path, monkeypatch):
        import sys
        import types

        calls = {"logged": []}

        class _Run:
            def log(self, d, step=None):
                calls["logged"].append((step, d))

            def finish(self):
                pass

        class _Image:
            def __init__(self, img, boxes=None):
                self.boxes = boxes

        fake = types.ModuleType("wandb")
        fake.init = lambda **kw: _Run()
        fake.Image = _Image
        monkeypatch.setitem(sys.modules, "wandb", fake)

        from eas_snn_tpu.utils.tracking import MetricsTracker

        t = MetricsTracker(str(tmp_path), backend="wandb")
        frames, dets = self._frames_dets()
        t.log_pred_images(3, frames, dets, class_names=("car", "ped"))
        t.close()
        media = [d for _, d in calls["logged"] if "val/predictions" in d]
        assert len(media) == 1
        imgs = media[0]["val/predictions"]
        assert len(imgs) == 2
        bd = imgs[0].boxes["predictions"]["box_data"]
        assert len(bd) == 2 and bd[0]["position"]["maxX"] == 20.0
        assert imgs[0].boxes["predictions"]["class_labels"] == {
            0: "car", 1: "ped"}
