"""Core runtime tests: LR schedules, optimizer group policy, EMA, exp
config system, checkpoint round-trip."""

import math
import os

import numpy as np
import pytest


class TestLRSchedules:
    def test_fixed(self):
        from eas_snn_tpu.core import build_lr_schedule

        s = build_lr_schedule("fixed", 1e-3, 10, 5)
        assert float(s(0)) == pytest.approx(1e-3)
        assert float(s(49)) == pytest.approx(1e-3)

    def test_yoloxwarmcos(self):
        from eas_snn_tpu.core import build_lr_schedule

        lr = 1e-2
        s = build_lr_schedule(
            "yoloxwarmcos", lr, 100, 10, warmup_epochs=1, warmup_lr_start=0,
            no_aug_epochs=2, min_lr_ratio=0.05,
        )
        # quadratic warmup: 0 at it=0, lr at end of warmup
        assert float(s(0)) == pytest.approx(0.0)
        assert float(s(100)) == pytest.approx(lr, rel=1e-3)
        # no-aug tail pinned at min lr
        assert float(s(999)) == pytest.approx(lr * 0.05, rel=1e-3)
        # cosine in between decreases
        assert float(s(200)) > float(s(700))

    def test_warmcos(self):
        from eas_snn_tpu.core import build_lr_schedule

        s = build_lr_schedule("warmcos", 1e-2, 100, 10, warmup_epochs=1,
                              warmup_lr_start=1e-6)
        assert float(s(0)) == pytest.approx(1e-6)
        assert float(s(100)) == pytest.approx(1e-2, rel=1e-2)


class TestOptimizer:
    def _tiny_params(self):
        import jax.numpy as jnp

        return {
            "embedding": {"input_conv_kernel0": jnp.ones((3, 3, 2, 4))},
            "backbone": {
                "stem": {
                    "conv": {"kernel": jnp.ones((3, 3, 2, 8))},
                    "bn": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))},
                }
            },
        }

    def test_weight_decay_mask(self):
        from eas_snn_tpu.core.optim import _decay_mask

        mask = _decay_mask(self._tiny_params())
        assert mask["backbone"]["stem"]["conv"]["kernel"] is True
        assert mask["backbone"]["stem"]["bn"]["scale"] is False
        assert mask["backbone"]["stem"]["bn"]["bias"] is False

    def test_emb_lr_scaling(self):
        import jax
        import jax.numpy as jnp
        import optax

        from eas_snn_tpu.core import build_optimizer

        params = self._tiny_params()
        tx = build_optimizer(
            params, lambda s: 1e-3, optimizer="ADAM", emb_lr=2e-3,
            base_lr=1e-3,
        )
        state = tx.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        emb_u = float(
            jnp.abs(updates["embedding"]["input_conv_kernel0"]).mean()
        )
        main_u = float(
            jnp.abs(updates["backbone"]["stem"]["conv"]["kernel"]).mean()
        )
        assert emb_u == pytest.approx(2 * main_u, rel=1e-4)

    def test_ema_ramp(self):
        import jax.numpy as jnp

        from eas_snn_tpu.core import ema_update

        ema = {"w": jnp.zeros(3)}
        params = {"w": jnp.ones(3)}
        out_early = ema_update(ema, params, jnp.asarray(1))
        out_late = ema_update(ema, params, jnp.asarray(100000))
        # early: decay ~ 0 -> ema follows params; late: decay ~ 0.9998
        assert float(out_early["w"][0]) > 0.99
        assert float(out_late["w"][0]) == pytest.approx(1 - 0.9998, rel=1e-3)


class TestExpSystem:
    def test_merge_type_coercion(self):
        from eas_snn_tpu.exp import EventExp

        exp = EventExp()
        exp.merge([
            "num_classes", "2",
            "input_size", "(128, 160)",
            "use_spike", "True",
            "basic_lr_per_img", "1.5625e-5",
            "write_zero", "True",
            "data_name", "gen1",
        ])
        assert exp.num_classes == 2
        assert exp.input_size == (128, 160)
        assert exp.write_zero is True
        assert exp.basic_lr_per_img == pytest.approx(1.5625e-5)
        assert exp.data_name == "gen1"
        assert exp.use_spike_mode == "backbone"

    def test_merge_rejects_unknown(self):
        from eas_snn_tpu.exp import EventExp

        with pytest.raises(AssertionError):
            EventExp().merge(["not_a_key", "1"])

    def test_get_exp_by_name_and_file(self):
        from eas_snn_tpu.exp import get_exp

        exp = get_exp(exp_name="e-yolox-s")
        assert exp.depth == pytest.approx(0.33)
        assert exp.width == pytest.approx(0.50)
        exp2 = get_exp(exp_file="exps/default/gen1_syolox_s.py")
        assert exp2.num_classes == 2
        assert exp2.embedding == "arsnn"

    def test_check_exp_value(self):
        from eas_snn_tpu.exp import EventExp

        exp = EventExp()
        exp.input_size = (100, 100)
        with pytest.raises(AssertionError):
            exp.check_exp_value()


class TestCheckpoint:
    def test_partial_load_shape_check(self):
        import jax.numpy as jnp

        from eas_snn_tpu.core import load_partial_params

        cur = {"a": jnp.zeros((2, 2)), "b": {"c": jnp.zeros(3)}}
        loaded = {"a": np.ones((2, 2)), "b": {"c": np.ones(5)}}  # c mismatched
        out = load_partial_params(cur, loaded)
        assert float(np.asarray(out["a"]).sum()) == 4.0
        assert float(np.asarray(out["b"]["c"]).sum()) == 0.0  # kept current

    def test_orbax_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp
        import optax

        from eas_snn_tpu.core import CheckpointManager
        from eas_snn_tpu.core.train_state import TrainState

        tx = optax.adam(1e-3)
        params = {"w": jnp.arange(4.0)}
        state = TrainState(
            step=jnp.asarray(7, jnp.int32),
            params=params,
            batch_stats={"bn": jnp.ones(2)},
            opt_state=tx.init(params),
            ema_params=jax.tree_util.tree_map(lambda x: x * 2, params),
            apply_fn=lambda *a, **k: None,
            tx=tx,
        )
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(7, state, best_ap=0.5)
        fresh = state.replace(
            step=jnp.asarray(0, jnp.int32),
            params={"w": jnp.zeros(4)},
            ema_params={"w": jnp.zeros(4)},
        )
        restored, best = mgr.restore(fresh)
        assert best == pytest.approx(0.5)
        assert int(restored.step) == 7
        np.testing.assert_allclose(np.asarray(restored.params["w"]), np.arange(4.0))
        np.testing.assert_allclose(
            np.asarray(restored.ema_params["w"]), 2 * np.arange(4.0)
        )


class TestMultiscale:
    def test_multiscale_resize(self):
        import jax.numpy as jnp

        from eas_snn_tpu.core.trainer import _multiscale_resize

        events = jnp.ones((2, 1, 2, 64, 64, 2))
        targets = jnp.asarray(
            np.tile(np.array([[1.0, 32, 16, 8, 4]], np.float32), (2, 3, 1))
        )
        e2, t2 = _multiscale_resize(events, targets, (96, 128))
        assert e2.shape == (2, 1, 2, 96, 128, 2)
        np.testing.assert_allclose(
            np.asarray(t2[0, 0]), [1.0, 64, 24, 16, 6]
        )
        # identity size is a no-op
        e3, t3 = _multiscale_resize(events, targets, (64, 64))
        assert e3 is events and t3 is targets


class TestModelSurgery:
    def test_fuse_conv_bn_preserves_eval_output(self):
        import jax
        import jax.numpy as jnp

        from eas_snn_tpu.models import EASYOLOX
        from eas_snn_tpu.utils import fuse_conv_bn

        m = EASYOLOX(
            num_classes=2, depth=0.33, width=0.125, use_spike="none",
            embedding="count",
        )
        rng = np.random.default_rng(3)
        ev = jnp.asarray(rng.normal(size=(1, 1, 1, 64, 64, 2)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), ev)
        # give BN non-trivial running stats
        import jax.tree_util as jtu

        v = dict(v)
        v["batch_stats"] = jtu.tree_map(
            lambda x: x + 0.3 * rng.standard_normal(x.shape).astype(x.dtype) ** 2,
            v["batch_stats"],
        )
        out_ref = m.apply(v, ev)
        fused = fuse_conv_bn(v)
        out_fused = m.apply(fused, ev)
        np.testing.assert_allclose(
            np.asarray(out_fused), np.asarray(out_ref), rtol=2e-3, atol=2e-4
        )

    def test_freeze_labels(self):
        from eas_snn_tpu.utils import freeze_labels

        params = {"backbone": {"w": 1}, "head": {"w": 2}, "embedding": {"k": 3}}
        labels = freeze_labels(params, ["backbone"])
        assert labels["backbone"]["w"] == "frozen"
        assert labels["head"]["w"] == "trainable"


class TestTrainerDeviceBinning:
    def test_before_train_with_raw_event_tuples(self, tmp_path):
        """Regression (round-1 advisor, trainer.py:115): with
        exp.device_binning the loader yields TUPLE frames; before_train must
        build the device binner first and bin the init sample instead of
        tuple-slicing it. Run one real epoch of 2 iters end-to-end."""
        import numpy as np

        from eas_snn_tpu.core.trainer import Trainer
        from eas_snn_tpu.data.psee_io import (
            write_bboxes_npy,
            write_dat_events,
        )
        from eas_snn_tpu.exp.build import get_exp

        root = tmp_path / "gen1"
        root.mkdir()
        rng = np.random.default_rng(0)
        n = 20000
        t = np.sort(rng.integers(0, 900_000, n)).astype(np.uint32)
        write_dat_events(
            str(root / "s1_td.dat"), t, rng.integers(0, 304, n),
            rng.integers(0, 240, n), rng.integers(0, 2, n), 240, 304,
        )
        write_bboxes_npy(
            str(root / "s1_bbox.npy"),
            [(300_000, 40, 50, 60, 40, 0, 0, 1.0),
             (600_000, 10, 10, 90, 90, 1, 0, 1.0)],
        )

        exp = get_exp(exp_file="exps/default/gen1_syolox_s.py")
        exp.merge([
            "data_dir", str(root), "max_epoch", "1",
            "input_size", "(64, 64)", "test_size", "(64, 64)",
            "depth", "0.33", "width", "0.125", "eval_interval", "100",
            "output_dir", str(tmp_path / "out"), "print_interval", "1",
            "device_binning", "True", "max_events_per_slice", "4096",
            "data_num_workers", "1", "Tm", "2", "T", "2", "Ts", "2",
        ])

        class Args:
            batch_size = 8  # conftest mesh has 8 virtual devices
            resume = False
            ckpt = None
            experiment_name = "binrun"
            grid_search = False
            profile = 0

        tr = Trainer(exp, Args())
        tr.train()
        assert tr.state is not None
        assert int(tr.state.step) == tr.iters_per_epoch
