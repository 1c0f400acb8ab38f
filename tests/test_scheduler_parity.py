"""LR-schedule curve parity against the reference's formulas
(reference: yolox/utils/lr_scheduler.py:99-210), evaluated pointwise over
whole training runs."""

import numpy as np
import pytest

from refutil import install_ref_stubs


@pytest.fixture(scope="module", autouse=True)
def ref_env():
    install_ref_stubs()
    yield


def _ref():
    import yolox.utils.lr_scheduler as m

    return m


IPE, EPOCHS = 40, 25
LR = 2e-3


def _sweep(ours, ref_fn, n=IPE * EPOCHS, rtol=1e-5, atol=1e-9):
    its = np.arange(n)
    got = np.asarray([float(ours(i)) for i in its])
    want = np.asarray([ref_fn(i) for i in its])
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)


class TestScheduleCurves:
    def test_cos(self):
        from eas_snn_tpu.core import build_lr_schedule

        m = _ref()
        s = build_lr_schedule("cos", LR, IPE, EPOCHS)
        _sweep(s, lambda i: m.cos_lr(LR, IPE * EPOCHS, i))

    def test_warmcos(self):
        from eas_snn_tpu.core import build_lr_schedule

        m = _ref()
        s = build_lr_schedule(
            "warmcos", LR, IPE, EPOCHS, warmup_epochs=2, warmup_lr_start=1e-6
        )
        _sweep(
            s,
            lambda i: m.warm_cos_lr(LR, IPE * EPOCHS, IPE * 2, 1e-6, i),
        )

    def test_yoloxwarmcos(self):
        from eas_snn_tpu.core import build_lr_schedule

        m = _ref()
        s = build_lr_schedule(
            "yoloxwarmcos", LR, IPE, EPOCHS, warmup_epochs=3,
            warmup_lr_start=0, no_aug_epochs=4, min_lr_ratio=0.05,
        )
        _sweep(
            s,
            lambda i: m.yolox_warm_cos_lr(
                LR, 0.05, IPE * EPOCHS, IPE * 3, 0, IPE * 4, i
            ),
        )

    def test_yoloxsemiwarmcos(self):
        from eas_snn_tpu.core import build_lr_schedule

        m = _ref()
        semi_epoch, ipe_semi = 10, 25
        s = build_lr_schedule(
            "yoloxsemiwarmcos", LR, IPE, EPOCHS, warmup_epochs=2,
            warmup_lr_start=0, no_aug_epochs=3, min_lr_ratio=0.2,
            semi_epoch=semi_epoch, iters_per_epoch_semi=ipe_semi,
        )
        normal_iters = IPE * semi_epoch
        semi_iters = ipe_semi * (EPOCHS - semi_epoch - 3)
        _sweep(
            s,
            lambda i: m.yolox_semi_warm_cos_lr(
                LR, 0.2, 0, IPE * EPOCHS, normal_iters, IPE * 3, IPE * 2,
                semi_iters, IPE, ipe_semi, i,
            ),
            n=normal_iters + semi_iters + 50,
        )

    def test_multistep(self):
        from eas_snn_tpu.core import build_lr_schedule

        m = _ref()
        milestones_ep = (8, 16, 22)
        s = build_lr_schedule(
            "multistep", LR, IPE, EPOCHS, milestones=milestones_ep, gamma=0.1
        )
        ms_iters = [
            int(IPE * EPOCHS * e / EPOCHS) for e in milestones_ep
        ]
        _sweep(s, lambda i: m.multistep_lr(LR, ms_iters, 0.1, i))
