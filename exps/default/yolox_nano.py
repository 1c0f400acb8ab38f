"""YOLOX-Nano RGB-COCO preset (reference: exps/default/yolox_nano.py).

The nano model's defining difference is depthwise-separable convs
(reference :37 ``depthwise=True``); mixup is disabled and mosaic runs at
half probability with a tighter scale range (reference :19-21).
"""
from eas_snn_tpu.exp.yolox_base import Exp as BaseRGBExp


class Exp(BaseRGBExp):
    def __init__(self):
        super().__init__()
        self.depth = 0.33
        self.width = 0.25
        self.depthwise = True
        self.input_size = (416, 416)
        self.test_size = (416, 416)
        self.mosaic_scale = (0.5, 1.5)
        self.mosaic_prob = 0.5
        self.mixup_prob = 0.0  # reference: enable_mixup = False
        self.exp_name = "yolox_nano"
