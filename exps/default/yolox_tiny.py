"""YOLOX-Tiny RGB-COCO preset (reference: exps/default/yolox_tiny.py)."""
from eas_snn_tpu.exp.yolox_base import Exp as BaseRGBExp


class Exp(BaseRGBExp):
    def __init__(self):
        super().__init__()
        self.depth = 0.33
        self.width = 0.375
        self.input_size = (416, 416)
        self.test_size = (416, 416)
        self.mosaic_scale = (0.5, 1.5)
        self.mixup_prob = 0.0  # reference: enable_mixup = False
        self.exp_name = "yolox_tiny"
