"""YOLOX-S RGB-COCO preset (reference: exps/default/yolox_s.py)."""
from eas_snn_tpu.exp.yolox_base import Exp as BaseRGBExp


class Exp(BaseRGBExp):
    def __init__(self):
        super().__init__()
        self.depth = 0.33
        self.width = 0.50
        self.exp_name = "yolox_s"
