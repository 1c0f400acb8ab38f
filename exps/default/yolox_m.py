"""YOLOX-M RGB-COCO preset (reference: exps/default/yolox_m.py)."""
from eas_snn_tpu.exp.yolox_base import Exp as BaseRGBExp


class Exp(BaseRGBExp):
    def __init__(self):
        super().__init__()
        self.depth = 0.67
        self.width = 0.75
        self.exp_name = "yolox_m"
