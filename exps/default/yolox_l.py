"""YOLOX-L RGB-COCO preset (reference: exps/default/yolox_l.py)."""
from eas_snn_tpu.exp.yolox_base import Exp as BaseRGBExp


class Exp(BaseRGBExp):
    def __init__(self):
        super().__init__()
        self.depth = 1.00
        self.width = 1.00
        self.exp_name = "yolox_l"
