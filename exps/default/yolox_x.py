"""YOLOX-X RGB-COCO preset (reference: exps/default/yolox_x.py)."""
from eas_snn_tpu.exp.yolox_base import Exp as BaseRGBExp


class Exp(BaseRGBExp):
    def __init__(self):
        super().__init__()
        self.depth = 1.33
        self.width = 1.25
        self.exp_name = "yolox_x"
