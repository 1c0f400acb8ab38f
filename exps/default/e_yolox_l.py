"""SYOLOX-L event-detection preset (reference: exps/default/e_yolox_l.py)."""
from eas_snn_tpu.exp import EventExp


class Exp(EventExp):
    def __init__(self):
        super().__init__()
        self.depth = 1.0
        self.width = 1.0
        self.exp_name = "e_yolox_l"
