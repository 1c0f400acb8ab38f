"""SYOLOX-S event-detection preset (reference: exps/default/e_yolox_s.py)."""
from eas_snn_tpu.exp import EventExp


class Exp(EventExp):
    def __init__(self):
        super().__init__()
        self.depth = 0.33
        self.width = 0.50
        self.exp_name = "e_yolox_s"
