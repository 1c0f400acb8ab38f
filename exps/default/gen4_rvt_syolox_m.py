"""1Mpx (RVT-preprocessed) SYOLOX-M over stacked histograms
(reference readme.md 1Mpx rows; data: RVT event_representations_v2)."""
from eas_snn_tpu.exp import EventExp


class Exp(EventExp):
    def __init__(self):
        super().__init__()
        self.exp_name = "gen4_rvt_syolox_m"
        self.depth = 0.67
        self.width = 0.75
        self.num_classes = 3
        self.data_name = "rvt-gen4"
        self.input_size = (384, 640)
        self.test_size = (384, 640)
        self.use_spike = "True"
        self.embedding = "arsnn"
        self.embedding_depth = 2
        self.embedding_ksize = 5
        self.readout = "sum"
        self.write_zero = True
        self.reset = None
        self.spike_fn = "atan"
        self.Tl = 3   # history representations as micro-steps
        self.Tm = 3
        self.Ts = 3
        self.T = 3
        self.max_epoch = 30
        self.scheduler = "fixed"
        self.basic_lr_per_img = 1.5625e-5
        self.eval_interval = 5
        # bf16 conv compute: 2.7x device speedup, convergence verified on chip
        self.compute_dtype = "bfloat16"
