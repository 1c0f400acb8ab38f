"""N-Caltech101 SYOLOX-M (reference readme.md:147-153: batch 32, 60 epochs,
Tm=4 T=3, window 0, alpha 1.5)."""
from eas_snn_tpu.exp import EventExp


class Exp(EventExp):
    def __init__(self):
        super().__init__()
        self.exp_name = "ncaltech_syolox_m"
        self.depth = 0.67
        self.width = 0.75
        self.num_classes = 100
        self.data_name = "n-caltech"
        self.input_size = (640, 640)
        self.test_size = (640, 640)
        self.use_spike = "True"
        self.embedding = "arsnn"
        self.embedding_depth = 2
        self.embedding_ksize = 5
        self.readout = "sum"
        self.write_zero = True
        self.thresh = 1
        self.reset = None
        self.spike_fn = "atan"
        self.alpha = 1.5
        self.window = 0
        self.Tl = 1
        self.Tm = 4
        self.Ts = 3
        self.T = 3
        self.max_epoch = 60
        self.scheduler = "fixed"
        self.basic_lr_per_img = 1e-3 / 64.0
        self.eval_interval = 10
        self.compute_dtype = "bfloat16"
