"""Gen1 SYOLOX-M: the flagship/headline config bench.py measures.

Same recipe as gen1_syolox_s (reference readme.md:124-146 published Gen1
command: arsnn sampler depth 2 ksize 5, spiking backbone, analog FPN/head,
Tl=1 Tm=4 Ts=T=3, write_zero, atan) at M scale (depth 0.67, width 0.75 —
reference exps/default/e_yolox_m.py). ``tpu_deploy()`` on this exp is
exactly the deployment config whose numbers BENCHMARKS.md reports.
"""
from eas_snn_tpu.exp import EventExp


class Exp(EventExp):
    def __init__(self):
        super().__init__()
        self.exp_name = "gen1_syolox_m"
        self.depth = 0.67
        self.width = 0.75
        self.num_classes = 2
        self.data_name = "gen1"
        self.input_size = (256, 320)
        self.test_size = (256, 320)
        self.use_spike = "True"
        self.embedding = "arsnn"
        self.embedding_depth = 2
        self.embedding_ksize = 5
        self.readout = "sum"
        self.write_zero = True
        self.thresh = 1
        self.reset = None  # soft reset
        self.spike_fn = "atan"
        self.Tl = 1
        self.Tm = 4
        self.Ts = 3
        self.T = 3
        self.window = -200  # ms
        self.max_epoch = 30
        self.scheduler = "fixed"
        self.basic_lr_per_img = 1.5625e-5
        self.eval_interval = 5
        # bf16 conv compute: 2.7x device speedup, convergence verified on chip
        self.compute_dtype = "bfloat16"
