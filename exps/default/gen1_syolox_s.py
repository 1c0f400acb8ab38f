"""Gen1 SYOLOX-S: spiking arsnn sampler + spiking backbone, analog FPN/head.

Mirrors the reference README's published Gen1 command
(reference readme.md:124-128: batch 64, 30 epochs, lr/img 1.5625e-5,
embedding arsnn depth 2 ksize 5, thresh 1, readout sum, write_zero, atan).
"""
from eas_snn_tpu.exp import EventExp


class Exp(EventExp):
    def __init__(self):
        super().__init__()
        self.exp_name = "gen1_syolox_s"
        self.depth = 0.33
        self.width = 0.50
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
