"""The central event-detection experiment config.

Field-for-field counterpart of the reference's ``EventExp``
(reference: yolox/exp/event_yolox_base.py:18-142): every model/SNN/data/
training/test knob lives here, overridable from the CLI via ``merge``.
Factories build the Flax model, datasets/loaders, optax optimizer with the
reference's group policy, LR schedule, and evaluators.
"""

from __future__ import annotations

import os
from typing import Any, Optional

from .base_exp import BaseExp

# reference use_spike strings -> internal mode names
_USE_SPIKE_MAP = {
    False: "none",
    "False": "none",
    True: "backbone",
    "True": "backbone",
    "full_spike": "full",
    "full_spike_v2": "full_v2",
    # internal names accepted directly
    "none": "none",
    "backbone": "backbone",
    "full": "full",
    "full_v2": "full_v2",
}


class EventExp(BaseExp):
    def __init__(self):
        super().__init__()
        # ---------------- model config (reference :22-35) ----------------
        self.num_classes = 100
        self.depth = 1.00
        self.width = 1.00
        self.act = "silu"
        self.use_spike = "False"
        self.eval_proph = False
        self.alpha = 2.0
        self.in_dim = 2
        self.aggregation = "micro_sum"
        # ---------------- SNN config (reference :36-59) ------------------
        self.emb_lr = -1.0
        self.embedding = "count"
        self.embedding_depth = 1
        self.spike_attach = False
        self.write_zero = False
        self.abs = False
        self.split = False
        self.embedding_ksize = 7
        self.norm = None
        self.window = -200  # ms
        self.Tl = 1
        self.Tm = 4
        self.Ts = 1
        self.T = 4
        self.reset = 0
        self.thresh = 1
        self.readout = "sum"
        self.decay = 0.5
        self.speed_aug = False
        self.spike_fn = "rect"
        # ASGL ('patan') knobs: EfficientNoisySpikeII mixing prob (the
        # reference pins p=0 at the registry, event_yolox_base.py:148; the
        # class default is 0.5) and the learnable InvArcTanh temperature's
        # granularity: 'layer' | 'channel' | 'neuron'
        # (reference activation.py:73-83, 181-205)
        self.asgl_p = 0.0
        self.alpha_granularity = "layer"
        # conv/BN compute dtype: 'float32' | 'bfloat16' (MXU fast path)
        self.compute_dtype = "float32"
        # 'never'|'auto'|'always': fused Pallas ARSNN eval kernel
        self.use_pallas = "never"
        # 'never'|'auto': space-to-depth packed ARSNN scan (ops/pack.py).
        # At blk=4 (the module default) this is the measured deployment
        # winner on v5e at flagship geometry: sampler 9.1 ms vs 15.6
        # unpacked (BENCHMARKS.md "conv-bound, not barrier-bound").
        self.packed_embedding = "never"
        # None (f32) | 'bfloat16': ARSNN scan state dtype. bf16 halves the
        # bandwidth-bound sampler's carry traffic (22.9 -> 18.1 ms at
        # B=128); protocol-fair vs the reference's --fp16 eval, which runs
        # the WHOLE model incl. recurrent state in fp16
        # (reference tools/eval_event.py:66, event_evaluator.py:141-144).
        self.embedding_state_dtype = None
        # rematerialize backbone activations in backward (memory saver)
        self.remat = False
        self.data_name = "n-caltech"
        # ---------------- dataloader config (reference :61-79) -----------
        self.data_num_workers = 4
        # 'thread' | 'process' (forked workers + shared-memory frame ring;
        # wins on multi-core hosts, auto-falls back to thread on 1-core)
        self.data_worker_mode = "process"
        self.measure = "count"
        self.input_size = (640, 640)
        # every N train iters pick a random size from
        # input_size +/- 32*multiscale_range (0 disables; reference
        # random_resize: exp/event_yolox_base.py:333-351 resizes every 10)
        self.multiscale_interval = 0
        self.multiscale_range = 5
        self.data_dir = None
        self.flip_prob = 0.5
        self.max_labels = 50
        # ship raw padded event arrays and bin on device (one fused XLA
        # scatter) instead of dense frame stacks from workers
        self.device_binning = False
        self.max_events_per_slice = 131072
        # ---------------- training config (reference :101-133) -----------
        self.warmup_epochs = 0
        self.max_epoch = 300
        self.warmup_lr = 0
        self.min_lr_ratio = 0.05
        self.basic_lr_per_img = 1e-3 / 64.0
        self.scheduler = "yoloxwarmcos"
        self.no_aug_epochs = 0
        self.ema = True
        self.optimizer = "ADAM"
        self.weight_decay = 0
        self.momentum = 0.9
        self.print_interval = 10
        self.eval_interval = 10
        self.save_history_ckpt = False
        self.exp_name = type(self).__module__.split(".")[-1]
        self.seed = None
        self.output_dir = "./outputs"
        # ---------------- testing config (reference :135-142) ------------
        self.test_size = (640, 640)
        self.test_conf = 0.01
        self.nmsthre = 0.65

    # ------------------------------------------------------------------
    def tpu_deploy(self):
        """Engage the measured TPU deployment config (BENCHMARKS.md
        flagship table): bf16 conv/BN compute, bf16 ARSNN scan state, and
        4x4 space-to-depth packed sampler convs. int8 spike storage and
        the per-geometry conv+BN+PLIF fusion policy are already the eval
        defaults. This is the single config bench.py benchmarks and the
        eval CLI's ``--fp16`` flag enables — the TPU counterpart of the
        reference's half-precision eval (reference tools/eval_event.py:66
        ``--fp16`` -> ``model.half()``, event_evaluator.py:141-144)."""
        self.compute_dtype = "bfloat16"
        self.embedding_state_dtype = "bfloat16"
        self.packed_embedding = "auto"
        return self

    @property
    def use_spike_mode(self) -> str:
        return _USE_SPIKE_MAP[self.use_spike]

    def get_model(self):
        """Build the Flax model (reference get_model :161-218; variant
        dispatch :197-214 folded into EASYOLOX.use_spike)."""
        from ..models import EASYOLOX

        return EASYOLOX(
            num_classes=self.num_classes,
            depth=self.depth,
            width=self.width,
            act=self.act,
            use_spike=self.use_spike_mode,
            T=self.T,
            spike_fn=self.spike_fn,
            alpha=self.alpha,
            asgl_p=self.asgl_p,
            alpha_granularity=self.alpha_granularity,
            norm=self.norm,
            embedding=self.embedding,
            embedding_ksize=self.embedding_ksize,
            embedding_depth=self.embedding_depth,
            Ts=self.Ts,
            readout=self.readout,
            spike_attach=self.spike_attach,
            write_zero=self.write_zero,
            use_abs=self.abs,
            split=self.split,
            thresh=float(self.thresh),
            vreset=None if self.reset is None else float(self.reset),
            decay=self.decay,
            compute_dtype=self.compute_dtype,
            remat=self.remat,
            use_pallas=self.use_pallas,
            packed_embedding=self.packed_embedding,
            embedding_state_dtype=self.embedding_state_dtype,
        )

    def get_slice_args(self) -> dict:
        """(reference get_slice_args :433-443)"""
        return dict(
            aggregation=self.aggregation,
            overlap=0,
            num_slice=self.Tl,
            micro_slice=self.Tm,
            measure=self.measure,
            window=(self.window * 1000, 0),
        )

    def get_dataset(self, training: bool = True, map_val: bool = False):
        """Dataset factory by data_name (reference :220-247, :445-482)."""
        from ..data import build_dataset

        return build_dataset(
            self.data_name,
            data_dir=self.data_dir,
            training=training,
            map_val=map_val,
            input_size=self.input_size if training else self.test_size,
            max_labels=self.max_labels,
            flip_prob=self.flip_prob if training else 0.0,
            raw_events=self.device_binning and training,
            max_events_per_slice=self.max_events_per_slice,
            **self.get_slice_args(),
        )

    def get_data_loader(
        self, batch_size: int, training: bool = True, map_val: bool = False,
        seed: int = 0,
    ):
        from ..data import EventDataLoader

        import jax

        dataset = self.get_dataset(training=training, map_val=map_val)
        return EventDataLoader(
            dataset,
            batch_size=batch_size,
            shuffle=training,
            infinite=training,
            num_workers=self.data_num_workers,
            seed=self.seed or seed,
            rank=jax.process_index(),
            world_size=jax.process_count(),
            worker_mode=self.data_worker_mode if training else "thread",
        )

    def get_lr_schedule(self, batch_size: int, iters_per_epoch: int):
        from ..core import build_lr_schedule

        lr = self.basic_lr_per_img * batch_size
        return build_lr_schedule(
            self.scheduler,
            lr,
            iters_per_epoch,
            self.max_epoch,
            warmup_epochs=self.warmup_epochs,
            warmup_lr_start=self.warmup_lr,
            no_aug_epochs=self.no_aug_epochs,
            min_lr_ratio=self.min_lr_ratio,
            milestones=tuple(getattr(self, "milestones", ()) or ()),
            gamma=getattr(self, "gamma", 0.1),
            semi_epoch=getattr(self, "semi_epoch", 0),
            iters_per_epoch_semi=getattr(self, "iters_per_epoch_semi", None),
        )

    def get_optimizer(self, params, batch_size: int, iters_per_epoch: int = 1000):
        from ..core import build_optimizer

        lr = self.basic_lr_per_img * batch_size
        return build_optimizer(
            params,
            self.get_lr_schedule(batch_size, iters_per_epoch),
            optimizer=self.optimizer,
            weight_decay=self.weight_decay,
            momentum=self.momentum,
            emb_lr=self.emb_lr,
            base_lr=lr,
        )

    def get_evaluator(self, batch_size: int, testdev: bool = False):
        """COCO-protocol by default; Prophesee protocol when eval_proph and
        a gen* dataset (reference :509-545)."""
        from ..evaluators import EventEvaluator, PSEEEvaluator

        loader = self.get_data_loader(batch_size, training=False, map_val=True)
        if "gen" in self.data_name and self.eval_proph:
            return PSEEEvaluator(
                dataloader=loader,
                img_size=self.test_size,
                confthre=0.001,
                nmsthre=self.nmsthre,
                num_classes=self.num_classes,
                camera="gen4" if "gen4" in self.data_name else "gen1",
                # RVT frames are ds2 (rvt_gen4.py:56); protocol thresholds halve
                downsampled_by_2=("rvt" in self.data_name.lower()),
            )
        return EventEvaluator(
            dataloader=loader,
            img_size=self.test_size,
            confthre=self.test_conf,
            nmsthre=self.nmsthre,
            num_classes=self.num_classes,
        )

    def get_trainer(self, args):
        from ..core.trainer import Trainer

        return Trainer(self, args)

    def eval(self, model, variables, evaluator):
        """Run an evaluator over a model+params (reference exp.eval
        :552-554)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        fwd = jax.jit(lambda v, e: model.apply(v, e, train=False))
        return evaluator.evaluate(
            lambda frames: np.asarray(fwd(variables, jnp.asarray(frames)))
        )

    def check_exp_value(self):
        h, w = self.input_size
        assert h % 32 == 0 and w % 32 == 0, "input size must be multiples of 32"
