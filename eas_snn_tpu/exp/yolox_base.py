"""Legacy RGB-COCO YOLOX experiment (the reference keeps its original YOLOX
pipeline alongside the event path; reference: yolox/exp/yolox_base.py:16-359
— mosaic/mixup augmentation knobs, SGD with quadratic warmup, multiscale
test sizes)."""

from __future__ import annotations

from .base_exp import BaseExp


class Exp(BaseExp):
    def __init__(self):
        super().__init__()
        # model
        self.num_classes = 80
        self.depth = 1.00
        self.width = 1.00
        self.act = "silu"
        # depthwise-separable convs (YOLOX-Nano; reference
        # exps/default/yolox_nano.py:37 `depthwise=True`)
        self.depthwise = False
        self.compute_dtype = "float32"
        # data
        self.data_dir = None
        self.train_ann = "instances_train2017.json"
        self.val_ann = "instances_val2017.json"
        self.train_name = "train2017"
        self.val_name = "val2017"
        self.input_size = (640, 640)
        self.data_num_workers = 4
        self.max_labels = 120
        # mosaic/mixup (reference :43-58)
        self.mosaic_prob = 1.0
        self.mixup_prob = 1.0
        self.degrees = 10.0
        self.translate = 0.1
        self.mosaic_scale = (0.1, 2.0)
        self.mixup_scale = (0.5, 1.5)
        self.shear = 2.0
        self.flip_prob = 0.5
        # training (reference :60-95)
        self.warmup_epochs = 5
        self.max_epoch = 300
        self.warmup_lr = 0
        self.min_lr_ratio = 0.05
        self.basic_lr_per_img = 0.01 / 64.0
        self.scheduler = "yoloxwarmcos"
        self.no_aug_epochs = 15
        self.ema = True
        self.optimizer = "SGD"
        self.weight_decay = 5e-4
        self.momentum = 0.9
        self.print_interval = 10
        self.eval_interval = 10
        self.exp_name = type(self).__module__.split(".")[-1]
        self.seed = None
        self.output_dir = "./outputs"
        # test
        self.test_size = (640, 640)
        self.test_conf = 0.01
        self.nmsthre = 0.65

    def get_model(self):
        from ..models import EASYOLOX

        return EASYOLOX(
            num_classes=self.num_classes,
            depth=self.depth,
            width=self.width,
            act=self.act,
            use_spike="none",
            T=1,
            embedding="count",
            Ts=1,
            depthwise=self.depthwise,
            compute_dtype=self.compute_dtype,
        )

    def get_dataset(self, training: bool = True, map_val: bool = False):
        from ..data.coco import COCODataset
        from ..data.mosaic import MosaicDataset

        base = COCODataset(
            self.data_dir,
            json_file=self.train_ann if training else self.val_ann,
            name=self.train_name if training else self.val_name,
            input_size=self.input_size if training else self.test_size,
            training=training,
            map_val=map_val,
            max_labels=self.max_labels,
            flip_prob=self.flip_prob,
        )
        if training:
            return MosaicDataset(
                base,
                input_size=self.input_size,
                mosaic_prob=self.mosaic_prob,
                mixup_prob=self.mixup_prob,
                degrees=self.degrees,
                translate=self.translate,
                mosaic_scale=self.mosaic_scale,
                mixup_scale=self.mixup_scale,
                shear=self.shear,
                max_labels=self.max_labels,
            )
        return base

    def get_data_loader(
        self, batch_size: int, training: bool = True, map_val: bool = False,
        seed: int = 0,
    ):
        import jax

        from ..data import EventDataLoader

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
        )

    def get_lr_schedule(self, batch_size: int, iters_per_epoch: int):
        from ..core import build_lr_schedule

        return build_lr_schedule(
            self.scheduler,
            self.basic_lr_per_img * batch_size,
            iters_per_epoch,
            self.max_epoch,
            warmup_epochs=self.warmup_epochs,
            warmup_lr_start=self.warmup_lr,
            no_aug_epochs=self.no_aug_epochs,
            min_lr_ratio=self.min_lr_ratio,
        )

    def get_optimizer(self, params, batch_size: int, iters_per_epoch: int = 1000):
        from ..core import build_optimizer

        return build_optimizer(
            params,
            self.get_lr_schedule(batch_size, iters_per_epoch),
            optimizer=self.optimizer,
            weight_decay=self.weight_decay,
            momentum=self.momentum,
        )

    def get_evaluator(self, batch_size: int, testdev: bool = False):
        from ..evaluators import EventEvaluator

        loader = self.get_data_loader(batch_size, training=False, map_val=True)
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

    def check_exp_value(self):
        h, w = self.input_size
        assert h % 32 == 0 and w % 32 == 0, "input size must be multiples of 32"
