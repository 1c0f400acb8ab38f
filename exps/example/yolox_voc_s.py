"""VOC example preset (reference: exps/example/yolox_voc/yolox_voc_s.py)."""
from eas_snn_tpu.exp.yolox_base import Exp as BaseRGBExp


class Exp(BaseRGBExp):
    def __init__(self):
        super().__init__()
        self.depth = 0.33
        self.width = 0.50
        self.num_classes = 20
        self.exp_name = "yolox_voc_s"

    def get_dataset(self, training: bool = True, map_val: bool = False):
        from eas_snn_tpu.data import VOCDataset
        from eas_snn_tpu.data.mosaic import MosaicDataset

        base = VOCDataset(
            self.data_dir,
            image_sets=(("2007", "trainval"), ("2012", "trainval"))
            if training else (("2007", "test"),),
            input_size=self.input_size if training else self.test_size,
            training=training,
            map_val=map_val,
            max_labels=self.max_labels,
        )
        if training:
            return MosaicDataset(
                base, input_size=self.input_size,
                mosaic_prob=self.mosaic_prob, mixup_prob=self.mixup_prob,
                degrees=self.degrees, translate=self.translate,
                mosaic_scale=self.mosaic_scale, mixup_scale=self.mixup_scale,
                shear=self.shear, max_labels=self.max_labels,
            )
        return base
