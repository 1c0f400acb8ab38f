"""Legacy YOLOv3 (Darknet-53 + YOLOFPN) preset
(reference: exps/default/yolov3.py)."""
from eas_snn_tpu.exp.yolox_base import Exp as BaseRGBExp


class Exp(BaseRGBExp):
    def __init__(self):
        super().__init__()
        self.depth = 1.0
        self.width = 1.0
        self.exp_name = "yolov3"
        # YOLOFPN emits (128, 256, 512)-channel features at width 1.0
        self.head_in_channels = (128, 256, 512)

    def get_model(self):
        import jax.numpy as jnp
        from flax import linen as nn

        from eas_snn_tpu.models import YOLOXHead
        from eas_snn_tpu.models.yolo_fpn import YOLOFPN

        num_classes = self.num_classes
        in_ch = self.head_in_channels

        class YOLOv3(nn.Module):
            @nn.compact
            def __call__(self, events, targets=None, train=False, use_l1=False):
                # accept the event-pipeline (B, 1, 1, H, W, 3) contract
                x = events
                if x.ndim == 6:
                    x = x[:, 0, 0]
                feats = YOLOFPN(name="backbone")(x, train)
                from eas_snn_tpu.models.head import HeadOutput

                head_out = YOLOXHead(
                    num_classes=num_classes, width=1.0,
                    in_channels=in_ch, act="lrelu", name="head",
                )(feats, train)
                if targets is not None and train:
                    from eas_snn_tpu.models.simota import yolox_losses

                    losses = yolox_losses(
                        head_out.outputs, head_out.origin_preds, targets,
                        head_out.grid_x, head_out.grid_y, head_out.strides,
                        num_classes, use_l1=use_l1,
                    )
                    return {
                        "total_loss": losses.total_loss,
                        "iou_loss": losses.iou_loss,
                        "conf_loss": losses.conf_loss,
                        "cls_loss": losses.cls_loss,
                        "l1_loss": losses.l1_loss,
                        "num_fg": losses.num_fg,
                    }
                return head_out.outputs

        return YOLOv3()
