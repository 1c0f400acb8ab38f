"""Cross-cutting utilities (reference: yolox/utils/* — SURVEY.md §2.10)."""

from .logger import get_logger, setup_logger
from .metric import AverageMeter, MeterBuffer, hbm_usage_gb
from .model_info import count_params, get_model_info
from .model_surgery import freeze_labels, fuse_conv_bn
from .visualize import event_frame_to_image, vis_detections

__all__ = [
    "setup_logger", "get_logger",
    "AverageMeter", "MeterBuffer", "hbm_usage_gb",
    "count_params", "get_model_info",
    "fuse_conv_bn", "freeze_labels",
    "event_frame_to_image", "vis_detections",
]
