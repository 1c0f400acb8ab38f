from .surrogate import (
    rectangle,
    atan_spike,
    sigmoid_spike,
    tanh_spike,
    asgl_spike,
    get_spike_fn,
)
from .lif import lif_step, lif_scan, plif_step, plif_scan, PLIF_W_INIT
from .arsnn import arsnn_scan, gated_lif_update
from .arsnn_pallas import arsnn_scan_fused
from .boxes import (
    cxcywh2xyxy,
    xyxy2cxcywh,
    pairwise_iou,
    iou_loss,
    nms_numpy,
    postprocess_numpy,
)
