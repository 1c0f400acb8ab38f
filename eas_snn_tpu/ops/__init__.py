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
