from .blocks import (
    ANN,
    BaseConv,
    Bottleneck,
    CSPLayer,
    DWConv,
    Focus,
    NeuronCfg,
    PLIF,
    SPPBottleneck,
    upsample2x,
)
from .darknet import CSPDarknet
from .embedding import (
    ARSNNEmbedding,
    LIFEmbedding,
    RSNNEmbedding,
    SpikeCountEmbedding,
    build_embedding,
    logit_decay,
)
from .head import HeadOutput, YOLOXHead
from .pafpn import YOLOPAFPN, rate_decode
from .simota import YoloxLossOutput, simota_assign, yolox_losses
from .yolox import EASYOLOX, USE_SPIKE_MODES
from .build import MODEL_SPECS, create_model, load_weights
