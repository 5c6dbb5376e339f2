from .certify_segway import SegwayCertifyResult, certify_segway
from .controllers import (
    ConstantController,
    LinearController,
    NNController,
    lqr_gain,
)
from .lyapunov_ctrl import LyaQuadratic, SegwaySingleBarrierModel
from .systems import Segway
from .train_segway import SegwayTrainConfig, train_segway
