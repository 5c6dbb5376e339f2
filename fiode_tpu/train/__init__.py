from .data import Dataset, augment_batch, load_dataset
from .lyapunov import get_lya_candidate, lyapunov_loss
from .samplers import SAMPLERS, composite_sample
from .schedulers import (
    CompositeSamplerScheduler,
    ConstantScheduler,
    LinearScheduler,
    SwitchScheduler,
)
from .trainer import LyapunovTrainer, TrainConfig
