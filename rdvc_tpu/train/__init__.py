from rdvc_tpu.train.data import (  # noqa: F401
    read_flo,
    write_flo,
    VimeoFlowPairDataset,
    SyntheticFlowPairDataset,
)
from rdvc_tpu.train.phases import phase_for_epoch, phase_trainable_mask  # noqa: F401
from rdvc_tpu.train.loop import Trainer, TrainState  # noqa: F401
