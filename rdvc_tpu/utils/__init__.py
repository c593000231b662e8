from rdvc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
from rdvc_tpu.utils.timers import StageTimer  # noqa: F401
