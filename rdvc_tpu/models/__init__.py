from rdvc_tpu.models.layers import (  # noqa: F401
    ConvNormAct,
    ConvTransposeNormAct,
    ResidualBlock,
    get_activation,
)
from rdvc_tpu.models.transforms import AnalysisTransform, SynthesisTransform  # noqa: F401
from rdvc_tpu.models.mcn import MotionCompensationNetwork  # noqa: F401
from rdvc_tpu.models.codec import VideoCodec  # noqa: F401
