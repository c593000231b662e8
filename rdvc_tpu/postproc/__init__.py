from rdvc_tpu.postproc.histmatch import histogram_match_ycrcb  # noqa: F401
from rdvc_tpu.postproc.lmr import low_motion_replacement  # noqa: F401
from rdvc_tpu.postproc.temporal import temporal_iir_filter  # noqa: F401
