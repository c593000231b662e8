from rdvc_tpu.models.raft.raft import RAFT, RaftRunner  # noqa: F401
from rdvc_tpu.models.raft.corr import build_corr_pyramid, corr_lookup  # noqa: F401
