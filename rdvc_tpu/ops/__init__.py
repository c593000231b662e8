from rdvc_tpu.ops.warp import bilinear_warp  # noqa: F401
from rdvc_tpu.ops.resize import resize_bilinear, resize_flow  # noqa: F401
from rdvc_tpu.ops.metrics import psnr, ssim, ms_ssim  # noqa: F401
