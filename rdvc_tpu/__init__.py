"""rdvc_tpu — TPU-native learned video compression framework.

A brand-new JAX/XLA/Pallas implementation of the RDVC P-frame codec
(reference: anis-hd/PFE-RAFT-and-hyperprior-based-learned-video-compression):
RAFT-style optical flow, motion/residual convolutional autoencoders with
learned factorized entropy bottlenecks, a host-side C++ rANS range coder,
the `.rdvc` container, decoder post-processing, and a 3-phase training
curriculum — all designed TPU-first (NHWC, bf16 matmuls, lax.scan frame
recurrence, jax.sharding data/GOP parallelism).
"""

__version__ = "0.1.0"

from rdvc_tpu.config import CodecConfig, ModelConfig, TrainConfig  # noqa: F401
