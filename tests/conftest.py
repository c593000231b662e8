import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Force CPU with 8 virtual devices for multi-chip sharding tests. The axon
# TPU plugin ignores the JAX_PLATFORMS env var in this image, so the config
# API must be used (before any jax computation).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
