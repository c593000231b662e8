from rdvc_tpu.parallel.mesh import (  # noqa: F401
    make_data_mesh,
    shard_batch,
    replicate,
)
