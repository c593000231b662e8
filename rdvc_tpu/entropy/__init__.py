from rdvc_tpu.entropy.factorized import (  # noqa: F401
    FactorizedEntropyBottleneck,
    build_cdf_tables,
    CdfTables,
)
