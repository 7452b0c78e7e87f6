from downgan_tpu.config.config import (  # noqa: F401
    Config,
    HyperParams,
    RegionBox,
    REGIONS,
    NON_STANDARD_ATTRIBUTES,
    COVARIATE_NAMES_ORDERED,
    FINE_NAMES_ORDERED,
)
