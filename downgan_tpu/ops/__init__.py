from downgan_tpu.ops.losses import (  # noqa: F401
    wass_loss,
    content_loss,
    content_mse_loss,
    divergence_loss,
    vorticity_loss,
    eof_loss,
    low_pass,
    high_pass,
)
from downgan_tpu.ops.msssim import ms_ssim, ssim, msssim_metric  # noqa: F401
from downgan_tpu.ops.spectral import radial_spectrum, ralsd  # noqa: F401
from downgan_tpu.ops.metrics import METRIC_REGISTRY, resolve_metrics  # noqa: F401
