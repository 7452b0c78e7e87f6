from downgan_tpu.models.generator import Generator, DenseResidualBlock, RRDB  # noqa: F401
from downgan_tpu.models.critic import Critic  # noqa: F401
