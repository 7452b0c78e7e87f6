"""Subprocess worker for the preemption test: force CPU (the axon TPU
plugin would otherwise grab the chip), then run the real CLI."""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

from downgan_tpu.cli.__main__ import cli  # noqa: E402

cli(args=sys.argv[1:], standalone_mode=True)
