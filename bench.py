"""Headline benchmark: WGAN-GP training throughput (patches/sec/chip).

Entry-point shim: the harness lives in ``downgan_tpu/bench.py`` (module
docstring there documents the methodology and every BENCH_* env knob) so
the `downgan tune` CLI can sweep candidate production points through the
same code. Prints ONE JSON line.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from downgan_tpu.bench import main  # noqa: E402

if __name__ == "__main__":
    main()
