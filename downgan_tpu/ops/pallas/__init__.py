"""Pallas TPU kernels for the hot ops.

The generator trunk (16 RRDB x 3 dense blocks x 5 convs at 16x16 spatial,
cout=16) is the framework's hottest op and is HBM-round-trip bound under
XLA (PERF.md): every one of the 240 convs reads/writes ~7 MB of HBM while
all trunk weights (5.6 MB) and activations (<6 MB) together fit in VMEM.
These kernels keep the whole dense-block computation VMEM-resident.
"""
from downgan_tpu.ops.pallas.drb import drb_forward, drb_forward_reference, pack_drb_weights

__all__ = ["drb_forward", "drb_forward_reference", "pack_drb_weights"]
