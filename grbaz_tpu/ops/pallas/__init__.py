"""Pallas TPU kernels for the hot ops.

XLA's fusion covers most of the kernel library; these hand-written
kernels cover the cases where it doesn't — ops whose natural XLA
formulation materializes large intermediates in HBM:

* :func:`~grbaz_tpu.ops.pallas.fir_kernel.fir_decimate_frame_pallas` —
  tiled decimating FIR (the WBFM channelizer hot path).

Each kernel is semantically identical to its XLA counterpart (parity
tests run both in the Pallas interpreter on CPU); blocks select the
Pallas path via a constructor flag.
"""

from grbaz_tpu.ops.pallas.fir_kernel import fir_decimate_frame_pallas

__all__ = ["fir_decimate_frame_pallas"]
